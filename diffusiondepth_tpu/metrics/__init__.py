from .depth_metrics import METRIC_NAMES, evaluate_depth_metrics, get_metric

__all__ = ["METRIC_NAMES", "evaluate_depth_metrics", "get_metric"]
