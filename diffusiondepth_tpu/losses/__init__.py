from .losses import LossComputer, get_loss, l1_loss, l2_loss, sig_loss

__all__ = ["LossComputer", "get_loss", "l1_loss", "l2_loss", "sig_loss"]
