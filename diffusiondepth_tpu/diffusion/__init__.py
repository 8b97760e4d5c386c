from .ddim import DDIMSchedule, make_betas

__all__ = ["DDIMSchedule", "make_betas"]
