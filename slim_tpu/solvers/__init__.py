from .cd import estimate_model_cd
from .admm import estimate_model_admm

__all__ = ["estimate_model_cd", "estimate_model_admm"]
