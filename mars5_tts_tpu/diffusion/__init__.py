from .engine import perform_simple_inference
from .multinomial import MultinomialDiffusion, index_to_log_onehot
from .schedule import build_step_plan, get_schedule

__all__ = [
    "MultinomialDiffusion",
    "build_step_plan",
    "get_schedule",
    "index_to_log_onehot",
    "perform_simple_inference",
]
