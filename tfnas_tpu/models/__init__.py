from . import search_space
from .eval_net import EvalNetwork

__all__ = ["search_space", "EvalNetwork"]
