from .mesh import (DATA_AXIS, PARETO_AXIS, batch_sharding, make_mesh,
                   num_data_shards, replicated)
from .train_dp import (EvalTrainState, cosine_lr_with_warmup,
                       init_eval_train_state, make_eval_steps)

__all__ = [
    "DATA_AXIS", "PARETO_AXIS", "batch_sharding", "make_mesh",
    "num_data_shards", "replicated", "EvalTrainState",
    "cosine_lr_with_warmup", "init_eval_train_state", "make_eval_steps",
]
