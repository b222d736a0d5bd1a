"""Activation functions of the TF-NAS search space.

Reference parity: Swish / HardSwish modules (models/layers.py:26-47) and the
relu/relu6 selections in BasicLayer (models/layers.py:107-128). On TPU these
are pure VPU elementwise ops that XLA fuses into the surrounding convolutions,
so there is no in-place-variant distinction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def relu(x):
    return jax.nn.relu(x)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def swish(x):
    # x * sigmoid(x) (models/layers.py:35)
    return x * jax.nn.sigmoid(x)


def hard_swish(x):
    # x * relu6(x + 3) / 6 (models/layers.py:47)
    return x * relu6(x + 3.0) * (1.0 / 6.0)


def tanh(x):
    return jnp.tanh(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


# act_func string -> callable; the name strings are part of the model.config
# JSON contract ('relu' / 'relu6' / 'swish' / 'h-swish' / 'tanh' / 'sigmoid',
# models/layers.py:107-128,353-368).
ACT_FNS = {
    "relu": relu,
    "relu6": relu6,
    "swish": swish,
    "h-swish": hard_swish,
    "tanh": tanh,
    "sigmoid": sigmoid,
}


def get_act_fn(act_func):
    """Return the activation callable for an act_func config string.

    `None` (JSON null) means identity, matching the `self.act = None`
    fallthrough in the reference (models/layers.py:127-128).
    """
    if act_func is None:
        return None
    if act_func not in ACT_FNS:
        raise ValueError(f"unsupported act_func: {act_func!r}")
    return ACT_FNS[act_func]


def apply_act(x, act_func):
    fn = get_act_fn(act_func)
    return x if fn is None else fn(x)
