"""Batch normalization for NHWC tensors, TPU-native.

Reference parity (models/layers.py:101-103,468-469,497-498,532-533): the
reference ties `affine` and `track_running_stats` — search-time BN
(`affine=False`) keeps NO running statistics and normalizes with batch
moments even at validation (train_search.py:440-442 validates in .train()),
while eval-time BN (`affine=True`) has scale/bias and running stats.
We reproduce exactly that tying.

Cross-replica ("sync") BN — the apex sync-BN equivalent
(train_eval_amp.py:155-157) — is a `lax.pmean` of the batch moments over the
data-parallel mesh axis, which XLA lowers to an ICI all-reduce.

PyTorch semantics replicated: eps=1e-5, momentum=0.1
(new = (1-m)*old + m*batch), biased variance for normalization, unbiased
variance for the running update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def stat_dtype(dtype):
    """fp32 statistics for low-precision activations; preserve float64."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def init_bn(num_features, affine, dtype=jnp.float32):
    """Returns (params, state) pytrees for one BN over `num_features` channels.

    affine=False => both are empty dicts (no learnable scale/bias, no running
    stats), matching nn.BatchNorm2d(affine=False, track_running_stats=False).
    """
    if not affine:
        return {}, {}
    params = {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }
    return params, state


def batch_norm(x, params, state, *, affine, training, axis_name=None,
               momentum=BN_MOMENTUM, eps=BN_EPS):
    """Apply BN over the channel (last) axis of an NHWC (or NC) tensor.

    Returns (y, new_state). `state` is passed through unchanged when
    affine=False or when not training.

    axis_name: optional mesh axis to pmean the batch moments over
    (cross-replica BN). Only used when batch statistics are computed.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    track = affine  # tied, as in the reference

    if track and not training:
        mean, var = state["mean"], state["var"]
        new_state = state
    else:
        # Compute in fp32 (or f64 for f64 activations) for stability.
        xf = x.astype(stat_dtype(x.dtype))
        mean = jnp.mean(xf, axis=reduce_axes)
        mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)  # biased
        if track:
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            if axis_name is not None:
                n = n * jax.lax.psum(jnp.ones((), jnp.float32), axis_name)
            unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
            new_state = {
                "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
                "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
            }
        else:
            new_state = state

    sd = stat_dtype(x.dtype)
    inv = jax.lax.rsqrt(var.astype(sd) + eps)
    scale = inv
    offset = -mean.astype(sd) * inv
    if affine:
        scale = scale * params["scale"].astype(sd)
        offset = offset * params["scale"].astype(sd) + params["bias"].astype(sd)
    y = (x.astype(sd) * scale + offset).astype(x.dtype)
    return y, new_state
