"""Functional Gumbel / bi-sampling for the supernet.

Reference: MixedOP.forward sampling modes (model_search.py:49-85) and the
bi-sampling trick (train_search.py:375-379): per weight step, draw one
Gumbel sample per block, then one uniform sample from the REMAINING 7 ops
(the first pick is switched off). The reference tracks this with Python-side
`switches` state; here both draws are pure `jax.random` index math, jittable
and reproducible.

Note argmax(gumbel_softmax(log_softmax(a), T)) == argmax(a + g) is an exact
categorical sample of softmax(a) independent of T, so the hard draws use
`jax.random.categorical` directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _mask_logits(logits, valid):
    """-inf out invalid candidate slots (heterogeneous per-block op counts,
    e.g. the hybrid conv/ViT space where attention is only offered at the
    low-resolution stages). valid: 0/1 float [B, O] or None."""
    if valid is None:
        return logits
    return jnp.where(valid > 0, logits, -jnp.inf)


def sample_gumbel_indices(key, log_alphas, valid=None):
    """One categorical draw per block: mode='gumbel' hard pick
    (model_search.py:61-64). log_alphas: [B, O] -> int32 [B]."""
    return jax.random.categorical(
        key, _mask_logits(log_alphas, valid), axis=-1).astype(jnp.int32)


def sample_random_excluding(key, excluded, num_ops, valid=None):
    """mode='random' draw restricted to the ops not picked by the paired
    gumbel draw (model_search.py:78-81 with switches from :64).

    excluded: int32 [B]. Returns int32 [B] uniform over the valid candidate
    set minus excluded. With valid=None this is a skip-shifted uniform draw
    over {0..num_ops-1}\\{excluded}; with a validity mask it is a Gumbel-max
    draw over uniform logits restricted to valid \\ {excluded}."""
    if valid is None:
        r = jax.random.randint(key, excluded.shape, 0, num_ops - 1)
        return (r + (r >= excluded).astype(r.dtype)).astype(jnp.int32)
    logits = jnp.where(
        jax.nn.one_hot(excluded, valid.shape[-1], dtype=jnp.bool_),
        -jnp.inf, _mask_logits(jnp.zeros_like(valid), valid))
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def gumbel_softmax_weights(key, log_alphas, temperature, valid=None):
    """Soft Gumbel weights for the arch step (model_search.py:87):
    softmax((log_alphas + g) / T), g ~ Gumbel(0,1). [B, O] -> [B, O].
    Invalid slots get exactly zero weight (and thus zero gradient)."""
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, log_alphas.shape, jnp.float32,
                           minval=1e-10, maxval=1.0) + 1e-10))
    return jax.nn.softmax(
        _mask_logits((log_alphas + g) / temperature, valid), axis=-1)


def project_log_softmax(log_alphas, valid=None, sentinel=-30.0):
    """The post-arch-step projection (train_search.py:421-422):
    log_alphas <- log_softmax(log_alphas), restricted to valid slots.
    Invalid slots are pinned to a finite sentinel so optimizer weight decay
    never sees an inf/NaN and their (meaningless) values cannot drift."""
    if valid is None:
        return jax.nn.log_softmax(log_alphas, axis=-1)
    proj = jax.nn.log_softmax(_mask_logits(log_alphas, valid), axis=-1)
    return jnp.where(valid > 0, proj, sentinel)


def sample_gumbel_excluding(key, log_alphas, excluded, temperature=None):
    """mode='gumbel_2' (model_search.py:65-69): a second Gumbel-categorical
    draw restricted to the ops the paired 'gumbel' draw switched off, i.e.
    argmax over log_alphas + g with the excluded index masked out. The
    temperature only rescales the softmax, so the hard pick is again an
    exact T-independent categorical sample over the remaining 7.

    log_alphas: [B, O]; excluded: int32 [B]. Returns int32 [B]."""
    del temperature
    num_ops = log_alphas.shape[-1]
    masked = jnp.where(
        jax.nn.one_hot(excluded, num_ops, dtype=jnp.bool_),
        -jnp.inf, log_alphas)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def sample_min_alphas(log_alphas):
    """mode='min_alphas' (model_search.py:70-73)."""
    return jnp.argmin(log_alphas, axis=-1).astype(jnp.int32)


def sample_max_alphas(log_alphas):
    """mode='max_alphas' (model_search.py:74-77)."""
    return jnp.argmax(log_alphas, axis=-1).astype(jnp.int32)
