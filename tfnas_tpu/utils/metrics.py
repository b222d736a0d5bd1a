"""Loss / accuracy metrics, jit-friendly.

- `accuracy`: top-k precision (tools/utils.py:61-74)
- `cross_entropy`: mean CE over the batch (nn.CrossEntropyLoss)
- `cross_entropy_label_smooth`: label-smoothed CE
  (train_eval.py:72-84 CrossEntropyLabelSmooth)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def accuracy(logits, targets, topk=(1,), weights=None):
    """Top-k accuracy in percent. Returns a list of scalars.

    weights: optional [N] 0/1 validity mask for padded batches — metrics
    average over sum(weights) samples only."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)                      # [N, maxk]
    correct = (pred == targets[:, None]).astype(jnp.float32)   # [N, maxk]
    if weights is not None:
        w = weights.astype(jnp.float32)
        correct = correct * w[:, None]
        n = jnp.maximum(jnp.sum(w), 1.0)
    else:
        n = targets.shape[0]
    return [jnp.sum(correct[:, :k]) * (100.0 / n) for k in topk]


def masked_mean(values, weights):
    """Mean of per-sample values over a 0/1 validity mask."""
    w = weights.astype(jnp.float32)
    return jnp.sum(values * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy(logits, targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def cross_entropy_label_smooth(logits, targets, num_classes, epsilon=0.1):
    """Matches CrossEntropyLabelSmooth (train_eval.py:72-84):
    loss = (-targets_smooth * log_probs).mean(0).sum()"""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
    smooth = (1.0 - epsilon) * onehot + epsilon / num_classes
    return jnp.sum(jnp.mean(-smooth * logp, axis=0))
