"""Data-parallel eval-network training, bf16, cross-replica BN.

This is the TPU-native replacement for BOTH reference trainers:
- train_eval.py (single-process DataParallel, fp32)
- train_eval_amp.py (apex AMP O1 + NCCL DDP + apex sync-BN)

Design: one jitted `shard_map` step over the mesh 'data' axis. The global
batch enters sharded on its leading dim; parameters/optimizer state are
replicated. Per-shard gradients are `lax.pmean`'d (the DDP all-reduce,
train_eval_amp.py:188), BN moments are `lax.pmean`'d inside the op (the
sync-BN, train_eval_amp.py:155-157), and activations run in bfloat16 with
fp32 master params and fp32 accumulation — TPU-native mixed precision with
no loss scaling (bf16 has fp32-range exponent, unlike fp16 AMP).

Optimizer: SGD momentum 0.9, wd 1e-5, grad clip 5.0 by global norm, cosine
lr over 250 epochs with 5-epoch linear warmup iff batch>256, label smoothing
0.1, dropout/drop-connect 0.2 (train_eval.py:124-197).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..search.train_step import sgd_momentum_update, zeros_like_momentum
from ..utils.metrics import accuracy, cross_entropy_label_smooth
from .mesh import DATA_AXIS


class EvalTrainState(NamedTuple):
    params: Any
    bn_state: Any
    momentum: Any
    epoch: Any


def init_eval_train_state(net, key):
    params, bn_state = net.init(key)
    return EvalTrainState(params=params, bn_state=bn_state,
                          momentum=zeros_like_momentum(params),
                          epoch=jnp.zeros((), jnp.int32))


def make_eval_steps(net, mesh, *, num_classes, label_smooth=0.1,
                    momentum=0.9, weight_decay=1e-5, grad_clip=5.0,
                    compute_dtype=jnp.bfloat16):
    """Returns (train_step, val_step), both jitted over `mesh`."""

    def _train_shard(params, bn_state, mom, x, y, lr, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(p):
            logits, new_bn = net.apply(
                p, bn_state, x.astype(compute_dtype), training=True,
                rng=key, bn_axis_name=DATA_AXIS)
            loss = cross_entropy_label_smooth(logits, y, num_classes,
                                              label_smooth)
            return loss, (logits, new_bn)

        (loss, (logits, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)

        masks = jax.tree_util.tree_map(lambda p: jnp.ones((), p.dtype), params)
        params, mom = sgd_momentum_update(
            params, grads, mom, masks, lr=lr, momentum=momentum,
            weight_decay=weight_decay, grad_clip=grad_clip)
        top1, top5 = accuracy(logits, y, topk=(1, 5))
        top1 = jax.lax.pmean(top1, DATA_AXIS)
        top5 = jax.lax.pmean(top5, DATA_AXIS)
        return params, new_bn, mom, {"loss": loss, "top1": top1, "top5": top5}

    def _val_shard(params, bn_state, x, y, wmask):
        """wmask: [local_batch] 0/1 validity (padded final batches).
        Metrics are global masked means: psum of weighted sums / psum of
        valid counts — exact over the full validation set."""
        logits, _ = net.apply(params, bn_state, x.astype(compute_dtype),
                              training=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        w = wmask.astype(jnp.float32)
        _, pred = jax.lax.top_k(logits, 5)
        correct = (pred == y[:, None]).astype(jnp.float32) * w[:, None]
        wsum = jax.lax.psum(jnp.sum(w), DATA_AXIS)
        wsum = jnp.maximum(wsum, 1.0)
        loss = jax.lax.psum(jnp.sum(nll * w), DATA_AXIS) / wsum
        top1 = jax.lax.psum(jnp.sum(correct[:, :1]), DATA_AXIS) / wsum * 100.0
        top5 = jax.lax.psum(jnp.sum(correct), DATA_AXIS) / wsum * 100.0
        return {"loss": loss, "top1": top1, "top5": top5}

    rep = P()
    sharded = P(DATA_AXIS)

    train_sm = shard_map(
        _train_shard, mesh=mesh,
        in_specs=(rep, rep, rep, sharded, sharded, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False)
    val_sm = shard_map(
        _val_shard, mesh=mesh,
        in_specs=(rep, rep, sharded, sharded, sharded),
        out_specs=rep,
        check_vma=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: EvalTrainState, x, y, lr, key):
        params, bn, mom, metrics = train_sm(state.params, state.bn_state,
                                            state.momentum, x, y, lr, key)
        return EvalTrainState(params, bn, mom, state.epoch), metrics

    @jax.jit
    def val_step(state: EvalTrainState, x, y, wmask=None):
        if wmask is None:
            wmask = jnp.ones(y.shape, jnp.float32)
        return val_sm(state.params, state.bn_state, x, y, wmask)

    return train_step, val_step


def cosine_lr_with_warmup(base_lr, epochs, epoch, batch_size,
                          warmup_epochs=5):
    """Per-epoch lr matching train_eval.py:163,194-197: closed-form cosine
    plus linear warmup for the first 5 epochs iff batch_size > 256."""
    lr = base_lr * (1 + np.cos(np.pi * epoch / epochs)) / 2
    if epoch < warmup_epochs and batch_size > 256:
        lr = lr * (epoch + 1) / warmup_epochs
    return float(lr)
