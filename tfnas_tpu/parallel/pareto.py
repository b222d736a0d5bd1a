"""Multi-target-latency Pareto search sharded over a pod slice.

BASELINE.json config 5: run G independent TF-NAS searches — one per
`target_lat` point — simultaneously on one device mesh. This is the
framework's expert-parallel-like axis: group state (weights, arch params,
optimizer) carries a leading [G] dim sharded over the mesh 'pareto' axis;
inside each group, the batch is data-parallel over the 'data' axis with
`lax.pmean` gradient reduction (the reference can only run one search per
GPU, train_search.py:79-95).

Layout (mesh ('pareto', 'data')):
  params/arch/opt leaves: [G, ...]  sharded P('pareto')  (replicated in-group)
  batch:                  [G, B, ...] sharded P('pareto', 'data')
  per-group scalars (lr, T, targets, keys): [G, ...] sharded P('pareto')

Each device holds G/|pareto| group slices and vmaps the per-group step over
its local leading dim, so any G that divides into |pareto| works.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models import search_space as ss
from ..search.bisample import (gumbel_softmax_weights, project_log_softmax,
                               sample_gumbel_indices,
                               sample_random_excluding)
from ..search.train_step import (AdamState, adam_init, adam_update,
                                 sgd_momentum_update, zeros_like_momentum)
from ..utils.metrics import accuracy, cross_entropy
from .mesh import DATA_AXIS, PARETO_AXIS


class ParetoSearchState(NamedTuple):
    params: Any       # [G, ...] leaves
    arch_params: Any  # log_alphas [G, 18, 8], betas {stage: [G, d]}
    momentum: Any
    opt_a: Any


def init_pareto_state(net, key, num_groups):
    keys = jax.random.split(key, num_groups)

    def one(k):
        params, arch = net.init(k)
        return params, arch

    params, arch = jax.vmap(one)(keys)
    return ParetoSearchState(params=params, arch_params=arch,
                             momentum=zeros_like_momentum(params),
                             opt_a=jax.vmap(adam_init)(arch))


def stack_group_trees(trees):
    """[tree_g for g in G] -> one tree with leading [G] dim per leaf."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def reset_group_optimizers(state):
    """Fresh per-epoch optimizers (train_search.py:196-206)."""
    return state._replace(
        momentum=zeros_like_momentum(state.params),
        opt_a=jax.vmap(adam_init)(state.arch_params))


def make_pareto_search_steps(net, mesh, *, num_classes, targets,
                             w_mom=0.9, w_wd=1e-5, a_lr=0.01, a_beta1=0.5,
                             a_beta2=0.999, a_wd=5e-4, grad_clip=5.0,
                             lambda_lat=0.1, valid_mask=None):
    """Returns (weight_step, arch_step) over group-stacked state.

    targets: [G] per-group target latencies (ms).
    masks/update_masks/lat_vec are GROUP-STACKED pytrees (leading [G] dim,
    sharded over 'pareto') because per-group elasticity diverges the width
    masks after the warmup epochs — stack with `stack_group_trees`.

    valid_mask: optional [TOTAL_BLOCKS, NUM_OPS] candidate-validity mask
    (hybrid conv/ViT space), shared across groups.
    """
    targets = jnp.asarray(targets, jnp.float32)

    def _group_weight_step(params, arch_params, mom, masks, update_masks,
                           x, y, lr, key):
        kg, kr = jax.random.split(key)
        idx_g = sample_gumbel_indices(kg, arch_params["log_alphas"],
                                      valid_mask)
        idx_r = sample_random_excluding(
            kr, idx_g, arch_params["log_alphas"].shape[-1], valid_mask)

        def loss_fn(p):
            lg, lrnd = net.apply_sampled_pair(p, arch_params, masks, x,
                                              idx_g, idx_r, training=True)
            return cross_entropy(lg, y) + cross_entropy(lrnd, y), lg

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        params, mom = sgd_momentum_update(
            params, grads, mom, update_masks, lr=lr, momentum=w_mom,
            weight_decay=w_wd, grad_clip=grad_clip)
        top1, _ = accuracy(logits, y, topk=(1, 5))
        return params, mom, {"loss": loss,
                             "top1": jax.lax.pmean(top1, DATA_AXIS)}

    def _group_arch_step(params, arch_params, opt_a, masks, x, y, lat_vec,
                         base_lat, temperature, target_lat, key):
        def loss_fn(a):
            w = gumbel_softmax_weights(key, a["log_alphas"], temperature,
                                       valid_mask)
            logits, lat = net.apply_soft(params, a, masks, x, w, lat_vec,
                                         training=True)
            lat = lat + base_lat
            loss_a = cross_entropy(logits, y)
            loss_l = jnp.abs(lat / target_lat - 1.0) * lambda_lat
            return loss_a + loss_l, (loss_a, loss_l, lat)

        (_, (loss_a, loss_l, lat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(arch_params)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        arch_params, opt_a = adam_update(
            arch_params, grads, opt_a, lr=a_lr, b1=a_beta1, b2=a_beta2,
            eps=1e-8, weight_decay=a_wd, grad_clip=grad_clip)
        arch_params = {
            "log_alphas": project_log_softmax(arch_params["log_alphas"],
                                              valid_mask),
            "betas": {k: jax.nn.log_softmax(v, -1)
                      for k, v in arch_params["betas"].items()},
        }
        return arch_params, opt_a, {
            "loss_a": jax.lax.pmean(loss_a, DATA_AXIS),
            "loss_l": loss_l, "lat": lat}

    # shard bodies: vmap the per-group fn over the local group slice
    gspec = P(PARETO_AXIS)
    bspec = P(PARETO_AXIS, DATA_AXIS)
    rspec = P()

    def _w_body(params, arch, mom, masks, umasks, x, y, lr, keys):
        f = jax.vmap(_group_weight_step,
                     in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))
        return f(params, arch, mom, masks, umasks, x, y, lr, keys)

    def _a_body(params, arch, opt_a, masks, x, y, lat_vec, base_lat, T,
                tgt, keys):
        f = jax.vmap(_group_arch_step,
                     in_axes=(0, 0, 0, 0, 0, 0, 0, None, 0, 0, 0))
        return f(params, arch, opt_a, masks, x, y, lat_vec, base_lat, T,
                 tgt, keys)

    w_sm = shard_map(_w_body, mesh=mesh,
                     in_specs=(gspec, gspec, gspec, gspec, gspec, bspec,
                               bspec, gspec, gspec),
                     out_specs=(gspec, gspec, gspec),
                     check_vma=False)
    a_sm = shard_map(_a_body, mesh=mesh,
                     in_specs=(gspec, gspec, gspec, gspec, bspec, bspec,
                               gspec, rspec, gspec, gspec, gspec),
                     out_specs=(gspec, gspec, gspec),
                     check_vma=False)

    @jax.jit
    def weight_step(state: ParetoSearchState, masks, update_masks, x, y,
                    lr, keys):
        """masks/update_masks: group-stacked [G, ...]; lr: [G]; keys:
        [G, 2] uint32; x: [G, B, H, W, C]; y: [G, B]."""
        params, mom, metrics = w_sm(state.params, state.arch_params,
                                    state.momentum, masks, update_masks,
                                    x, y, lr, keys)
        return state._replace(params=params, momentum=mom), metrics

    @jax.jit
    def arch_step(state: ParetoSearchState, masks, x, y, lat_vec, base_lat,
                  temperature, keys):
        """temperature: [G]; lat_vec: [G, 18, 8] per group; keys: [G, 2]."""
        arch, opt_a, metrics = a_sm(state.params, state.arch_params,
                                    state.opt_a, masks, x, y, lat_vec,
                                    base_lat, temperature, targets, keys)
        return state._replace(arch_params=arch, opt_a=opt_a), metrics

    return weight_step, arch_step
