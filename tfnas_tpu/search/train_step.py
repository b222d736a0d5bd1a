"""Jitted bi-level search steps.

Reference: train_wo_arch / train_w_arch (train_search.py:318-432). Each of
the three steps (warmup weight step, bi-sampling weight step, soft arch
step) is ONE jitted function over fixed shapes; everything dynamic — learning
rate, temperature, channel masks, per-op latency vectors, PRNG keys — enters
as data, so the full 90-epoch search triggers zero recompiles.

Optimizers are written out explicitly to match PyTorch semantics bit-for-bit:
- weights: clip-by-global-norm(5.0) -> grad + wd*p -> momentum buffer ->
  -lr * buf, with the final delta masked so inactive (masked-out) channels
  stay frozen exactly like the reference's full-width checkpoint rows
  (train_search.py:234-259). Momentum buffers are re-zeroed every epoch
  because the reference recreates its optimizers per epoch
  (train_search.py:196-206).
- arch: torch.Adam(lr=a_lr, betas=(0.5, 0.999), weight_decay=5e-4) with the
  same clip, followed by the log-softmax projection of BOTH log_alphas and
  betas (train_search.py:421-422 projects every arch parameter).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.metrics import accuracy, cross_entropy, masked_mean
from .bisample import (gumbel_softmax_weights, project_log_softmax,
                       sample_gumbel_indices, sample_random_excluding)


# -- generic pytree optimizer pieces --------------------------------------

def global_norm(tree):
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in jax.tree_util.tree_leaves(tree)))


def clip_by_global_norm(tree, max_norm):
    """torch.nn.utils.clip_grad_norm_ semantics: scale by
    max_norm/(norm+1e-6) when that is < 1."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda x: x * scale, tree), norm


def sgd_momentum_update(params, grads, mom, update_masks, *, lr, momentum,
                        weight_decay, grad_clip):
    """One masked SGD+momentum step (torch.optim.SGD, dampening 0)."""
    grads, _ = clip_by_global_norm(grads, grad_clip)
    d = jax.tree_util.tree_map(
        lambda g, p: g + weight_decay * p.astype(jnp.float32), grads, params)
    mom = jax.tree_util.tree_map(lambda m, u: momentum * m + u, mom, d)
    params = jax.tree_util.tree_map(
        lambda p, m, km: p - lr * m * km, params, mom, update_masks)
    return params, mom


class AdamState(NamedTuple):
    step: Any
    mu: Any
    nu: Any


@jax.jit  # one compiled program, not one tiny dispatch per leaf (each
def adam_init(params):  # eager dispatch is a remote compile on a tunnel)
    z = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=z,
                     nu=jax.tree_util.tree_map(jnp.copy, z))


def adam_update(params, grads, st, *, lr, b1, b2, eps, weight_decay,
                grad_clip):
    """torch.optim.Adam with L2 weight decay folded into the gradient."""
    grads, _ = clip_by_global_norm(grads, grad_clip)
    grads = jax.tree_util.tree_map(
        lambda g, p: g + weight_decay * p.astype(jnp.float32), grads, params)
    step = st.step + 1
    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, st.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                st.nu, grads)
    bc1 = 1 - b1 ** step.astype(jnp.float32)
    bc2 = 1 - b2 ** step.astype(jnp.float32)
    params = jax.tree_util.tree_map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, mu, nu)
    return params, AdamState(step=step, mu=mu, nu=nu)


# -- search steps ----------------------------------------------------------

class SearchStepFns(NamedTuple):
    warmup_step: Any     # weight step, single gumbel forward (epochs < 10)
    weight_step: Any     # bi-sampling weight step
    arch_step: Any       # soft arch step
    val_step: Any        # sampled validation forward


def make_search_steps(net, *, num_classes, w_mom=0.9, w_wd=1e-5,
                      a_lr=0.01, a_beta1=0.5, a_beta2=0.999, a_wd=5e-4,
                      grad_clip=5.0, lambda_lat=0.1, target_lat=15.0,
                      lat_under_boost=1.0, jit=True, valid_mask=None):
    """Build the (by default jitted) step functions for SuperNetwork `net`.

    jit=False returns the raw step bodies for composition into larger
    compiled programs (the scanned macro-iteration below).

    valid_mask: optional 0/1 float [TOTAL_BLOCKS, NUM_OPS] marking which
    candidate slots exist per block (hybrid conv/ViT space); None = the
    classic homogeneous 8-op space."""

    def _weight_loss_bisample(params, arch_params, masks, x, y, idx_g, idx_r):
        # NOTE: the grouped single-pass variant (net.apply_multi_sampled)
        # measured ~13% SLOWER on v5e than two sequential sampled passes
        # (XLA lowers 2-group convs worse than two dense convs at these
        # widths). The shared-stem pair (one stem fwd/bwd feeding both
        # sampled trunks — bit-exact, see apply_sampled_pair) is the default.
        logits_g, logits_r = net.apply_sampled_pair(
            params, arch_params, masks, x, idx_g, idx_r, training=True)
        loss = cross_entropy(logits_g, y) + cross_entropy(logits_r, y)
        return loss, logits_g

    def _weight_loss_single(params, arch_params, masks, x, y, idx_g):
        logits_g = net.apply_sampled(params, arch_params, masks, x, idx_g,
                                     training=True)
        return cross_entropy(logits_g, y), logits_g

    def warmup_step(params, arch_params, mom, masks, update_masks, x, y,
                    lr, key):
        """train_wo_arch inner step (train_search.py:330-349)."""
        idx_g = sample_gumbel_indices(key, arch_params["log_alphas"],
                                      valid_mask)
        (loss, logits), grads = jax.value_and_grad(
            _weight_loss_single, has_aux=True)(
                params, arch_params, masks, x, y, idx_g)
        params, mom = sgd_momentum_update(
            params, grads, mom, update_masks, lr=lr, momentum=w_mom,
            weight_decay=w_wd, grad_clip=grad_clip)
        top1, top5 = accuracy(logits, y, topk=(1, 5))
        return params, mom, {"loss": loss, "top1": top1, "top5": top5}

    def weight_step(params, arch_params, mom, masks, update_masks, x, y,
                    lr, key):
        """Bi-sampling weight step (train_search.py:370-391)."""
        kg, kr = jax.random.split(key)
        idx_g = sample_gumbel_indices(kg, arch_params["log_alphas"],
                                      valid_mask)
        idx_r = sample_random_excluding(
            kr, idx_g, arch_params["log_alphas"].shape[-1], valid_mask)
        (loss, logits), grads = jax.value_and_grad(
            _weight_loss_bisample, has_aux=True)(
                params, arch_params, masks, x, y, idx_g, idx_r)
        params, mom = sgd_momentum_update(
            params, grads, mom, update_masks, lr=lr, momentum=w_mom,
            weight_decay=w_wd, grad_clip=grad_clip)
        top1, top5 = accuracy(logits, y, topk=(1, 5))
        return params, mom, {"loss": loss, "top1": top1, "top5": top5}

    def arch_step(params, arch_params, opt_a, masks, x, y, lat_vec,
                  base_lat, temperature, key):
        """Soft arch step (train_search.py:393-422)."""
        def loss_fn(a):
            w = gumbel_softmax_weights(key, a["log_alphas"], temperature,
                                       valid_mask)
            logits, lat = net.apply_soft(params, a, masks, x, w, lat_vec,
                                         training=True)
            lat = lat + base_lat
            loss_a = cross_entropy(logits, y)
            # reference loss form: |lat/target - 1| * lambda
            # (train_search.py:410-412). lat_under_boost > 1 asymmetrically
            # amplifies the UNDER-target side — round-3 evidence showed the
            # symmetric form's soft equilibrium saturates ~25% below high
            # targets (docs/E2E_PROXY30.md run 4); the boost is the
            # mechanism probe for that ceiling. 1.0 = exact parity.
            dev = lat / target_lat - 1.0
            loss_l = jnp.where(dev < 0.0, -dev * lat_under_boost,
                               dev) * lambda_lat
            return loss_a + loss_l, (loss_a, loss_l, lat)

        (_, (loss_a, loss_l, lat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(arch_params)
        arch_params, opt_a = adam_update(
            arch_params, grads, opt_a, lr=a_lr, b1=a_beta1, b2=a_beta2,
            eps=1e-8, weight_decay=a_wd, grad_clip=grad_clip)
        # Projection: every arch parameter -> log-probabilities
        # (train_search.py:421-422 applies log_softmax to log_alphas AND betas)
        arch_params = {
            "log_alphas": project_log_softmax(arch_params["log_alphas"],
                                              valid_mask),
            "betas": {k: jax.nn.log_softmax(v, -1)
                      for k, v in arch_params["betas"].items()},
        }
        return arch_params, opt_a, {"loss_a": loss_a, "loss_l": loss_l,
                                    "lat": lat}

    def val_step(params, arch_params, masks, x, y, key, wmask=None):
        """Sampled validation (train_search.py:435-462; BN stays in
        batch-stat mode — the reference validates in .train()).

        wmask: optional [N] 0/1 validity mask for padded tail batches so the
        FULL val set is scored with static shapes (cf. the eval driver's
        padded validation; reference validates every sample)."""
        idx_g = sample_gumbel_indices(key, arch_params["log_alphas"],
                                      valid_mask)
        logits = net.apply_sampled(params, arch_params, masks, x, idx_g,
                                   training=True)
        if wmask is None:
            loss = cross_entropy(logits, y)
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, y[:, None], -1)[:, 0]
            loss = masked_mean(nll, wmask)
        top1, top5 = accuracy(logits, y, topk=(1, 5), weights=wmask)
        return {"loss": loss, "top1": top1, "top5": top5}

    if not jit:
        return SearchStepFns(warmup_step, weight_step, arch_step, val_step)
    return SearchStepFns(
        jax.jit(warmup_step, donate_argnums=(0, 2)),
        jax.jit(weight_step, donate_argnums=(0, 2)),
        jax.jit(arch_step, donate_argnums=(1, 2)),
        jax.jit(val_step))


def make_scanned_search_iter(net, *, num_classes, arch_every=2, **kw):
    """The bi-level inner loop as ONE compiled lax.scan (BASELINE.json north
    star): each scan unit runs `arch_every` bi-sampling weight steps followed
    by one soft arch step — exactly the reference schedule (an arch step on a
    val batch every 2nd weight step, train_search.py:370-432) — and K units
    run per dispatch, amortizing host->relay dispatch latency.

    Returned fn signature:
      run(params, mom, arch_params, opt_a, masks, update_masks,
          xw [K, arch_every, B, H, W, C], yw [K, arch_every, B],
          xa [K, B, H, W, C], ya [K, B],
          lr, T, lat_vec, base_lat, step0 (int32), key)
      -> (params, mom, arch_params, opt_a, wmetrics [K, arch_every],
          ametrics [K])

    Semantics are identical to calling weight_step/arch_step in a Python
    loop with weight keys fold_in(fold_in(key, 0), global weight counter)
    and arch keys fold_in(fold_in(key, 1), global arch counter) — two
    structurally disjoint streams that can never collide regardless of run
    length (a single counter offset would alias once the weight counter
    crossed it)."""
    raw = make_search_steps(net, num_classes=num_classes, jit=False, **kw)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def run(params, mom, arch_params, opt_a, masks, update_masks,
            xw, yw, xa, ya, lr, T, lat_vec, base_lat, step0, key):
        wkey = jax.random.fold_in(key, 0)
        akey = jax.random.fold_in(key, 1)

        def unit(carry, inp):
            params, mom, arch_params, opt_a, i = carry
            xw_u, yw_u, xa_u, ya_u = inp
            u = i // arch_every  # unit counter == arch-step counter

            def wbody(c, xy):
                p, m, j = c
                p, m, met = raw.weight_step(
                    p, arch_params, m, masks, update_masks, xy[0], xy[1],
                    lr, jax.random.fold_in(wkey, j))
                return (p, m, j + 1), met

            (params, mom, i), wmet = jax.lax.scan(
                wbody, (params, mom, i), (xw_u, yw_u))
            arch_params, opt_a, amet = raw.arch_step(
                params, arch_params, opt_a, masks, xa_u, ya_u, lat_vec,
                base_lat, T, jax.random.fold_in(akey, u))
            return (params, mom, arch_params, opt_a, i), (wmet, amet)

        (params, mom, arch_params, opt_a, _), (wmet, amet) = jax.lax.scan(
            unit, (params, mom, arch_params, opt_a, step0),
            (xw, yw, xa, ya))
        return params, mom, arch_params, opt_a, wmet, amet

    return run


@jax.jit  # see adam_init: single program, not per-leaf dispatches
def zeros_like_momentum(params):
    return jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p, jnp.float32), params)


def cosine_lr_list(base_lr, epochs):
    """Per-epoch cosine lr (torch CosineAnnealingLR closed form,
    train_search.py:105-119)."""
    import numpy as np
    return [base_lr * (1 + np.cos(np.pi * e / epochs)) / 2
            for e in range(epochs)]
