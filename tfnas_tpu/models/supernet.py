"""The TF-NAS supernet, TPU-native.

Reference: MixedOP / MixedStage / Network (models/model_search.py:32-365).
Redesigned for XLA's compile-once model:

- **Fixed shapes forever.** Every candidate op holds parameters at its MAX
  mid-channel width (4*ic for e3 ops, 8*ic for e6 ops); the current width is
  a 0/1 channel mask passed in as data. The reference instead rebuilds the
  network at new tensor shapes every epoch and shuttles weights through an
  `exec()`/`index_select` checkpoint dance (train_search.py:156-194,234-259).
  Masked channels produce exactly-zero activations and exactly-zero
  gradients, so the masked fixed-shape supernet is numerically identical to
  the reference's narrow rebuilt one (masking BN batch stats per channel is
  exact), while the whole 90-epoch search runs one compiled step function.

- **Functional sampling.** Op choices are sampled OUTSIDE the model with
  `jax.random` (see search/bisample.py) and enter the jitted forward as an
  int32 index vector; each block dispatches with `lax.switch` over its 8
  candidate branches, so the hard-sampled path executes one branch per block
  (the reference's Python switch bookkeeping, model_search.py:49-85).

- **Soft path** computes all 8 branches weighted by Gumbel-softmax weights
  and contracts per-op LUT latencies ([18, 8] dense array) with the same
  weights — the differentiable latency term (model_search.py:86-111).

- **Sink-connecting depth gates** (model_search.py:157-206): each stage
  collects every block output and mixes with softmax(betas); in both hard
  and soft modes, exactly like the reference.

Search-time BN is affine=False / batch-stats-only (model_search.py:225,
layers.py:101-103), so the supernet carries NO running state at all.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.layers import ConvLayer, LinearLayer, MBInvertedResBlock
from . import search_space as ss


@dataclasses.dataclass(frozen=True)
class BlockSite:
    """One searchable block position in the macro skeleton."""
    stage: str
    block: str           # 'block1'..
    global_idx: int      # 0..17
    ic: int
    oc: int
    stride: int
    act: str

    def candidate(self, op_idx):
        """The op at MAX width for this site."""
        mc_max = self.ic * ss.OP_MAX_EXPAND[op_idx]
        return ss.make_op(op_idx, self.ic, mc_max, self.oc, self.stride,
                          False, self.act)


def block_sites():
    sites = []
    g = 0
    for stage, spec in ss.STAGE_SPECS.items():
        for i in range(len(spec["ics"])):
            sites.append(BlockSite(stage, f"block{i + 1}", g, spec["ics"][i],
                                   spec["ocs"][i], spec["ss"][i],
                                   spec["acts"][i]))
            g += 1
    return sites


class SuperNetwork:
    """Supernet over the TF-NAS space (model_search.py:213-365)."""

    def __init__(self, num_classes):
        self.num_classes = num_classes
        self.first_stem = ConvLayer(affine=False, **ss.STEM_CONV)
        self.second_stem = MBInvertedResBlock(affine=False, **ss.SECOND_STEM)
        self.sites = block_sites()
        # candidate layer objects per site per op (static descriptors)
        self.candidates = [
            [site.candidate(o) for o in range(ss.NUM_OPS)]
            for site in self.sites
        ]
        self.feature_mix_layer = ConvLayer(affine=False, **ss.HEAD_CONV)
        self.classifier = LinearLayer(ss.HEAD_FEATURES, num_classes)

    # -- init --------------------------------------------------------------

    def init(self, key):
        """Returns (params, arch_params).

        params mirrors the reference module tree:
        {'first_stem', 'second_stem', 'stage{i}': {'block{j}': {'op{k}':
        op_params}}, 'feature_mix_layer', 'classifier'}.
        arch_params: {'log_alphas': [18, 8] (log-softmax init, i.e. log(1/8),
        model_search.py:113-116), 'betas': {stage: zeros[depth]}
        (model_search.py:208-210)}.
        """
        n = len(self.sites)
        keys = jax.random.split(key, n + 4)
        params = {}
        params["first_stem"], _ = self.first_stem.init(keys[n])
        params["second_stem"], _ = self.second_stem.init(keys[n + 1])
        for site, cands, k in zip(self.sites, self.candidates, keys[:n]):
            stage_p = params.setdefault(site.stage, {})
            opkeys = jax.random.split(k, ss.NUM_OPS)
            stage_p[site.block] = {
                f"op{o}": cands[o].init(opkeys[o])[0]
                for o in range(ss.NUM_OPS)
            }
        params["feature_mix_layer"], _ = self.feature_mix_layer.init(keys[n + 2])
        params["classifier"], _ = self.classifier.init(keys[n + 3])

        arch_params = {
            "log_alphas": jnp.full((n, ss.NUM_OPS),
                                   -np.log(ss.NUM_OPS), jnp.float32),
            "betas": {stage: jnp.zeros((ss.STAGE_DEPTHS[stage],), jnp.float32)
                      for stage in ss.STAGE_NAMES},
        }
        return params, arch_params

    # -- forward helpers ---------------------------------------------------

    def _stem(self, params, x, training):
        x, _ = self.first_stem.apply(params["first_stem"], {}, x,
                                     training=training)
        x, _ = self.second_stem.apply(params["second_stem"],
                                      {"depth_conv": {}, "point_linear": {}},
                                      x, training=training)
        return x

    def _head(self, params, x, training):
        x, _ = self.feature_mix_layer.apply(params["feature_mix_layer"], {},
                                            x, training=training)
        x = jnp.mean(x, axis=(1, 2))
        x, _ = self.classifier.apply(params["classifier"], {}, x,
                                     training=training)
        return x

    @staticmethod
    def _empty_state(op):
        st = {"depth_conv": {}, "point_linear": {}}
        if op.has_expand:
            st["inverted_bottleneck"] = {}
        return st

    def _run_block_sampled(self, site, params, masks, x, op_idx, training):
        """lax.switch over the 8 candidate branches; executes one."""
        branches = []
        for o in range(ss.NUM_OPS):
            op = self.candidates[site.global_idx][o]
            p = params[site.stage][site.block][f"op{o}"]
            m = masks[site.stage][site.block][f"op{o}"]

            def branch(xx, op=op, p=p, m=m):
                y, _ = op.apply(p, self._empty_state(op), xx,
                                training=training, channel_mask=m)
                return y

            branches.append(branch)
        return jax.lax.switch(op_idx, branches, x)

    def _run_block_soft(self, site, params, masks, x, weights, training):
        """out = sum_o w_o * op_o(x) (model_search.py:86-91)."""
        out = None
        for o in range(ss.NUM_OPS):
            op = self.candidates[site.global_idx][o]
            p = params[site.stage][site.block][f"op{o}"]
            m = masks[site.stage][site.block][f"op{o}"]
            y, _ = op.apply(p, self._empty_state(op), x, training=training,
                            channel_mask=m)
            y = y * weights[o].astype(y.dtype)
            out = y if out is None else out + y
        return out

    # -- public forwards ---------------------------------------------------

    def apply_sampled(self, params, arch_params, masks, x, op_indices, *,
                      training=True):
        """Hard-sampled forward (sampling=True path, model_search.py:58-85 +
        281-304). `op_indices`: int32 [18]. Returns logits.

        Depth mixing still applies softmax(betas) over the per-stage sink
        outputs (model_search.py:202-204)."""
        x = self._stem(params, x, training)
        si = 0
        for stage in ss.STAGE_NAMES:
            depth = ss.STAGE_DEPTHS[stage]
            res_list = []
            h = x
            for d in range(depth):
                site = self.sites[si + d]
                h = self._run_block_sampled(site, params, masks, h,
                                            op_indices[site.global_idx],
                                            training)
                res_list.append(h)
            w = jax.nn.softmax(arch_params["betas"][stage])
            x = sum(w[d].astype(r.dtype) * r for d, r in enumerate(res_list))
            si += depth
        return self._head(params, x, training)

    def apply_soft(self, params, arch_params, masks, x, gumbel_weights,
                   lat_vec, *, training=True):
        """Soft forward (sampling=False path): all 8 ops weighted by
        `gumbel_weights` [18, 8], plus the differentiable latency
        (model_search.py:86-111,157-206,281-304).

        lat_vec: [18, 8] per-op latencies at current widths. Returns
        (logits, total_latency) with total = lut 'base' excluded — the caller
        adds the base constant (model_search.py:282)."""
        x = self._stem(params, x, training)
        total_lat = jnp.zeros((), jnp.float32)
        si = 0
        for stage in ss.STAGE_NAMES:
            depth = ss.STAGE_DEPTHS[stage]
            res_list, lat_list = [], []
            h = x
            cum_lat = jnp.zeros((), jnp.float32)
            for d in range(depth):
                site = self.sites[si + d]
                wv = gumbel_weights[site.global_idx]
                h = self._run_block_soft(site, params, masks, h, wv, training)
                cum_lat = cum_lat + jnp.dot(wv, lat_vec[site.global_idx])
                res_list.append(h)
                lat_list.append(cum_lat)
            w = jax.nn.softmax(arch_params["betas"][stage])
            x = sum(w[d].astype(r.dtype) * r for d, r in enumerate(res_list))
            total_lat = total_lat + sum(w[d] * l for d, l in enumerate(lat_list))
            si += depth
        logits = self._head(params, x, training)
        return logits, total_lat

    # -- masks -------------------------------------------------------------

    def device_masks(self, mc_mask_dddict):
        """Numpy mask registry -> device-array pytree keyed like params."""
        out = {}
        for site in self.sites:
            stage = out.setdefault(site.stage, {})
            stage[site.block] = {
                f"op{o}": jnp.asarray(
                    mc_mask_dddict[site.stage][site.block][o], jnp.float32)
                for o in range(ss.NUM_OPS)
            }
        return out

    def update_masks(self, params, mc_mask_dddict):
        """Pytree shaped like `params` that zeroes optimizer updates to
        masked-out channels, so inactive rows stay frozen exactly as in the
        reference's full-width checkpoint (train_search.py:234-259).

        Pure gradients of masked rows are already zero (masked activations
        are zero); this additionally blocks weight decay from shrinking
        inactive rows."""
        def resolve(path, leaf):
            keys = [p.key for p in path if hasattr(p, "key")]
            if len(keys) >= 3 and keys[0].startswith("stage") and \
               keys[2].startswith("op"):
                stage, block, opk = keys[0], keys[1], keys[2]
                mask = np.asarray(mc_mask_dddict[stage][block][int(opk[2:])],
                                  np.float32)
                sub = keys[3:]
                if sub == ["inverted_bottleneck", "conv", "kernel"]:
                    return jnp.asarray(mask)[None, None, None, :]
                if sub == ["depth_conv", "conv", "kernel"]:
                    return jnp.asarray(mask)[None, None, None, :]
                if sub == ["squeeze_excite", "conv_reduce", "kernel"]:
                    return jnp.asarray(mask)[:, None]
                if sub == ["squeeze_excite", "conv_expand", "kernel"]:
                    return jnp.asarray(mask)[None, :]
                if sub == ["squeeze_excite", "conv_expand", "bias"]:
                    return jnp.asarray(mask)
                # conv_reduce.bias, point_linear kernel input dim:
                if sub == ["point_linear", "conv", "kernel"]:
                    return jnp.asarray(mask)[None, None, :, None]
            return jnp.ones((), leaf.dtype)

        return jax.tree_util.tree_map_with_path(resolve, params)
