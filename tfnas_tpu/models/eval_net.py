"""Fixed-architecture TF-NAS networks for retraining/serving.

`EvalNetwork` replaces BOTH reference classes:
- `Network(num_classes, parsed_arch, mc_num_dddict, ...)` (model_eval.py:31-244)
  via `EvalNetwork.from_parsed_arch`
- `NetworkCfg(num_classes, model_config, ...)` (model_eval.py:247-430)
  via `EvalNetwork.from_config`

The network is data (a list of static layer objects); `init` builds the
param/state pytrees and `apply` is a pure jittable function, NHWC, suitable
for bf16 compute and pjit sharding. The `.config` property emits the
reference's model.config JSON byte-compatibly (model_eval.py:217-230).
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict

import jax
import jax.numpy as jnp

from ..ops.layers import ConvLayer, LinearLayer, MBInvertedResBlock, set_layer_from_config
from . import search_space as ss


class EvalNetwork:
    """Stem -> stage blocks -> head classifier, fixed architecture."""

    def __init__(self, first_stem, second_stem, stages, feature_mix_layer,
                 classifier, dropout_rate=0.0, drop_connect_rate=0.0):
        self.first_stem = first_stem
        self.second_stem = second_stem
        self.stages = stages  # OrderedDict[stage_name -> list of blocks]
        self.feature_mix_layer = feature_mix_layer
        self.classifier = classifier
        self.dropout_rate = dropout_rate
        self.drop_connect_rate = drop_connect_rate
        self._apply_drop_connect_schedule()

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_parsed_arch(cls, num_classes, parsed_arch, mc_num_dddict,
                         dropout_rate=0.0, drop_connect_rate=0.0,
                         space=None):
        """Reference Network.__init__ (model_eval.py:31-106): block op/mc
        chosen by parsed_arch/mc_num_dddict over the fixed macro skeleton.
        space: macro-skeleton namespace (search_space.make_space); None =
        the reference TF-NAS space."""
        sp = space or ss
        stages = OrderedDict()
        for stage, spec in sp.STAGE_SPECS.items():
            blocks = []
            for i, block in enumerate(parsed_arch.get(stage, {})):
                op_idx = parsed_arch[stage][block]
                mc = mc_num_dddict[stage][block][op_idx]
                if op_idx >= ss.NUM_OPS:
                    # hybrid-space ViT candidate (hybrid_space.VIT_OP_IDX)
                    from . import hybrid_space as hs
                    blocks.append(hs.make_vit_op(
                        (spec["ics"][i], spec["ocs"][i], spec["ss"][i],
                         spec["acts"][i]), mc, affine=True))
                else:
                    blocks.append(sp.make_op(op_idx, spec["ics"][i], mc,
                                             spec["ocs"][i], spec["ss"][i],
                                             True, spec["acts"][i]))
            stages[stage] = blocks
        return cls(
            first_stem=ConvLayer(affine=True, **sp.STEM_CONV),
            second_stem=MBInvertedResBlock(affine=True, **sp.SECOND_STEM),
            stages=stages,
            feature_mix_layer=ConvLayer(affine=True, **sp.HEAD_CONV),
            classifier=LinearLayer(sp.HEAD_FEATURES, num_classes),
            dropout_rate=dropout_rate,
            drop_connect_rate=drop_connect_rate,
        )

    @classmethod
    def from_config(cls, num_classes, model_config, dropout_rate=0.0,
                    drop_connect_rate=0.0):
        """Reference NetworkCfg.__init__ (model_eval.py:247-274): build purely
        from the model.config JSON; classifier out_features is overridden to
        num_classes (model_eval.py:270-272)."""
        stages = OrderedDict()
        for stage in ss.STAGE_NAMES:
            stages[stage] = [set_layer_from_config(c)
                             for c in model_config.get(stage, [])]
        classifier_config = dict(model_config["classifier"])
        classifier_config["out_features"] = num_classes
        return cls(
            first_stem=set_layer_from_config(model_config["first_stem"]),
            second_stem=set_layer_from_config(model_config["second_stem"]),
            stages=stages,
            feature_mix_layer=set_layer_from_config(
                model_config["feature_mix_layer"]),
            classifier=set_layer_from_config(classifier_config),
            dropout_rate=dropout_rate,
            drop_connect_rate=drop_connect_rate,
        )

    # -- structure ---------------------------------------------------------

    def _apply_drop_connect_schedule(self):
        """Linearly-scaled per-block drop connect rate*idx/count
        (model_eval.py:44-45,98-103)."""
        count = 1 + sum(len(b) for b in self.stages.values())
        idx = 1
        self.second_stem = self._with_dc(
            self.second_stem, self.drop_connect_rate * idx / count)
        new_stages = OrderedDict()
        for stage, blocks in self.stages.items():
            out = []
            for block in blocks:
                idx += 1
                out.append(self._with_dc(
                    block, self.drop_connect_rate * idx / count))
            new_stages[stage] = out
        self.stages = new_stages
        self.block_count = count

    @staticmethod
    def _with_dc(block, rate):
        if isinstance(block, MBInvertedResBlock) or block.name == "ViTBlock":
            return dataclasses.replace(block, drop_connect_rate=rate)
        return block

    def iter_blocks(self):
        for stage, blocks in self.stages.items():
            for i, b in enumerate(blocks):
                yield stage, f"block{i + 1}", b

    @property
    def config(self):
        """model.config dict (model_eval.py:217-230)."""
        cfg = {
            "first_stem": self.first_stem.config,
            "second_stem": self.second_stem.config,
        }
        for stage, blocks in self.stages.items():
            cfg[stage] = [b.config for b in blocks]
        cfg["feature_mix_layer"] = self.feature_mix_layer.config
        cfg["classifier"] = self.classifier.config
        return cfg

    # -- params / forward --------------------------------------------------

    def init(self, key):
        keys = jax.random.split(key, 4 + len(self.stages))
        params, state = {}, {}
        params["first_stem"], state["first_stem"] = self.first_stem.init(keys[0])
        params["second_stem"], state["second_stem"] = self.second_stem.init(keys[1])
        for si, (stage, blocks) in enumerate(self.stages.items()):
            sp, st = {}, {}
            bkeys = jax.random.split(keys[2 + si], max(len(blocks), 1))
            for i, block in enumerate(blocks):
                sp[f"block{i + 1}"], st[f"block{i + 1}"] = block.init(bkeys[i])
            params[stage], state[stage] = sp, st
        params["feature_mix_layer"], state["feature_mix_layer"] = \
            self.feature_mix_layer.init(keys[-2])
        params["classifier"], state["classifier"] = \
            self.classifier.init(keys[-1])
        return params, state

    def apply(self, params, state, x, *, training=False, rng=None,
              bn_axis_name=None):
        """Forward (model_eval.py:108-132). Returns (logits, new_state)."""
        new_state = {}
        n_rngs = 1 + self.block_count
        rngs = (jax.random.split(rng, n_rngs) if rng is not None
                else [None] * n_rngs)
        r = iter(range(n_rngs))

        x, new_state["first_stem"] = self.first_stem.apply(
            params["first_stem"], state.get("first_stem", {}), x,
            training=training, bn_axis_name=bn_axis_name)
        x, new_state["second_stem"] = self.second_stem.apply(
            params["second_stem"], state.get("second_stem", {}), x,
            training=training, rng=rngs[next(r)], bn_axis_name=bn_axis_name)

        for stage, blocks in self.stages.items():
            st = {}
            for i, block in enumerate(blocks):
                bn = f"block{i + 1}"
                x, st[bn] = block.apply(
                    params[stage][bn], state.get(stage, {}).get(bn, {}), x,
                    training=training, rng=rngs[next(r)],
                    bn_axis_name=bn_axis_name)
            new_state[stage] = st

        x, new_state["feature_mix_layer"] = self.feature_mix_layer.apply(
            params["feature_mix_layer"], state.get("feature_mix_layer", {}),
            x, training=training, bn_axis_name=bn_axis_name)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.dropout_rate > 0.0 and training and rng is not None:
            keep = 1.0 - self.dropout_rate
            mask = jax.random.bernoulli(rngs[-1], keep, x.shape)
            x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
        x, new_state["classifier"] = self.classifier.apply(
            params["classifier"], state.get("classifier", {}), x,
            training=training, bn_axis_name=bn_axis_name)
        return x, new_state

    # -- analysis ----------------------------------------------------------

    def get_lookup_latency(self, lat_lookup, input_size=224):
        """LUT-predicted latency (model_eval.py:134-215): 'base' plus each
        block's keyed entry at its mid_channels. Resolutions are derived
        statically instead of running a forward."""
        if not lat_lookup:
            return 0.0
        lat = lat_lookup["base"]
        res = input_size // self.first_stem.stride
        for _, _, block in self.iter_blocks():
            if block.name == "ViTBlock":
                from . import hybrid_space as hs
                key = hs.vit_lut_key(res, block.in_channels,
                                     block.out_channels, block.stride,
                                     block.act_func)
            else:
                key = "{}_{}_{}_{}_{}_k{}_s{}_{}".format(
                    block.name, res, block.in_channels, block.se_channels,
                    block.out_channels, block.kernel_size, block.stride,
                    block.act_func)
            lat += lat_lookup[key][block.mid_channels]
            res = res // block.stride if block.stride > 1 else res
        return lat
