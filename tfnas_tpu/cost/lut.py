"""Latency lookup table (LUT) module.

File format is byte-compatible with the reference pickles
(latency_pkl/latency_{gpu,cpu}.pkl, component #15 in SURVEY.md): a dict with
key 'base' -> float ms (stem+head) and 66 block keys
'MBInvertedResBlock_{res}_{cin}_{se}_{cout}_k{K}_s{S}_{act}' ->
{mid_channels(int): ms(float)} for every integer mc in 1..max.

On top of the raw dict this module provides:
- negative-entry clamping (the shipped GPU LUT contains negative fitted
  values at tiny mc; differentiable latency must stay >= 0),
- dense per-block arrays [NUM_OPS, max_mc] for the differentiable latency
  path (a gather + contraction with Gumbel weights inside jit, replacing the
  per-op Python dict lookups of model_search.py:93-111),
- the parsed-arch latency sum (train_search.py:465-475).
"""

from __future__ import annotations

import pickle

import numpy as np

from ..models import search_space as ss


def load_lat_lookup(path, clamp_negative=True):
    with open(path, "rb") as f:
        lut = pickle.load(f)
    if clamp_negative:
        for key, val in lut.items():
            if key == "base":
                continue
            for mc in val:
                if val[mc] < 0.0:
                    val[mc] = 0.0
    return lut


def save_lat_lookup(lut, path):
    with open(path, "wb") as f:
        pickle.dump(lut, f)


def lat_vectors_for_mc(lat_lookup, mc_num_dddict, key_dddict=None,
                       num_ops=None):
    """Dense per-block latency vectors at the CURRENT mid-channel choices.

    Returns float32 [TOTAL_BLOCKS, NUM_OPS]; entry (b, o) is
    lat_lookup[key(b,o)][mc_num_dddict[...][o]] — the per-op latencies the
    soft path contracts with Gumbel weights (model_search.py:88-90).
    Recomputed per epoch (mc only changes at epoch boundaries), fed to the
    jitted step as an array.

    key_dddict/num_ops: override for extended spaces (hybrid conv/ViT —
    candidate slots a block does not offer stay 0, and their Gumbel weight
    is exactly 0 via the validity mask).
    """
    if key_dddict is None:
        key_dddict = ss.lat_lookup_key_dddict
    if num_ops is None:
        num_ops = ss.NUM_OPS
    # iteration order comes from the (Ordered) key dddict itself so reduced
    # spaces (search_space.make_space) reuse this path unchanged
    total_blocks = sum(len(key_dddict[stage]) for stage in key_dddict)
    out = np.zeros((total_blocks, num_ops), np.float32)
    b = 0
    for stage in key_dddict:
        for block in key_dddict[stage]:
            for op_idx in key_dddict[stage][block]:
                key = key_dddict[stage][block][op_idx]
                mc = mc_num_dddict[stage][block][op_idx]
                out[b, op_idx] = lat_lookup[key][mc]
            b += 1
    return out


def get_lookup_latency(parsed_arch, mc_num_dddict, lat_lookup_key_dddict,
                       lat_lookup):
    """Parsed-architecture LUT latency (train_search.py:465-475)."""
    lat = lat_lookup["base"]
    for stage in parsed_arch:
        for block in parsed_arch[stage]:
            op_idx = parsed_arch[stage][block]
            mc = mc_num_dddict[stage][block][op_idx]
            key = lat_lookup_key_dddict[stage][block][op_idx]
            lat += lat_lookup[key][mc]
    return lat
