"""Checkpoint save/load.

Replaces torch.save/.load `.pth.tar` shuttles (tools/utils.py:118-123,
train_search.py:98-103,310-315) with pickled numpy pytrees. Device arrays
are pulled to host numpy on save, so checkpoints are portable and contain no
framework objects. Formats:

- search checkpoint: {'params', 'state', 'arch_params', 'opt_state'?,
  'mc_mask_dddict', 'epoch', 'T'}
- eval checkpoint: {'epoch', 'params', 'state', 'opt_state',
  'best_acc_top1', 'best_acc_top5'}
- model.config JSON stays the portable architecture format (unchanged).
"""

from __future__ import annotations

import os
import pickle
import shutil

import jax
import numpy as np


def to_numpy_tree(tree):
    """Pull device arrays to host numpy; leave non-array leaves (strings,
    ints, config dict values) untouched.

    Device leaves are PACKED into one flat array per dtype on device, pulled
    in a single transfer each, and split back on the host. On a tunneled
    device link every distinct device->host transfer costs a full round trip
    (~150 ms measured) regardless of size — pulling a 200-leaf parameter
    tree leaf-by-leaf serializes into minutes, while one packed 376 MB
    transfer takes seconds. The packing itself is ONE jitted program per
    dtype group — per-leaf eager reshapes would each be a separate remote
    compile on the same link."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = list(leaves)
    groups = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            groups.setdefault(np.dtype(x.dtype), []).append(i)
        elif isinstance(x, np.ndarray):
            out[i] = np.asarray(x)
    for dt, idxs in groups.items():
        if len(idxs) == 1:
            out[idxs[0]] = np.asarray(leaves[idxs[0]])
            continue
        host = np.asarray(_pack([leaves[i] for i in idxs]))  # ONE transfer
        off = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.jit
def _pack(leaves):
    import jax.numpy as jnp
    return jnp.concatenate([l.reshape(-1) for l in leaves])


def save_checkpoint_file(obj, path):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(to_numpy_tree(obj), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint(state, is_best, save_dir, name="checkpoint.pkl",
                    best_name="model_best.pkl"):
    """Save + best-copy (tools/utils.py:118-123)."""
    filename = os.path.join(save_dir, name)
    save_checkpoint_file(state, filename)
    if is_best:
        shutil.copyfile(filename, os.path.join(save_dir, best_name))
    return filename


def create_exp_dir(path):
    """(tools/utils.py:126-135)"""
    os.makedirs(path, exist_ok=True)
    print(f"Experiment dir : {path}")
    return path
