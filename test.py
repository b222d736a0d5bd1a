#!/usr/bin/env python
"""Evaluate a trained TF-NAS model on the validation set (top-1/top-5).

CLI contract matches the reference test.py:30-44. Like the reference's
multi-GPU DataParallel inference (reference test.py:67), evaluation rides
the device mesh: the same shard_map val_step train_eval.py validates with,
batch sharded over the 'data' axis, metrics psum-reduced on device
(exact masked means over the padded final batch).
"""

import argparse
import json
import os

import jax.numpy as jnp
import numpy as np

from tfnas_tpu.data import DataLoader, ImageList, synthetic_loader
from tfnas_tpu.data.transforms import device_normalizer
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.parallel import batch_sharding, make_eval_steps, make_mesh
from tfnas_tpu.parallel.mesh import put_global_batch
from tfnas_tpu.parallel.train_dp import EvalTrainState
from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                     get_op_and_depth_weights,
                                     parse_architecture)
from tfnas_tpu.utils import AverageMeter, load_checkpoint

parser = argparse.ArgumentParser("testing the trained architectures (TPU)")
parser.add_argument('--val_root', type=str, default='')
parser.add_argument('--val_list', type=str, default='')
parser.add_argument('--model_path', type=str, default='',
                    help='the searched model path')
parser.add_argument('--config_path', type=str, default='',
                    help='the model config path')
parser.add_argument('--weights', type=str, required=True,
                    help='pretrained model weights (eval checkpoint)')
parser.add_argument('--workers', type=int, default=4)
parser.add_argument('--batch_size', type=int, default=512)
parser.add_argument('--num_classes', type=int, default=1000)
parser.add_argument('--synthetic', action='store_true')
parser.add_argument('--image_size', type=int, default=224)
parser.add_argument('--n_devices', type=int, default=0,
                    help='devices in the eval mesh (0 = all visible)')


def main():
    from tfnas_tpu.utils.platform import honor_cpu_platform_request
    honor_cpu_platform_request()
    args = parser.parse_args()

    print('parsing the architecture')
    ckpt = load_checkpoint(args.weights)
    if args.model_path and os.path.isfile(args.model_path):
        op_w, depth_w = get_op_and_depth_weights(args.model_path)
        parsed_arch = parse_architecture(op_w, depth_w)
        mc_mask = load_checkpoint(args.model_path)['mc_mask_dddict']
        net = EvalNetwork.from_parsed_arch(args.num_classes, parsed_arch,
                                           get_mc_num_dddict(mc_mask))
    elif args.config_path and os.path.isfile(args.config_path):
        net = EvalNetwork.from_config(args.num_classes,
                                      json.load(open(args.config_path)))
    elif 'model_config' in ckpt:
        net = EvalNetwork.from_config(args.num_classes, ckpt['model_config'])
    else:
        raise Exception('invalid --model_path and --config_path')

    params, bn_state = ckpt['params'], ckpt['bn_state']

    mesh = make_mesh(args.n_devices or None)
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (
        f"--batch_size {args.batch_size} must divide over {n_dev} devices")
    # fp32 compute: test.py is the accuracy scorer (all committed family
    # rescores were produced fp32); bf16 stays the training-path default
    _, val_step = make_eval_steps(net, mesh, num_classes=args.num_classes,
                                  compute_dtype=jnp.float32)
    # momentum is never touched by val_step; None is an empty pytree leaf
    state = EvalTrainState(params, bn_state, None, jnp.zeros((), jnp.int32))
    xsh = batch_sharding(mesh)

    prep = device_normalizer(jnp.float32)

    if args.synthetic:
        batches = synthetic_loader(args.batch_size, 8, args.num_classes,
                                   args.image_size)
    else:
        ds = ImageList(args.val_root, args.val_list, training=False,
                       image_size=args.image_size, output="uint8")
        batches = DataLoader(ds, args.batch_size, shuffle=False,
                             num_workers=args.workers, drop_last=False,
                             pad_last=True)

    meters = {k: AverageMeter() for k in ("loss", "top1", "top5")}
    for batch in batches:
        x, y = batch[0], batch[1]
        n = batch[2] if len(batch) > 2 else len(y)
        wmask = np.zeros((len(y),), np.float32)
        wmask[:n] = 1.0
        x = put_global_batch(np.asarray(x), xsh)
        y = put_global_batch(np.asarray(y), xsh)
        m = val_step(state, prep(x), y, put_global_batch(wmask, xsh))
        meters["loss"].update(float(m["loss"]), n)
        meters["top1"].update(float(m["top1"]), n)
        meters["top5"].update(float(m["top5"]), n)
    print('Val_acc_top1: {:.4f}'.format(meters["top1"].avg))
    print('Val_acc_top5: {:.4f}'.format(meters["top5"].avg))


if __name__ == '__main__':
    main()
