#!/usr/bin/env python
"""Evaluate a trained TF-NAS model on the validation set (top-1/top-5).

CLI contract matches the reference test.py:30-44.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.data import DataLoader, ImageList, synthetic_loader
from tfnas_tpu.data.transforms import device_normalizer
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                     get_op_and_depth_weights,
                                     parse_architecture)
from tfnas_tpu.utils import AverageMeter, load_checkpoint
from tfnas_tpu.utils.metrics import accuracy, masked_mean

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

    prep = device_normalizer(jnp.float32)

    @jax.jit
    def fwd(p, s, x, y, wmask):
        logits, _ = net.apply(p, s, x, training=False)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        loss = masked_mean(nll, wmask)
        top1, top5 = accuracy(logits, y, topk=(1, 5), weights=wmask)
        return loss, top1, top5

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
        loss, top1, top5 = fwd(params, bn_state, prep(jnp.asarray(x)),
                               jnp.asarray(y), jnp.asarray(wmask))
        meters["loss"].update(float(loss), n)
        meters["top1"].update(float(top1), n)
        meters["top5"].update(float(top5), n)
    print('Val_acc_top1: {:.4f}'.format(meters["top1"].avg))
    print('Val_acc_top5: {:.4f}'.format(meters["top5"].avg))


if __name__ == '__main__':
    main()
