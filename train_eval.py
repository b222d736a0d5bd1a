#!/usr/bin/env python
"""Retrain a searched TF-NAS architecture on ImageNet — data-parallel, bf16.

One driver replaces BOTH reference trainers (train_eval.py and
train_eval_amp.py): the jitted shard_map step is data-parallel over every
visible device with cross-replica BN and bf16 activations by default, so
apex AMP / DDP / sync-BN flags collapse into --no_bf16 / --no_sync_bn.
CLI contract otherwise matches train_eval.py:29-59.
"""

import argparse
import faulthandler
import json
import logging
import os
import signal
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.data import (DataLoader, DevicePrefetcher, ImageList,
                            synthetic_loader)
from tfnas_tpu.data.transforms import device_normalizer
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.parallel import (batch_sharding, make_mesh,
                                cosine_lr_with_warmup, make_eval_steps)
from tfnas_tpu.parallel.mesh import (host_shard, is_main_process,
                                     maybe_distributed_init,
                                     put_global_batch)
from tfnas_tpu.parallel.train_dp import EvalTrainState
from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                     get_op_and_depth_weights,
                                     parse_architecture)
from tfnas_tpu.search.train_step import zeros_like_momentum
from tfnas_tpu.utils import (AverageMeter, load_checkpoint, save_checkpoint,
                             setup_experiment, to_numpy_tree)

parser = argparse.ArgumentParser(
    "training the searched architecture on imagenet (TPU)")
# various path
parser.add_argument('--train_root', type=str, default='')
parser.add_argument('--val_root', type=str, default='')
parser.add_argument('--train_list', type=str, default='')
parser.add_argument('--val_list', type=str, default='')
parser.add_argument('--model_path', type=str, default='',
                    help='the searched model path')
parser.add_argument('--config_path', type=str, default='',
                    help='the model config path')
parser.add_argument('--save', type=str, default='./checkpoints/')
parser.add_argument('--snapshot', type=str, default='', help='for reset')
# training hyper-parameters (train_eval.py:41-53)
parser.add_argument('--print_freq', type=int, default=100)
parser.add_argument('--workers', type=int, default=16)
parser.add_argument('--epochs', type=int, default=250)
parser.add_argument('--batch_size', type=int, default=512)
parser.add_argument('--lr', type=float, default=0.2)
parser.add_argument('--momentum', type=float, default=0.9)
parser.add_argument('--weight_decay', type=float, default=1e-5)
parser.add_argument('--grad_clip', type=float, default=5.0)
parser.add_argument('--label_smooth', type=float, default=0.1)
parser.add_argument('--num_classes', type=int, default=1000)
parser.add_argument('--dropout_rate', type=float, default=0.2)
parser.add_argument('--drop_connect_rate', type=float, default=0.2)
# others
parser.add_argument('--seed', type=int, default=2)
parser.add_argument('--note', type=str, default='try')
# TPU-native extras
parser.add_argument('--bf16', action='store_true', default=True)
parser.add_argument('--no_bf16', dest='bf16', action='store_false')
parser.add_argument('--synthetic', action='store_true')
parser.add_argument('--steps_per_epoch', type=int, default=0)
parser.add_argument('--image_size', type=int, default=224)
parser.add_argument('--rrc_min_scale', type=float, default=0.08,
                    help='RandomResizedCrop min area fraction (0.08 = '
                         'reference; ~0.35 for the compositional proxy set)')
parser.add_argument('--n_devices', type=int, default=0,
                    help='devices to use (0 = all)')


def build_model(args):
    """Arch from --model_path (parse checkpoint) or --config_path (JSON)
    (train_eval.py:104-115)."""
    if args.model_path and os.path.isfile(args.model_path):
        op_weights, depth_weights = get_op_and_depth_weights(args.model_path)
        parsed_arch = parse_architecture(op_weights, depth_weights)
        mc_mask_dddict = load_checkpoint(args.model_path)['mc_mask_dddict']
        mc_num_dddict = get_mc_num_dddict(mc_mask_dddict)
        return EvalNetwork.from_parsed_arch(
            args.num_classes, parsed_arch, mc_num_dddict,
            args.dropout_rate, args.drop_connect_rate)
    if args.config_path and os.path.isfile(args.config_path):
        model_config = json.load(open(args.config_path))
        return EvalNetwork.from_config(
            args.num_classes, model_config,
            args.dropout_rate, args.drop_connect_rate)
    raise Exception('invalid --model_path and --config_path')


def main():
    from tfnas_tpu.utils.platform import honor_cpu_platform_request
    honor_cpu_platform_request()
    args = parser.parse_args()
    # multi-process launch (pod): one driver process per host, coordinated
    # via jax.distributed (reference NCCL init, train_eval_amp.py:121-131)
    proc_idx, proc_cnt = maybe_distributed_init()
    if is_main_process():
        run_dir = setup_experiment(args.save, 'eval', args.note)
    else:
        # non-main hosts: stdout-only logging, no run-dir writes
        # (train_eval_amp.py:294-301 rank-0 gating)
        logging.basicConfig(level=logging.INFO, force=True,
                            format=f"[host {proc_idx}] %(message)s")
        run_dir = None
    logging.info("args = %s", args)
    if proc_cnt > 1:
        logging.info("multi-host: process %d/%d, %d local / %d global devices",
                     proc_idx, proc_cnt, jax.local_device_count(),
                     jax.device_count())

    net = build_model(args)
    if is_main_process():
        with open(os.path.join(run_dir, 'model.config'), 'w') as f:
            json.dump(net.config, f, indent=4)

    mesh = make_mesh(args.n_devices or None)
    n_dev = mesh.devices.size
    assert args.batch_size % n_dev == 0, (args.batch_size, n_dev)
    logging.info("mesh: %s", mesh)

    train_step, val_step = make_eval_steps(
        net, mesh, num_classes=args.num_classes,
        label_smooth=args.label_smooth, momentum=args.momentum,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)

    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    params, bn_state = net.init(init_key)
    state = EvalTrainState(params, bn_state, zeros_like_momentum(params),
                           jnp.zeros((), jnp.int32))

    start_epoch, best_acc_top1, best_acc_top5 = 0, 0.0, 0.0
    if args.snapshot:
        logging.info('loading snapshot from %s', args.snapshot)
        ckpt = load_checkpoint(args.snapshot)
        start_epoch = ckpt['epoch']
        best_acc_top1 = ckpt['best_acc_top1']
        best_acc_top5 = ckpt['best_acc_top5']
        state = EvalTrainState(ckpt['params'], ckpt['bn_state'],
                               ckpt['momentum'], jnp.asarray(start_epoch))

    # data — per-host shard of the global batch (multi-host: ImageList
    # host_shard is the DistributedSampler equivalent, equal padded shards;
    # local loaders feed put_global_batch/DevicePrefetcher assembly)
    assert args.batch_size % proc_cnt == 0, (args.batch_size, proc_cnt)
    local_bs = args.batch_size // proc_cnt
    if args.synthetic:
        spe = args.steps_per_epoch or 50
        def train_iter(ep):
            return synthetic_loader(local_bs, spe, args.num_classes,
                                    args.image_size, seed=(ep, proc_idx))
        def val_iter(ep):
            return synthetic_loader(local_bs, max(spe // 4, 1),
                                    args.num_classes, args.image_size,
                                    seed=(99_000 + ep, proc_idx))
    else:
        train_ds = ImageList(args.train_root, args.train_list, training=True,
                             image_size=args.image_size, output="uint8",
                             host_shard=host_shard(),
                             rrc_scale=(args.rrc_min_scale, 1.0))
        val_ds = ImageList(args.val_root, args.val_list, training=False,
                           image_size=args.image_size, output="uint8",
                           host_shard=host_shard())
        tl = DataLoader(train_ds, local_bs, shuffle=True,
                        num_workers=args.workers, seed=args.seed)
        vl = DataLoader(val_ds, local_bs, shuffle=False,
                        num_workers=args.workers, seed=args.seed,
                        drop_last=False, pad_last=True)
        def train_iter(ep):
            tl.set_epoch(ep)
            it = iter(tl)
            if args.steps_per_epoch:
                import itertools
                return itertools.islice(it, args.steps_per_epoch)
            return it
        def val_iter(ep):
            return iter(vl)

    xsh = batch_sharding(mesh)
    # uint8 batches normalize on device (4x less host->device traffic);
    # float (synthetic) batches just cast
    prep = device_normalizer(jnp.bfloat16 if args.bf16 else jnp.float32)

    # Metrics accumulate ON DEVICE as [loss*n, top1*n, top5*n, n] sums and
    # are pulled in ONE transfer per log line: on a tunneled device link
    # every distinct device->host pull costs a full round trip (~150 ms),
    # so per-step (or even deferred per-scalar) pulls dominate step time.
    @jax.jit
    def _acc3(acc, m, n):
        return acc + jnp.stack(
            [m["loss"] * n, m["top1"] * n, m["top5"] * n, n])

    def _avg3(acc):
        a = np.asarray(acc)  # the single pull
        n = max(a[3], 1.0)
        return a[0] / n, a[1] / n, a[2] / n

    for epoch in range(start_epoch, args.epochs):
        lr = cosine_lr_with_warmup(args.lr, args.epochs, epoch,
                                   args.batch_size)
        logging.info('Epoch: %d lr %e', epoch, lr)
        # device-side sums cover EVERY step (reference train_eval.py:253-261)
        macc = jnp.zeros((4,), jnp.float32)

        epoch_start = time.time()
        # prefetcher double-buffers sharded H2D transfers ahead of compute
        for step, (x, y) in enumerate(
                DevicePrefetcher(train_iter(epoch), depth=2, sharding=xsh)):
            if proc_cnt > 1 and epoch == start_epoch and step == 0:
                # multi-host evidence: the jitted step sees the GLOBAL batch
                # assembled from every host's local shard
                logging.info('global train batch x: %s', tuple(x.shape))
            key, k1 = jax.random.split(key)
            state, m = train_step(state, prep(x), y, jnp.float32(lr), k1)
            macc = _acc3(macc, m, jnp.float32(len(y)))
            if step % args.print_freq == 0:
                loss_a, top1_a, top5_a = _avg3(macc)
                logging.info('TRAIN Step: %03d Objs: %e R1: %f R5: %f',
                             step, loss_a, top1_a, top5_a)
        _, train_top1, _ = _avg3(macc)
        logging.info('Train_acc: %f', train_top1)

        vacc = jnp.zeros((4,), jnp.float32)
        for step, batch in enumerate(val_iter(epoch)):
            x, y = batch[0], batch[1]
            n_valid = batch[2] if len(batch) > 2 else len(y)
            wmask = np.zeros((len(y),), np.float32)
            wmask[:n_valid] = 1.0
            x = put_global_batch(np.asarray(x), xsh)
            y = put_global_batch(np.asarray(y), xsh)
            m = val_step(state, prep(x), y,
                         put_global_batch(wmask, xsh))
            vacc = _acc3(vacc, m, jnp.float32(n_valid * proc_cnt))
        val_loss, val_acc_top1, val_acc_top5 = _avg3(vacc)
        logging.info('Val_acc_top1: %f', val_acc_top1)
        logging.info('Val_acc_top5: %f', val_acc_top5)
        logging.info('Epoch time: %ds.', time.time() - epoch_start)

        is_best = val_acc_top1 > best_acc_top1
        if is_best:
            best_acc_top1, best_acc_top5 = val_acc_top1, val_acc_top5
        if not is_main_process():
            continue
        save_checkpoint({
            'epoch': epoch + 1,
            'params': to_numpy_tree(state.params),
            'bn_state': to_numpy_tree(state.bn_state),
            'momentum': to_numpy_tree(state.momentum),
            'best_acc_top1': best_acc_top1,
            'best_acc_top5': best_acc_top5,
            'model_config': net.config,
        }, is_best, run_dir)


if __name__ == '__main__':
    main()
