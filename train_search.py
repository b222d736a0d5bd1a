#!/usr/bin/env python
"""TF-NAS supernet search driver, TPU-native.

CLI contract matches the reference train_search.py:29-66 (same flags, same
defaults, same checkpoint-per-epoch behavior). The training loop itself is
redesigned: one jitted weight step + one jitted arch step run for the whole
search with zero recompiles — width elasticity is channel masks, not network
rebuilds (cf. reference train_search.py:155-315).

Extra flags beyond the reference:
  --bf16/--no_bf16    bfloat16 activations (default on; TPU-native AMP)
  --synthetic         synthetic data (no ImageNet needed; smoke/bench)
  --steps_per_epoch   cap steps per epoch (0 = full epoch)
  --image_size        input resolution (default 224)
"""

import argparse
import faulthandler
import logging
import signal
import time

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.measure import force
from tfnas_tpu.cost.lut import lat_vectors_for_mc, load_lat_lookup
from tfnas_tpu.data import (DataLoader, DevicePrefetcher, ImageList,
                            synthetic_loader)
from tfnas_tpu.data.transforms import device_normalizer
from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import SuperNetwork
from tfnas_tpu.search.elasticity import rewrite_masks_by_l1, shrink_or_expand
from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                     get_op_and_depth_weights,
                                     parse_architecture)
from tfnas_tpu.search.train_step import (adam_init, cosine_lr_list,
                                         make_scanned_search_iter,
                                         make_search_steps,
                                         zeros_like_momentum)
from tfnas_tpu.utils import (AverageMeter, save_checkpoint_file,
                             setup_experiment, to_numpy_tree)

parser = argparse.ArgumentParser("searching TF-NAS (TPU)")
# various path
parser.add_argument('--img_root', type=str, default='',
                    help='image root path (ImageNet train set)')
parser.add_argument('--train_list', type=str,
                    default="./dataset/ImageNet-100-effb0_train_cls_ratio0.8.txt")
parser.add_argument('--val_list', type=str,
                    default="./dataset/ImageNet-100-effb0_val_cls_ratio0.8.txt")
parser.add_argument('--lookup_path', type=str,
                    default="./latency_pkl/latency_tpu.pkl")
parser.add_argument('--save', type=str, default='./checkpoints')
# training hyper-parameters (reference defaults, train_search.py:40-64)
parser.add_argument('--print_freq', type=int, default=100)
parser.add_argument('--workers', type=int, default=4)
parser.add_argument('--epochs', type=int, default=90)
parser.add_argument('--warmup_epochs', type=int, default=10,
                    help='weight-only epochs before arch steps')
parser.add_argument('--batch_size', type=int, default=32)
parser.add_argument('--w_lr', type=float, default=0.025)
parser.add_argument('--w_mom', type=float, default=0.9)
parser.add_argument('--w_wd', type=float, default=1e-5)
parser.add_argument('--a_lr', type=float, default=0.01)
parser.add_argument('--a_wd', type=float, default=5e-4)
parser.add_argument('--a_beta1', type=float, default=0.5)
parser.add_argument('--a_beta2', type=float, default=0.999)
parser.add_argument('--grad_clip', type=float, default=5.0)
parser.add_argument('--T', type=float, default=5.0)
parser.add_argument('--T_decay', type=float, default=0.96)
parser.add_argument('--num_classes', type=int, default=100)
# others
parser.add_argument('--seed', type=int, default=2)
parser.add_argument('--note', type=str, default='try')
# hyper parameters
parser.add_argument('--lambda_lat', type=float, default=0.1)
parser.add_argument('--target_lat', type=float, default=15.0)
parser.add_argument('--lat_under_boost', type=float, default=1.0,
                    help='asymmetric multiplier on the UNDER-target side of '
                         'the latency loss; 1.0 = the reference symmetric '
                         '|lat/target-1| form (see docs/E2E_PROXY30.md on '
                         'the soft-equilibrium ceiling)')
# TPU-native extras
parser.add_argument('--bf16', action='store_true', default=True)
parser.add_argument('--no_bf16', dest='bf16', action='store_false')
parser.add_argument('--space', type=str, default='mbconv',
                    choices=['mbconv', 'hybrid', 'tiny'],
                    help='candidate space: the 8-op reference MBConv space, '
                         'the 9-op hybrid conv/ViT space (attention '
                         'candidates at stages 4-6), or the 2-stage tiny '
                         'fixture space (seconds-scale pipeline smokes; '
                         'analytic LUT built in-process)')
parser.add_argument('--synthetic', action='store_true',
                    help='use synthetic data instead of ImageNet lists')
parser.add_argument('--resume', type=str, default='',
                    help='resume from a searched_model_NN.pkl checkpoint')
parser.add_argument('--save_freq', type=int, default=1,
                    help='save the full searched_model_NN.pkl every N '
                         'epochs (always after the last). 1 = reference '
                         'parity. The full checkpoint pulls ~376MB off '
                         'device; on a slow host link per-epoch saves can '
                         'dominate the epoch. A tiny arch_params_NN.pkl '
                         '(alphas/betas/masks) is saved EVERY epoch '
                         'regardless, so convergence analysis keeps its '
                         'per-epoch trajectory.')
parser.add_argument('--profile_steps', type=int, default=0,
                    help='capture a jax.profiler trace of the first N steps '
                         'of epoch 0 into <run_dir>/profile')
parser.add_argument('--steps_per_epoch', type=int, default=0)
parser.add_argument('--image_size', type=int, default=224)
parser.add_argument('--rrc_min_scale', type=float, default=0.08,
                    help='RandomResizedCrop minimum area fraction. 0.08 = '
                         'reference ImageNet setting; the compositional '
                         'proxy task needs ~0.35 (a tighter crop can land '
                         'entirely in the distractor-textured ground '
                         'region — see tools_proxy_learnability.py).')
parser.add_argument('--scan_units', type=int, default=1,
                    help='K>1: run the bi-level loop as ONE compiled '
                         'lax.scan over K units (2 bi-sampling weight steps '
                         '+ 1 soft arch step each) per dispatch, amortizing '
                         'host->device dispatch latency '
                         '(make_scanned_search_iter). 1 = per-step dispatch. '
                         'DEFAULT POLICY: 1 (reference-parity stepping; '
                         'chip-side cost is ~1% either way). On a high-RTT '
                         'tunneled host use 4 — every production recipe in '
                         'this repo (tools_e2e_*.sh) does.')


def main():
    from tfnas_tpu.utils.platform import honor_cpu_platform_request
    honor_cpu_platform_request()
    args = parser.parse_args()
    run_dir = setup_experiment(args.save, 'search', args.note)
    logging.info("args = %s", args)
    logging.info("jax devices: %s", jax.devices())

    hybrid = args.space == 'hybrid'
    tiny_sp = None
    if hybrid:
        from tfnas_tpu.models import hybrid_space as hs
        from tfnas_tpu.models.supernet_hybrid import HybridSuperNetwork
        mc_mask_dddict = hs.build_mc_mask_dddict()
        key_dddict = hs.build_lat_lookup_key_dddict()
        space_num_ops = hs.NUM_OPS
    elif args.space == 'tiny':
        tiny_sp = ss.tiny_space(args.image_size)
        mc_mask_dddict = tiny_sp.build_mc_mask_dddict()
        key_dddict = tiny_sp.build_lat_lookup_key_dddict()
        space_num_ops = tiny_sp.NUM_OPS
    else:
        mc_mask_dddict = ss.build_mc_mask_dddict()
        key_dddict = ss.lat_lookup_key_dddict
        space_num_ops = ss.NUM_OPS
    if tiny_sp is not None:
        # the shipped tables cover the reference space only; the tiny
        # fixture space gets a deterministic in-process analytic table
        from make_lat_lut_tpu import build_space_analytic_lut
        lat_lookup = build_space_analytic_lut(tiny_sp)
        logging.info('tiny space: analytic in-process LUT (%d keys)',
                     len(lat_lookup) - 1)
    else:
        lat_lookup = load_lat_lookup(args.lookup_path)
    if hybrid:
        missing = {key_dddict[st][b][hs.VIT_OP_IDX]
                   for st in key_dddict for b in key_dddict[st]
                   if hs.VIT_OP_IDX in key_dddict[st][b]} - set(lat_lookup)
        if missing:
            raise SystemExit(
                f"--space hybrid needs ViT entries in the LUT; missing "
                f"{sorted(missing)[:3]}... — regenerate with "
                f"make_lat_lut_tpu.py --space hybrid")
    mc_maxnum_dddict = get_mc_num_dddict(mc_mask_dddict, is_max=True)

    # log the achievable latency range of this table so target_lat can be
    # chosen sensibly (tables differ in scale: measured-TPU entries are
    # microseconds-scale vs the reference GPU table's milliseconds)
    lv = np.asarray(lat_vectors_for_mc(
        lat_lookup, get_mc_num_dddict(mc_mask_dddict, is_max=True),
        key_dddict, space_num_ops))
    logging.info(
        "LUT '%s': base %.4f ms; full-depth max-width arch in "
        "[%.4f, %.4f] ms depending on ops; --target_lat %.4f",
        args.lookup_path, lat_lookup["base"],
        lat_lookup["base"] + lv.min(1).sum(),
        lat_lookup["base"] + lv.max(1).sum(), args.target_lat)

    net = (HybridSuperNetwork(args.num_classes) if hybrid
           else SuperNetwork(args.num_classes, space=tiny_sp))
    key = jax.random.PRNGKey(args.seed)
    key, init_key = jax.random.split(key)
    # one compiled program instead of ~200 individually-dispatched inits
    # (each dispatch pays a remote-compile/round-trip on a tunneled link)
    params, arch_params = jax.jit(net.init)(init_key)

    start_epoch = 0
    if args.resume:
        from tfnas_tpu.utils import load_checkpoint
        logging.info('resuming from %s', args.resume)
        ckpt = load_checkpoint(args.resume)
        params = jax.tree_util.tree_map(jnp.asarray, ckpt['params'])
        arch_params = jax.tree_util.tree_map(jnp.asarray,
                                             ckpt['arch_params'])
        mc_mask_dddict = ckpt['mc_mask_dddict']
        start_epoch = int(ckpt['epoch'])
        args.T = float(ckpt['T'])
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    logging.info("param size = %fMB", n_params / 1e6)

    step_kwargs = dict(
        num_classes=args.num_classes, w_mom=args.w_mom, w_wd=args.w_wd,
        a_lr=args.a_lr, a_beta1=args.a_beta1, a_beta2=args.a_beta2,
        a_wd=args.a_wd, grad_clip=args.grad_clip,
        lambda_lat=args.lambda_lat, target_lat=args.target_lat,
        lat_under_boost=args.lat_under_boost,
        valid_mask=net.valid_mask if hybrid else None)
    steps = make_search_steps(net, **step_kwargs)

    @jax.jit
    def _acc_w(acc, m):
        return acc + jnp.zeros((7,), jnp.float32) \
            .at[0].set(m["loss"]).at[1].set(m["top1"]) \
            .at[2].set(m["top5"]).at[5].set(1.0)

    @jax.jit
    def _acc_a(acc, ma):
        return acc + jnp.zeros((7,), jnp.float32) \
            .at[3].set(ma["loss_a"]).at[4].set(ma["loss_l"]).at[6].set(1.0)

    @jax.jit
    def _acc_val(acc, m, n):
        return acc + jnp.stack([m["top1"] * n, m["top5"] * n, n])

    @jax.jit
    def _acc_scan(acc, wmet, amet):
        return acc + jnp.zeros((7,), jnp.float32) \
            .at[0].set(jnp.sum(wmet["loss"])) \
            .at[1].set(jnp.sum(wmet["top1"])) \
            .at[2].set(jnp.sum(wmet["top5"])) \
            .at[3].set(jnp.sum(amet["loss_a"])) \
            .at[4].set(jnp.sum(amet["loss_l"])) \
            .at[5].set(wmet["loss"].size).at[6].set(amet["loss_a"].size)
    scan_run = (make_scanned_search_iter(net, arch_every=2, **step_kwargs)
                if args.scan_units > 1 else None)
    lr_list = cosine_lr_list(args.w_lr, args.epochs)

    # save initial checkpoint (searched_model_00, train_search.py:98-103).
    # The save pipeline: snapshot params on DEVICE (cheap HBM copy), then a
    # background thread pulls + pickles while training continues — a 94M-
    # param pull through the tunneled device link takes minutes and would
    # otherwise stall every epoch boundary.
    import copy as _copy
    import threading as _threading
    save_state = {"thread": None}
    # ONE jitted copy program (the train steps donate their param buffers,
    # so the snapshot must be a real copy; per-leaf jnp.copy would be ~200
    # separate remote compiles)
    _snap = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    def save_arch_only(epoch, T):
        """Tiny per-epoch checkpoint: alphas/betas + masks (KBs, one cheap
        pull) — enough for parse_architecture and entropy trajectories."""
        with open(f"{run_dir}/arch_params_{epoch:02d}.pkl", "wb") as f:
            import pickle
            pickle.dump({
                "arch_params": to_numpy_tree(arch_params),
                "mc_mask_dddict": {
                    st: {b: {o: np.asarray(m) for o, m in d.items()}
                         for b, d in sd.items()}
                    for st, sd in mc_mask_dddict.items()},
                "epoch": epoch,
                "T": T,
            }, f)

    def save_epoch(epoch, T, final=False):
        save_arch_only(epoch, T)
        if args.save_freq > 1 and not final and epoch % args.save_freq:
            return None
        path = f"{run_dir}/searched_model_{epoch:02d}.pkl"
        if save_state["thread"] is not None:
            save_state["thread"].join()
        snap_p = _snap(params)
        snap_a = _snap(arch_params)
        snap_m = _copy.deepcopy(mc_mask_dddict)

        def work():
            save_checkpoint_file({
                "params": to_numpy_tree(snap_p),
                "arch_params": to_numpy_tree(snap_a),
                "mc_mask_dddict": snap_m,
                "epoch": epoch,
                "T": T,
            }, path)

        t = _threading.Thread(target=work, daemon=False)
        t.start()
        save_state["thread"] = t
        return path

    if not args.resume:  # resumed runs already have their lineage on disk
        save_epoch(0, args.T)

    # data
    def make_loaders():
        if args.synthetic:
            spe = args.steps_per_epoch or 100
            val = lambda ep: synthetic_loader(
                args.batch_size, max(spe // 4, 1), args.num_classes,
                args.image_size, seed=10_000 + ep)
            return (lambda ep: synthetic_loader(
                        args.batch_size, spe, args.num_classes,
                        args.image_size, seed=ep),
                    val, val)
        train_ds = ImageList(args.img_root, args.train_list, training=True,
                             image_size=args.image_size, output="uint8",
                             rrc_scale=(args.rrc_min_scale, 1.0))
        val_ds = ImageList(args.img_root, args.val_list, training=False,
                           image_size=args.image_size, output="uint8")
        tl = DataLoader(train_ds, args.batch_size, shuffle=True,
                        num_workers=args.workers, seed=args.seed)
        # arch-step batches: shuffled, drop_last (static shapes, sampled
        # endlessly); final validation: padded full set so every sample is
        # scored exactly once (reference train_search.py:435-462)
        vl = DataLoader(val_ds, args.batch_size, shuffle=True,
                        num_workers=args.workers, seed=args.seed + 1)
        fvl = DataLoader(val_ds, args.batch_size, shuffle=False,
                         num_workers=args.workers, seed=args.seed + 1,
                         drop_last=False, pad_last=True)

        def train_iter(ep):
            tl.set_epoch(ep)
            it = iter(tl)
            if args.steps_per_epoch:
                import itertools
                return itertools.islice(it, args.steps_per_epoch)
            return it

        def val_iter(ep):
            vl.set_epoch(ep)
            return iter(vl)

        def full_val_iter(ep):
            return iter(fvl)
        return train_iter, val_iter, full_val_iter

    train_iter, val_iter, full_val_iter = make_loaders()
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    # uint8 batches are normalized on device (4x less H2D traffic — the
    # tunneled-link step bottleneck); float batches (synthetic) just cast
    prep = device_normalizer(compute_dtype)

    T = args.T
    total_start = time.time()
    for epoch in range(start_epoch, args.epochs):
        mc_num_dddict = get_mc_num_dddict(mc_mask_dddict)
        masks = net.device_masks(mc_mask_dddict)
        update_masks = net.update_masks(params, mc_mask_dddict)
        lat_vec = jnp.asarray(lat_vectors_for_mc(
            lat_lookup, mc_num_dddict, key_dddict, space_num_ops))
        base_lat = jnp.float32(lat_lookup["base"])

        # fresh optimizers every epoch (train_search.py:196-206)
        mom = zeros_like_momentum(params)
        opt_a = adam_init(arch_params)
        lr = jnp.float32(lr_list[epoch])
        logging.info('Epoch: %d lr: %e T: %e', epoch, float(lr), T)

        # Metrics accumulate ON DEVICE in one [7] vector
        # [loss, top1, top5, loss_a, loss_l sums; weight-step count;
        # arch-step count] and are pulled in ONE transfer per log line:
        # on a tunneled device link every distinct device->host pull costs
        # a full round trip (~150 ms measured), so per-step (or even
        # deferred per-scalar) pulls would dominate the step time.
        macc = jnp.zeros((7,), jnp.float32)

        def mavg(a):
            nw, na = max(a[5], 1.0), max(a[6], 1.0)
            return {"loss": a[0] / nw, "top1": a[1] / nw, "top5": a[2] / nw,
                    "loss_a": a[3] / na, "loss_l": a[4] / na}

        epoch_start = time.time()
        use_scan = scan_run is not None and epoch >= args.warmup_epochs
        if use_scan:
            # -- scanned macro-iteration: K units of (2 weight steps + 1
            # arch step) per compiled dispatch (make_scanned_search_iter;
            # the reference schedule train_search.py:357-432 in one scan) --
            K, AE = args.scan_units, 2
            key, ek = jax.random.split(key)

            def endless_arch():
                while True:
                    for b in val_iter(epoch):
                        yield b
            arch_cycle = endless_arch()
            train_it = iter(train_iter(epoch))
            step0, buf = 0, []
            while True:
                batch = next(train_it, None)
                if batch is not None:
                    buf.append(batch)
                    if len(buf) < K * AE:
                        continue
                    # full group: one scanned dispatch
                    bshape = buf[0][0].shape
                    xw = prep(jnp.asarray(np.stack([b[0] for b in buf])
                                          .reshape(K, AE, *bshape)))
                    yw = jnp.asarray(np.stack([b[1] for b in buf]).reshape(
                        K, AE, -1))
                    pairs = [next(arch_cycle) for _ in range(K)]
                    xa = prep(jnp.asarray(np.stack([p[0] for p in pairs])))
                    ya = jnp.asarray(np.stack([p[1] for p in pairs]))
                    params, mom, arch_params, opt_a, wmet, amet = scan_run(
                        params, mom, arch_params, opt_a, masks, update_masks,
                        xw, yw, xa, ya, lr, jnp.float32(T), lat_vec,
                        base_lat, jnp.int32(step0), ek)
                    macc = _acc_scan(macc, wmet, amet)
                    buf = []
                    if (step0 // (K * AE)) % max(
                            args.print_freq // (K * AE), 1) == 0:
                        avg = mavg(np.asarray(macc))
                        logging.info(
                            'TRAIN w_Arch(scan) Step: %04d Objs: %f R1: %f '
                            'R5: %f Objs_A: %f Objs_L: %f', step0,
                            avg["loss"], avg["top1"], avg["top5"],
                            avg["loss_a"], avg["loss_l"])
                    step0 += K * AE
                    continue
                # tail: fewer than K*AE batches left — per-step dispatch,
                # same schedule (arch step every 2nd weight step)
                for j, (x, y) in enumerate(buf):
                    x = prep(jnp.asarray(x))
                    y = jnp.asarray(y)
                    key, k1 = jax.random.split(key)
                    params, mom, m = steps.weight_step(
                        params, arch_params, mom, masks, update_masks,
                        x, y, lr, k1)
                    macc = _acc_w(macc, m)
                    if (step0 + j) % 2 == 0:
                        xa, ya = next(arch_cycle)
                        key, k2 = jax.random.split(key)
                        arch_params, opt_a, ma = steps.arch_step(
                            params, arch_params, opt_a, masks,
                            prep(jnp.asarray(xa)),
                            jnp.asarray(ya), lat_vec, base_lat,
                            jnp.float32(T), k2)
                        macc = _acc_a(macc, ma)
                break
        # double-buffered host->device transfer: the prefetcher issues
        # device_put `depth` batches ahead so H2D overlaps TPU compute (the
        # pin_memory/non_blocking equivalent, ref train_search.py:331-332)
        arch_batches = iter(DevicePrefetcher(val_iter(epoch), depth=2)) \
            if epoch >= args.warmup_epochs and not use_scan else None
        nsteps = 0
        profiling = (args.profile_steps > 0 and epoch == start_epoch
                     and not use_scan)
        if profiling:
            jax.profiler.start_trace(f"{run_dir}/profile")
        import os as _os
        timing = _os.environ.get("TFNAS_STEP_TIMING", "") == "1"

        def _timed(it):
            t_prev = time.perf_counter()
            for item in it:
                t_fetch = time.perf_counter()
                yield item
                t_done = time.perf_counter()
                logging.info("timing: fetch %.0fms dispatch %.0fms",
                             (t_fetch - t_prev) * 1000,
                             (t_done - t_fetch) * 1000)
                t_prev = t_done

        _train_it = (DevicePrefetcher(train_iter(epoch), depth=2)
                     if not use_scan else iter(()))
        if timing and not use_scan:
            _train_it = _timed(_train_it)
        for step, (x, y) in enumerate(_train_it):
            if profiling and step == args.profile_steps:
                force(m["loss"])  # relay: a pull, not block_until_ready
                jax.profiler.stop_trace()
                profiling = False
                logging.info('profiler trace written to %s/profile', run_dir)
            x = prep(x)       # on-device normalize+cast (x is device-resident)
            y = jnp.asarray(y)
            key, k1 = jax.random.split(key)
            if epoch < args.warmup_epochs:
                params, mom, m = steps.warmup_step(
                    params, arch_params, mom, masks, update_masks, x, y,
                    lr, k1)
            else:
                params, mom, m = steps.weight_step(
                    params, arch_params, mom, masks, update_masks, x, y,
                    lr, k1)
                if step % 2 == 0:
                    try:
                        xa, ya = next(arch_batches)
                    except StopIteration:
                        arch_batches = iter(DevicePrefetcher(val_iter(epoch),
                                                             depth=2))
                        xa, ya = next(arch_batches)
                    key, k2 = jax.random.split(key)
                    arch_params, opt_a, ma = steps.arch_step(
                        params, arch_params, opt_a, masks,
                        prep(xa), jnp.asarray(ya),
                        lat_vec, base_lat, jnp.float32(T), k2)
                    macc = _acc_a(macc, ma)
            macc = _acc_w(macc, m)
            nsteps += 1
            if step % args.print_freq == 0:
                avg = mavg(np.asarray(macc))  # ONE device->host pull
                logging.info(
                    'TRAIN%s Step: %04d Objs: %f R1: %f R5: %f Objs_A: %f Objs_L: %f',
                    ' wo_Arch' if epoch < args.warmup_epochs else ' w_Arch',
                    step, avg["loss"], avg["top1"], avg["top5"],
                    avg["loss_a"], avg["loss_l"])

        if profiling:
            force(m["loss"])
            jax.profiler.stop_trace()
            logging.info('profiler trace written to %s/profile', run_dir)
        epoch_avg = mavg(np.asarray(macc))
        if epoch >= args.warmup_epochs:
            T *= args.T_decay

        # log arch parameters (train_search.py:216-224)
        logging.info('The current arch parameters are:')
        for row in np.exp(np.asarray(arch_params["log_alphas"])):
            logging.info(' '.join(f'{p:.6f}' for p in row))
        for stage in net.ss.STAGE_NAMES:
            b = np.asarray(arch_params["betas"][stage])
            sm = np.exp(b - b.max());  sm = sm / sm.sum()
            logging.info(' '.join(f'{p:.6f}' for p in sm))
        logging.info('Train_acc %f', epoch_avg["top1"])
        logging.info('Epoch time: %ds', time.time() - epoch_start)

        # validation for last 5 epochs: padded full set, every sample scored
        # once (train_search.py:229-232,435-462)
        if args.epochs - epoch < 5:
            # accumulate [top1*n, top5*n, n] on device; ONE pull at the end
            # (each distinct device->host pull costs a full relay RTT)
            vacc = jnp.zeros((3,), jnp.float32)
            for batch in full_val_iter(epoch):
                x, y = batch[0], batch[1]
                n_valid = batch[2] if len(batch) > 2 else len(y)
                wmask = np.zeros((len(y),), np.float32)
                wmask[:n_valid] = 1.0
                key, kv = jax.random.split(key)
                m = steps.val_step(params, arch_params, masks,
                                   prep(jnp.asarray(x)),
                                   jnp.asarray(y), kv, jnp.asarray(wmask))
                vacc = _acc_val(vacc, m, jnp.float32(n_valid))
            va = np.asarray(vacc)
            logging.info('Val_acc %f', va[0] / max(va[2], 1.0))
            logging.info('Val_acc_top5 %f', va[1] / max(va[2], 1.0))

        # shrink / expand (train_search.py:261-307)
        if epoch >= args.warmup_epochs:
            logging.info('Now shrinking or expanding the arch')
            op_weights, depth_weights = get_op_and_depth_weights(
                {"arch_params": to_numpy_tree(arch_params)})
            parsed_arch = parse_architecture(op_weights, depth_weights,
                                             space=net.ss)
            mc_num_dddict = get_mc_num_dddict(mc_mask_dddict)
            mc_num_dddict, before_lat, after_lat = shrink_or_expand(
                parsed_arch, mc_num_dddict, mc_maxnum_dddict,
                key_dddict, lat_lookup, args.target_lat,
                log=logging.info)
            logging.info(
                'Before, the current lat: %.4f, the target lat: %.4f',
                before_lat, args.target_lat)
            # pass the device tree: rewrite_masks_by_l1 np.asarray's only the
            # parsed blocks' depthwise kernels (avoids pulling all ~94M
            # params to host every epoch)
            mc_mask_dddict = rewrite_masks_by_l1(
                parsed_arch, mc_num_dddict, mc_mask_dddict, params)
            logging.info(
                'After, the current lat: %.4f, the target lat: %.4f',
                after_lat, args.target_lat)

        save_epoch(epoch + 1, T, final=(epoch + 1 == args.epochs))

    if save_state["thread"] is not None:
        save_state["thread"].join()
    logging.info('Total searching time: %ds', time.time() - total_start)


if __name__ == '__main__':
    main()
