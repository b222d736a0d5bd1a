#!/usr/bin/env python
"""Multi-target-latency Pareto search: G independent TF-NAS searches (one
per --target_lats point) sharded over one device mesh.

This is the pod-scale search mode (BASELINE config 5) the reference cannot
express (one search per GPU, train_search.py:79-95): group state carries a
leading [G] dim sharded over the mesh 'pareto' axis; within each group the
batch is data-parallel over 'data'. Per-epoch elasticity runs per group in
Python over each group's own masks; each group emits its own
searched_model checkpoints + model.config on completion.

Example (8 devices, 4 targets, 2-way data parallel per group):
    python train_search_pareto.py --synthetic \
        --target_lats 0.6,0.8,1.0,1.2 --epochs 90
"""

import argparse
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from tfnas_tpu.cost.lut import lat_vectors_for_mc, load_lat_lookup
from tfnas_tpu.data import synthetic_loader, DataLoader, ImageList
from tfnas_tpu.models import search_space as ss
from tfnas_tpu.models.supernet import SuperNetwork
from tfnas_tpu.parallel.mesh import (host_shard, is_main_process,
                                     make_mesh, maybe_distributed_init,
                                     put_global_batch, put_host_replicated)
from tfnas_tpu.parallel.pareto import (init_pareto_state,
                                       make_pareto_search_steps,
                                       reset_group_optimizers,
                                       stack_group_trees)
from tfnas_tpu.search.elasticity import rewrite_masks_by_l1, shrink_or_expand
from tfnas_tpu.search.parser import (get_mc_num_dddict,
                                     get_op_and_depth_weights,
                                     parse_architecture)
from tfnas_tpu.search.train_step import cosine_lr_list
from tfnas_tpu.utils import save_checkpoint_file, setup_experiment, to_numpy_tree

parser = argparse.ArgumentParser("pareto searching TF-NAS (TPU)")
parser.add_argument('--img_root', type=str, default='')
parser.add_argument('--train_list', type=str,
                    default="./dataset/ImageNet-100-effb0_train_cls_ratio0.8.txt")
parser.add_argument('--val_list', type=str,
                    default="./dataset/ImageNet-100-effb0_val_cls_ratio0.8.txt")
parser.add_argument('--lookup_path', type=str,
                    default="./latency_pkl/latency_tpu.pkl")
parser.add_argument('--save', type=str, default='./checkpoints')
parser.add_argument('--target_lats', type=str, default='0.6,0.8,1.0,1.2',
                    help='comma-separated target latencies, one search each')
parser.add_argument('--epochs', type=int, default=90)
parser.add_argument('--warmup_epochs', type=int, default=10)
parser.add_argument('--batch_size', type=int, default=32,
                    help='per-group batch size')
parser.add_argument('--w_lr', type=float, default=0.025)
parser.add_argument('--w_mom', type=float, default=0.9)
parser.add_argument('--w_wd', type=float, default=1e-5)
parser.add_argument('--a_lr', type=float, default=0.01)
parser.add_argument('--a_wd', type=float, default=5e-4)
parser.add_argument('--grad_clip', type=float, default=5.0)
parser.add_argument('--T', type=float, default=5.0)
parser.add_argument('--T_decay', type=float, default=0.96)
parser.add_argument('--num_classes', type=int, default=100)
parser.add_argument('--lambda_lat', type=float, default=0.1)
parser.add_argument('--seed', type=int, default=2)
parser.add_argument('--note', type=str, default='pareto')
parser.add_argument('--print_freq', type=int, default=100)
parser.add_argument('--workers', type=int, default=4)
parser.add_argument('--bf16', action='store_true', default=True)
parser.add_argument('--no_bf16', dest='bf16', action='store_false')
parser.add_argument('--space', type=str, default='mbconv',
                    choices=['mbconv', 'hybrid', 'tiny'])
parser.add_argument('--resume', type=str, default='',
                    help='resume: comma-separated per-group '
                         'searched_model_g{g}_{NN}.pkl paths (same order '
                         'as --target_lats), or one path pattern with {g}')
parser.add_argument('--synthetic', action='store_true')
parser.add_argument('--steps_per_epoch', type=int, default=0)
parser.add_argument('--image_size', type=int, default=224)


def main():
    from tfnas_tpu.utils.platform import honor_cpu_platform_request
    honor_cpu_platform_request()
    args = parser.parse_args()
    proc_idx, proc_cnt = maybe_distributed_init()
    if is_main_process():
        run_dir = setup_experiment(args.save, 'pareto-search', args.note)
    else:
        logging.basicConfig(level=logging.INFO, force=True,
                            format=f"[host {proc_idx}] %(message)s")
        run_dir = None
    logging.info("args = %s", args)

    targets = [float(t) for t in args.target_lats.split(',')]
    G = len(targets)
    n_dev = len(jax.devices())
    assert n_dev % G == 0, (
        f"{G} pareto groups must divide {n_dev} devices")
    mesh = make_mesh(n_dev, pareto_groups=G)
    logging.info("mesh: %s, targets: %s", mesh, targets)

    hybrid = args.space == 'hybrid'
    tiny_sp = None
    if hybrid:
        from tfnas_tpu.models import hybrid_space as hs
        from tfnas_tpu.models.supernet_hybrid import HybridSuperNetwork
        build_masks, key_dddict, space_num_ops = (
            hs.build_mc_mask_dddict, hs.build_lat_lookup_key_dddict(),
            hs.NUM_OPS)
    elif args.space == 'tiny':
        tiny_sp = ss.tiny_space(args.image_size)
        build_masks, key_dddict, space_num_ops = (
            tiny_sp.build_mc_mask_dddict,
            tiny_sp.build_lat_lookup_key_dddict(), tiny_sp.NUM_OPS)
    else:
        build_masks, key_dddict, space_num_ops = (
            ss.build_mc_mask_dddict, ss.lat_lookup_key_dddict, ss.NUM_OPS)
    if tiny_sp is not None:
        # as in train_search.py: the fixture space gets the deterministic
        # in-process analytic table (the shipped pickles cover the
        # reference space only)
        from make_lat_lut_tpu import build_space_analytic_lut
        lat_lookup = build_space_analytic_lut(tiny_sp)
    else:
        lat_lookup = load_lat_lookup(args.lookup_path)
    # per-group mask registries (elasticity diverges per target)
    group_masks = [build_masks() for _ in range(G)]
    mc_maxnum = get_mc_num_dddict(group_masks[0], is_max=True)

    # cross-replica BN over the in-group data axis keeps batch-stat BN
    # semantics identical to the reference's single-device batch
    bn_axis = 'data' if n_dev // G > 1 else None
    net = (HybridSuperNetwork(args.num_classes, bn_axis_name=bn_axis)
           if hybrid else
           SuperNetwork(args.num_classes, bn_axis_name=bn_axis,
                        space=tiny_sp))
    state = init_pareto_state(net, jax.random.PRNGKey(args.seed), G)
    start_epoch = 0
    if args.resume:
        from tfnas_tpu.utils import load_checkpoint
        paths = ([args.resume.format(g=g) for g in range(G)]
                 if '{g}' in args.resume else args.resume.split(','))
        assert len(paths) == G, f"need {G} resume paths, got {len(paths)}"
        ckpts = [load_checkpoint(pth) for pth in paths]
        state = state._replace(
            params=stack_group_trees([c['params'] for c in ckpts]),
            arch_params=stack_group_trees(
                [c['arch_params'] for c in ckpts]))
        group_masks = [c['mc_mask_dddict'] for c in ckpts]
        start_epoch = int(ckpts[0]['epoch'])
        T_resume = np.asarray([float(c['T']) for c in ckpts], np.float32)
        logging.info('resumed %d groups at epoch %d', G, start_epoch)
    weight_step, arch_step = make_pareto_search_steps(
        net, mesh, num_classes=args.num_classes, targets=targets,
        w_mom=args.w_mom, w_wd=args.w_wd, a_lr=args.a_lr, a_wd=args.a_wd,
        grad_clip=args.grad_clip, lambda_lat=args.lambda_lat,
        valid_mask=net.valid_mask if hybrid else None)
    lr_list = cosine_lr_list(args.w_lr, args.epochs)
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    from tfnas_tpu.data.transforms import device_normalizer
    prep = device_normalizer(compute_dtype)

    from jax.sharding import NamedSharding, PartitionSpec as P
    xsh = NamedSharding(mesh, P("pareto", "data"))
    gsh = NamedSharding(mesh, P("pareto"))

    # per-host share of each group's batch (multi-host launch)
    assert args.batch_size % proc_cnt == 0, (args.batch_size, proc_cnt)
    local_bs = args.batch_size // proc_cnt

    def batches(epoch, seed_base):
        if args.synthetic:
            spe = args.steps_per_epoch or 50
            its = [synthetic_loader(local_bs, spe, args.num_classes,
                                    args.image_size,
                                    seed=(seed_base + g, proc_idx))
                   for g in range(G)]
        else:
            ds = ImageList(args.img_root, args.train_list, training=True,
                           image_size=args.image_size, output="uint8",
                           host_shard=host_shard())
            dl = DataLoader(ds, local_bs * G, shuffle=True,
                            num_workers=args.workers, seed=seed_base)
            dl.set_epoch(epoch)

            def split(it):
                for x, y in it:
                    yield [(x[g::G], y[g::G]) for g in range(G)]
            its = None
            gen = split(iter(dl))
            if args.steps_per_epoch:
                import itertools
                gen = itertools.islice(gen, args.steps_per_epoch)
            for group_batches in gen:
                xs = np.stack([b[0] for b in group_batches])
                ys = np.stack([b[1] for b in group_batches])
                yield xs, ys
            return
        while True:
            try:
                pairs = [next(it) for it in its]
            except StopIteration:
                return
            yield (np.stack([p[0] for p in pairs]),
                   np.stack([p[1] for p in pairs]))

    key = jax.random.PRNGKey(args.seed + 1)
    T = (T_resume if args.resume else np.full((G,), args.T, np.float32))
    total_start = time.time()
    for epoch in range(start_epoch, args.epochs):
        group_mc_num = [get_mc_num_dddict(m) for m in group_masks]
        # group-stacked mask/latency trees (per-group elasticity diverges)
        masks = stack_group_trees(
            [net.device_masks(m) for m in group_masks])
        params_g0 = jax.tree_util.tree_map(lambda a: a[0], state.params)
        update_masks = stack_group_trees(
            [net.update_masks(params_g0, m) for m in group_masks])
        lat_vec = jnp.asarray(np.stack(
            [lat_vectors_for_mc(lat_lookup, mc, key_dddict, space_num_ops)
             for mc in group_mc_num]))
        base_lat = jnp.float32(lat_lookup["base"])
        state = reset_group_optimizers(state)
        lr = put_host_replicated(jnp.full((G,), lr_list[epoch],
                                          jnp.float32), gsh)

        meters = []
        for step, (xs, ys) in enumerate(batches(epoch, epoch * 1000)):
            x = put_global_batch(np.asarray(xs), xsh)
            y = put_global_batch(np.asarray(ys, np.int32), xsh)
            x = prep(x)  # on-device normalize (uint8) / cast
            key, k1 = jax.random.split(key)
            keys = put_host_replicated(jax.random.split(k1, G), gsh)
            state, m = weight_step(state, masks, update_masks, x, y, lr,
                                   keys)
            if epoch >= args.warmup_epochs and step % 2 == 0:
                key, k2 = jax.random.split(key)
                keys = put_host_replicated(jax.random.split(k2, G), gsh)
                state, ma = arch_step(
                    state, masks, x, y, lat_vec, base_lat,
                    put_host_replicated(jnp.asarray(T), gsh), keys)
            meters.append(m)
            if step % args.print_freq == 0:
                logging.info('TRAIN Step %04d loss %s', step,
                             np.asarray(m["loss"]).round(4).tolist())
        if epoch >= args.warmup_epochs:
            T *= args.T_decay

        # per-group elasticity + checkpoints
        host_state = to_numpy_tree(state)
        for g in range(G):
            arch_g = jax.tree_util.tree_map(lambda a: a[g],
                                            host_state.arch_params)
            op_w, depth_w = get_op_and_depth_weights(
                {"arch_params": arch_g})
            parsed = parse_architecture(op_w, depth_w, space=net.ss)
            if epoch >= args.warmup_epochs:
                mc_num, before, after = shrink_or_expand(
                    parsed, group_mc_num[g], mc_maxnum,
                    key_dddict, lat_lookup, targets[g])
                params_g = jax.tree_util.tree_map(lambda a: a[g],
                                                  host_state.params)
                group_masks[g] = rewrite_masks_by_l1(
                    parsed, mc_num, group_masks[g], params_g)
                logging.info('group %d (target %.3f): lat %.4f -> %.4f',
                             g, targets[g], before, after)
            if not is_main_process():
                continue
            save_checkpoint_file({
                "params": jax.tree_util.tree_map(lambda a: a[g],
                                                 host_state.params),
                "arch_params": arch_g,
                "mc_mask_dddict": group_masks[g],
                "epoch": epoch + 1,
                "T": float(T[g]),
                "target_lat": targets[g],
            }, f"{run_dir}/searched_model_g{g}_{epoch + 1:02d}.pkl")

    logging.info('Total pareto searching time: %ds',
                 time.time() - total_start)


if __name__ == '__main__':
    main()
