#!/usr/bin/env python
"""Parse a searched checkpoint into a deployable model.config.

CLI contract matches the reference parsing_model.py:91-134: load the search
checkpoint, argmax ops/depths, dump model.config JSON, report params/FLOPs,
optionally the LUT latency and measured device latency.

The importable functions (get_op_and_depth_weights / parse_architecture /
get_mc_num_dddict) live in tfnas_tpu.search.parser and are re-exported here
for reference-parity imports.
"""

import argparse
import json

from tfnas_tpu.cost import (calculate_FLOPs_in_M, count_parameters_in_MB,
                            load_lat_lookup)
from tfnas_tpu.cost.measure import measure_model_latency_in_ms
from tfnas_tpu.models.eval_net import EvalNetwork
from tfnas_tpu.search.parser import (get_mc_num_dddict,  # noqa: F401
                                     get_op_and_depth_weights,
                                     parse_architecture)
from tfnas_tpu.utils import load_checkpoint

__all__ = ["get_op_and_depth_weights", "parse_architecture",
           "get_mc_num_dddict"]


def main():
    from tfnas_tpu.utils.platform import honor_cpu_platform_request
    honor_cpu_platform_request()
    parser = argparse.ArgumentParser("parsing TF-NAS (TPU)")
    parser.add_argument('--model_path', type=str, required=True,
                        help='path of searched model checkpoint')
    parser.add_argument('--save_path', type=str, default='./model.config',
                        help='saving path of parsed architecture config')
    parser.add_argument('--lookup_path', type=str,
                        default='./latency_pkl/latency_tpu.pkl',
                        help='path of latency lookup')
    parser.add_argument('--print_lat', action='store_true',
                        help='measure and print the latency')
    parser.add_argument('--num_classes', type=int, default=1000)
    parser.add_argument('--space', type=str, default='mbconv',
                        choices=['mbconv', 'hybrid', 'tiny'],
                        help='search space the checkpoint came from (hybrid '
                             'shares the reference skeleton; tiny is the '
                             '2-stage fixture space)')
    parser.add_argument('--image_size', type=int, default=224,
                        help='input resolution for the FLOPs report')
    args = parser.parse_args()

    # 'hybrid' intentionally maps to space=None: it shares the reference
    # macro skeleton, and EvalNetwork.from_parsed_arch dispatches ViT
    # candidates purely by op_idx >= NUM_OPS in the parsed arch — the flag
    # value only documents provenance (and gates nothing here, unlike in
    # train_search.py where it selects the supernet class).
    space = None
    if args.space == 'tiny':
        from tfnas_tpu.models import search_space as ss
        space = ss.tiny_space(args.image_size)

    op_weights, depth_weights = get_op_and_depth_weights(args.model_path)
    parsed_arch = parse_architecture(op_weights, depth_weights, space=space)
    if args.space == 'tiny':
        from make_lat_lut_tpu import build_space_analytic_lut
        lat_lookup = build_space_analytic_lut(space)
    else:
        lat_lookup = load_lat_lookup(args.lookup_path)
    mc_mask_dddict = load_checkpoint(args.model_path)['mc_mask_dddict']
    mc_num_dddict = get_mc_num_dddict(mc_mask_dddict)
    model = EvalNetwork.from_parsed_arch(args.num_classes, parsed_arch,
                                         mc_num_dddict, space=space)

    config = model.config
    with open(args.save_path, 'w') as f:
        json.dump(config, f, indent=4)

    import jax
    params, _ = model.init(jax.random.PRNGKey(0))
    print('Params:  \t{:.4f}MB'.format(count_parameters_in_MB(params)))
    print('FLOPs:  \t{:.4f}M'.format(
        calculate_FLOPs_in_M(model, args.image_size)))

    if args.print_lat:
        lat_lut = model.get_lookup_latency(lat_lookup,
                                           input_size=args.image_size)
        print('Lat_LUT:\t{:.4f}ms'.format(lat_lut))
        lat = measure_model_latency_in_ms(model, 32)
        print('Lat_TPU bs=32:\t{:.4f}ms'.format(lat))
        lat = measure_model_latency_in_ms(model, 1)
        print('Lat_TPU bs=1:\t{:.4f}ms'.format(lat))


if __name__ == '__main__':
    main()
