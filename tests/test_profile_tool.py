"""tools_profile_eval: per-segment FLOPs accounting stays consistent.

The profiler's segment_flops walk must sum to the canonical whole-network
counter (cost/flops.py calculate_FLOPs_in_M, which reproduces the
reference's forward-hook totals, tools/flops_benchmark.py:9-134) — a drift
between the two would silently corrupt the README MFU breakdown table.
"""

import importlib.util
import json
import pathlib

import jax
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location(
    "tools_profile_eval", REPO / "tools_profile_eval.py")
tpe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tpe)

from tfnas_tpu.cost.flops import calculate_FLOPs_in_M  # noqa: E402
from tfnas_tpu.models.eval_net import EvalNetwork  # noqa: E402


def _load_net(cfg_path, num_classes):
    with open(cfg_path) as f:
        cfg = json.load(f)
    return EvalNetwork.from_config(num_classes, cfg)


@pytest.mark.parametrize("cfg,ncls,size", [
    ("checkpoints_e2e/pareto-tiny/"
     "pareto-search-20260819-205815-pareto-tiny/model_g0.config", 10, 32),
    ("checkpoints_e2e/proxy30-e2e-family-a/"
     "search-20260819-192932-proxy30-e2e-family-a/model.config", 30, 224),
])
def test_segment_flops_sums_to_network_total(cfg, ncls, size):
    net = _load_net(REPO / cfg, ncls)
    segs = tpe.segment_flops(net, size)
    total_m = sum(f for _, f in segs)
    assert total_m == pytest.approx(calculate_FLOPs_in_M(net, size),
                                    rel=1e-9)
    # stems are split so the 3-channel first conv is its own segment
    assert segs[0][0] == "first_stem" and segs[1][0] == "second_stem"
    assert segs[-1][0] == "head"
    assert len(segs) == 2 + len(net.stages) + 1


def test_prefix_apply_shapes_cover_every_segment():
    """Every prefix program runs and deepens monotonically (CPU, tiny)."""
    net = _load_net(
        REPO / "checkpoints_e2e/pareto-tiny/"
               "pareto-search-20260819-205815-pareto-tiny/model_g0.config",
        10)
    from tfnas_tpu.models.folding import fold_batchnorm
    params, state = net.init(jax.random.PRNGKey(0))
    net, params = fold_batchnorm(net, params, state)  # as the tool does
    import jax.numpy as jnp
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    n_seg = 2 + len(net.stages) + 1
    shapes = []
    for upto in range(n_seg + 1):
        y = tpe.prefix_apply(net, upto)(params, x)
        shapes.append(y.shape)
    assert shapes[0] == ()          # dispatch-floor program
    assert shapes[-1] == (2, 10)    # classifier logits
    # spatial resolution never increases with depth
    res = [s[1] for s in shapes[1:-1]]
    assert all(a >= b for a, b in zip(res, res[1:]))
