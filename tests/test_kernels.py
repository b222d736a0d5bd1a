"""Pallas kernel correctness vs the jnp reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfnas_tpu.kernels import fused_dw


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # CPU test backend: run the Pallas kernel in interpreter mode
    orig = fused_dw.pl.pallas_call
    monkeypatch.setattr(fused_dw.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    yield


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("act", ["relu", "swish"])
def test_fused_dw_matches_reference(stride, act):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 12, 12, 128
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((5, 5, c)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    offset = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    y, s, sq = fused_dw.fused_dw_norm_act(x, ker, scale, offset, stride, act)
    yr, sr, sqr = fused_dw._reference(x, ker, scale, offset, stride=stride,
                                      act=act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(sr), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sqr), rtol=1e-3)


@pytest.mark.parametrize("stride", [1, 2])
def test_fused_dw_gradients_match_reference(stride):
    """All four input grads (incl. scale/offset, exercising the hand-written
    elementwise + linear_transpose backward) vs jax.vjp of the reference."""
    rng = np.random.default_rng(1)
    n, h, w, c = 1, 8, 8, 128
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((5, 5, c)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    offset = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    def loss_fused(x, ker, scale, offset):
        y, s, sq = fused_dw.fused_dw_norm_act(x, ker, scale, offset, stride,
                                              "swish")
        return jnp.sum(y * y) + jnp.sum(s) + jnp.sum(sq) * 0.1

    def loss_ref(x, ker, scale, offset):
        y, s, sq = fused_dw._reference(x, ker, scale, offset, stride=stride,
                                       act="swish")
        return jnp.sum(y * y) + jnp.sum(s) + jnp.sum(sq) * 0.1

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, ker, scale, offset)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, ker, scale, offset)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_fused_dw_bf16_gradients_match_reference():
    """bf16 activations (the production dtype): the hand-written backward
    must mirror the reference's cast placement bit-for-bit in structure."""
    rng = np.random.default_rng(3)
    n, h, w, c = 2, 8, 8, 128
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32
                    ).astype(jnp.bfloat16)
    ker = jnp.asarray(rng.standard_normal((5, 5, c)) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32)
    offset = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)

    def mk(fn, stride):
        def loss(ker, scale, offset):
            y, s, sq = fn(x, ker, scale, offset, stride, "swish")
            return (jnp.sum(y.astype(jnp.float32) ** 2)
                    + jnp.sum(s) + jnp.sum(sq) * 0.1)
        return loss

    ref = lambda x, k, sc, of, st, a: fused_dw._reference(
        x, k, sc, of, stride=st, act=a)
    for stride in (1, 2):
        g1 = jax.grad(mk(fused_dw.fused_dw_norm_act, stride),
                      argnums=(0, 1, 2))(ker, scale, offset)
        g2 = jax.grad(mk(ref, stride), argnums=(0, 1, 2))(ker, scale, offset)
        # bf16 tolerance: the Pallas forward and the XLA conv round the
        # bf16 y differently (accumulation order), which feeds the stats
        # pullback; the f32 tests above pin the math exactly. This guards
        # dtype-flow blunders (e.g. bf16 accumulation), not ulp parity.
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=0.5)


def test_fold_bn_mask():
    mean = jnp.asarray([1.0, 2.0])
    var = jnp.asarray([4.0, 0.0])
    mask = jnp.asarray([1.0, 0.0])
    scale, offset = fused_dw.fold_bn_mask(mean, var, mask)
    x = jnp.asarray([[3.0, 5.0]])
    got = x * scale + offset
    want = mask * (x - mean) * jax.lax.rsqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_supernet_block_with_pallas_matches_xla_path(stride):
    """_dw_middle: Pallas-fused path == XLA path inside a real supernet
    block (interpret mode), both the stride-1 and space-to-depth sites."""
    import jax
    from tfnas_tpu.models import search_space as ss
    from tfnas_tpu.models.supernet import BlockSite, SuperNetwork

    site = BlockSite("stage2", "block2", 4, 40, 40, stride, "swish")
    net_x = SuperNetwork(10, use_pallas=False)
    net_p = SuperNetwork(10, use_pallas=True)
    p = net_x._init_block(jax.random.PRNGKey(0), site)
    masks = np.zeros((ss.NUM_OPS, site.width), np.float32)
    for o in range(ss.NUM_OPS):
        masks[o, :site.ic * ss.OP_EXPAND[o]] = 1.0
    masks = jnp.asarray(masks)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, site.ic))
    w = jnp.ones((8,)) / 8

    y_x = net_x._block_soft(site, p, masks, w, x, training=True)
    y_p = net_p._block_soft(site, p, masks, w, x, training=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=2e-4,
                               atol=2e-4)
