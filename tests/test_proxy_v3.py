"""v3 proxy generator invariants (dataset/make_proxy_dataset.py --version 3):
deterministic rendering, valid label decomposition, duty-variant partner
map, and the duty-cycle separation that carries the capacity signal."""

import numpy as np

from dataset.make_proxy_dataset import (N_COARSE_V3, N_FINE_V3, V3_PARTNER,
                                        fine_field_v3, render_example_v3)


def test_partner_map_is_involution_within_family():
    for k in range(N_FINE_V3):
        p = V3_PARTNER[k]
        assert p != k and V3_PARTNER[p] == k
        assert p // 2 == k // 2  # same shape family


def test_render_deterministic_uint8():
    a = render_example_v3(17, np.random.default_rng((1, 17, 0, 3)), 128)
    b = render_example_v3(17, np.random.default_rng((1, 17, 0, 3)), 128)
    assert a.dtype == np.uint8 and a.shape == (128, 128, 3)
    np.testing.assert_array_equal(a, b)


def test_all_labels_render():
    for label in range(0, N_FINE_V3 * N_COARSE_V3, 7):
        img = render_example_v3(label, np.random.default_rng((2, label)), 96)
        assert img.std() > 5.0  # not a constant image


def test_corrupt_zero_is_the_legacy_render():
    """corrupt=0 must stay bit-identical to the pre-corrupt-knob renderer
    (the pinned proxy60 regenerates bit-identically from its README
    command); pinned by checksum of one fixed (seed,label,i,version)
    tuple. If a renderer change is intentional, re-pin AND regenerate the
    committed proxy60 evidence.

    NOTE: the pin also depends on the NumPy Generator bit-stream
    (Philox/PCG streams are stable in practice but NEP 19 permits
    distribution-method changes across NumPy versions). If this fails
    after a NumPy upgrade with the renderer untouched, the stream moved:
    re-pin the checksum and regenerate the committed proxy60 evidence in
    the same environment."""
    img = render_example_v3(17, np.random.default_rng((7, 17, 150, 3)), 256)
    assert int(img.astype(np.uint64).sum()) == 21777547


def test_corrupt_shifts_rendering_but_not_the_scene():
    """corrupt>0 draws corruption params after all geometry draws: the
    corrupted image must differ from the clean one, but much less than an
    image of a different scene (same label, different index) differs —
    i.e. it is a covariate shift of the SAME scene."""
    rng = lambda i: np.random.default_rng((7, 23, i, 3))  # noqa: E731
    clean = render_example_v3(23, rng(150), 256).astype(np.float32)
    hard = render_example_v3(23, rng(150), 256, corrupt=1.0).astype(np.float32)
    other = render_example_v3(23, rng(151), 256).astype(np.float32)
    d_corrupt = np.abs(hard - clean).mean()
    d_scene = np.abs(other - clean).mean()
    assert d_corrupt > 2.0            # corruption visibly changes pixels
    assert d_corrupt < 0.6 * d_scene  # ... but the scene is preserved


def test_corrupt_severity_is_monotone():
    """Severity must actually bind: the corrupted render's correlation
    with the clean render of the same scene decays monotonically with
    `corrupt` (blur+noise+vignette+contrast each push it down)."""
    def corr(c):
        r = lambda: np.random.default_rng((7, 11, 150, 3))  # noqa: E731
        a = render_example_v3(11, r(), 256).astype(np.float32).ravel()
        b = render_example_v3(11, r(), 256,
                              corrupt=c).astype(np.float32).ravel()
        return np.corrcoef(a, b)[0, 1]
    c25, c50, c100 = corr(0.25), corr(0.5), corr(1.0)
    assert 1.0 > c25 > c50 > c100 > 0.75  # shifted, monotone, same scene


def test_duty_variants_separated_and_scale_invariant():
    """The on-fraction (duty) of variant 0 vs 1 of each family must stay
    separated by a clear margin after per-image jitter, at BOTH render
    scales (RandomResizedCrop zoom must not collapse the bins)."""
    for fam in range(6):
        for size in (96, 224):
            d0 = np.mean([fine_field_v3(2 * fam, size,
                                        np.random.default_rng((3, fam, i)))
                          .mean() for i in range(6)])
            d1 = np.mean([fine_field_v3(2 * fam + 1, size,
                                        np.random.default_rng((3, fam, i)))
                          .mean() for i in range(6)])
            # on-fractions near 0.25 vs 0.45 (or their complements for
            # ring-like families is not a concern: same formula family)
            assert d1 - d0 > 0.10, (fam, size, d0, d1)
