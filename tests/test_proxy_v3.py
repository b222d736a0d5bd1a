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
