"""Synthetic data source for tests and benchmarks (no ImageNet on disk).

Generates deterministic pseudo-image batches with class-correlated means so
training steps have real signal to descend on.
"""

from __future__ import annotations

import numpy as np


class SyntheticImages:
    def __init__(self, num_classes=100, image_size=224, seed=0):
        self.num_classes = num_classes
        self.image_size = image_size
        self.seed = seed

    def batches(self, batch_size, steps):
        rng = np.random.default_rng(self.seed)
        for _ in range(steps):
            y = rng.integers(0, self.num_classes, batch_size).astype(np.int32)
            x = rng.standard_normal(
                (batch_size, self.image_size, self.image_size, 3),
                np.float32)
            x += (y[:, None, None, None] / self.num_classes - 0.5)
            yield x, y


def synthetic_loader(batch_size, steps, num_classes=100, image_size=224,
                     seed=0):
    return SyntheticImages(num_classes, image_size, seed).batches(
        batch_size, steps)
