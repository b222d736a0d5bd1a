"""Convolution / linear primitives (NHWC, HWIO) for TPU.

The reference uses cuDNN via nn.Conv2d with symmetric `padding=k//2`
(models/layers.py:219-227,484-495 and tools/utils.py:103-111). XLA's 'SAME'
pads asymmetrically for even inputs with stride 2, so we always use explicit
symmetric (k//2, k//2) padding to reproduce the reference's output geometry
and values exactly.

Weight init replicates PyTorch's nn.Conv2d/nn.Linear default
(kaiming-uniform with a=sqrt(5) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)));
biases are zero-initialized as the reference does explicitly
(model_search.py:352-364, model_eval.py:232-244).

All matmul-shaped work (1x1 convs, linear) lands on the MXU; accumulation is
forced to fp32 via preferred_element_type so bf16 activations are safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def torch_uniform_init(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(float(fan_in)) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_conv_kernel(key, kh, kw, cin_per_group, cout, dtype=jnp.float32):
    """HWIO kernel, torch-default init (fan_in = kh*kw*cin_per_group)."""
    fan_in = kh * kw * cin_per_group
    return torch_uniform_init(key, (kh, kw, cin_per_group, cout), fan_in, dtype)


def init_linear(key, in_features, out_features, bias=True, dtype=jnp.float32):
    w = torch_uniform_init(key, (in_features, out_features), in_features, dtype)
    p = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((out_features,), dtype)
    return p


def conv2d(x, kernel, *, stride=1, groups=1, bias=None):
    """NHWC conv with torch-style symmetric same padding (k//2).

    kernel: HWIO with I = cin // groups. groups == cin gives a depthwise conv
    (XLA feature_group_count), the reference's depth_conv
    (models/layers.py:486-495).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    # No explicit preferred_element_type: TPU MXU accumulates bf16
    # convolutions in fp32 internally, and keeping in/out dtypes equal keeps
    # the transpose (gradient) convolutions dtype-consistent under AD.
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=DIMSPEC,
        feature_group_count=groups,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def linear(x, params):
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def global_avg_pool(x):
    """NHWC -> NC global average pool (nn.AdaptiveAvgPool2d(1) + flatten)."""
    return jnp.mean(x, axis=(1, 2))


def channel_shuffle(x, groups):
    """NHWC channel shuffle (tools/utils.py:89-100)."""
    n, h, w, c = x.shape
    assert c % groups == 0
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)
