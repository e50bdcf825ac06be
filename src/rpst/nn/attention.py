"""SE / SK channel attention; reference ``network/attention.py``.

  * SELayer       — squeeze-excitation (attention.py:5-22)
  * SEBottleneck  — 1x1→3x3→1x1 with BN + SE + residual (attention.py:25-66)
  * SKLayer       — selective-kernel multi-dilation (attention.py:69-105)
  * SKBottleneck  — (attention.py:108-130)

BatchNorm uses flax batch stats (train mode updates running stats under the
``batch_stats`` collection; eval uses the running average), matching torch
BatchNorm2d train/eval semantics. Linear/conv inits match torch defaults.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # torch nn.Linear: U(±1/sqrt(fan_in)); flax Dense kernel shape (in, out)
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class SELayer(nn.Module):
    """Squeeze-excitation; returns (scaled features, attention weights)."""
    channel: int
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # (N, C) global average pool
        y = nn.Dense(max(self.channel // self.reduction, 1), use_bias=False,
                     kernel_init=_torch_linear_kernel_init, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channel, use_bias=False,
                     kernel_init=_torch_linear_kernel_init, dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        att = y[:, None, None, :]  # (N, 1, 1, C)
        return x * att, att


class SEBottleneck(nn.Module):
    """conv1x1-bn-relu → conv3x3-bn-relu → conv1x1-bn-SE → +residual → relu.

    Reference attention.py:25-66 (inplanes == planes in every use site, so
    no downsample branch is needed)."""
    planes: int
    reduction: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=_torch_conv_kernel_init, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=_torch_conv_kernel_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=_torch_conv_kernel_init, dtype=self.dtype,
                      name="conv3")(out)
        out = bn("bn3")(out)
        out, att = SELayer(self.planes, self.reduction, dtype=self.dtype)(out)
        out = nn.relu(out + residual)
        return out, att


class SKLayer(nn.Module):
    """Selective kernel: M dilated 3x3 grouped convs + soft channel select.

    Reference attention.py:69-105 (groups=32, dilations 1..M)."""
    out_channels: int
    M: int = 2
    r: int = 16
    L: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        d = max(in_ch // self.r, self.L)
        branches = []
        groups = 32 if in_ch % 32 == 0 else 1
        for i in range(self.M):
            b = nn.Conv(self.out_channels, (3, 3), padding=1 + i,
                        kernel_dilation=(1 + i, 1 + i),
                        feature_group_count=groups, use_bias=False,
                        kernel_init=_torch_conv_kernel_init,
                        dtype=self.dtype, name=f"branch_{i}")(x)
            branches.append(nn.relu(b))
        U = sum(branches)
        s = jnp.mean(U, axis=(1, 2), keepdims=True)  # (N,1,1,C)
        z = nn.relu(nn.Conv(d, (1, 1), use_bias=False,
                            kernel_init=_torch_conv_kernel_init,
                            dtype=self.dtype, name="fc1")(s))
        ab = nn.Conv(self.out_channels * self.M, (1, 1), use_bias=False,
                     kernel_init=_torch_conv_kernel_init, dtype=self.dtype,
                     name="fc2")(z)  # (N,1,1,C*M)
        n = ab.shape[0]
        ab = ab.reshape(n, self.M, self.out_channels)
        ab = jax.nn.softmax(ab, axis=1)
        out = sum(branches[i] * ab[:, i][:, None, None, :] for i in range(self.M))
        return out


class SKBottleneck(nn.Module):
    """conv1x1-bn-relu → SK → conv1x1-bn → +residual → relu
    (attention.py:108-130)."""
    planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=_torch_conv_kernel_init, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = SKLayer(self.planes, dtype=self.dtype)(out, train=train)
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=_torch_conv_kernel_init, dtype=self.dtype,
                      name="conv3")(out)
        out = bn("bn3")(out)
        return nn.relu(out + shortcut)
