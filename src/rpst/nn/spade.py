"""SPADE conditional normalization decoder; reference ``network/spade_rp.py``.

  * SPADE            — spade_rp.py:21-66: param-free IN/BN + a 3x3 conv MLP
    on the (nearest-resized) condition map producing per-pixel gamma/beta.
  * SpadeResnetBlock — spade_rp.py:68-108: two SPADE-conv units + learned
    shortcut when channel counts change; LeakyReLU(0.2).
  * SpadeDecoder     — spade_rp.py:110-146: head + 2 middle + 4 down blocks
    (16·ndf → ndf) + RGB conv. All stride-1 (resolution preserving — the
    reference never upsamples here because nothing was downsampled).

The reference's 'syncbatch' branch references an undefined
SynchronizedBatchNorm2d (spade_rp.py:32); in a jax/pjit world batch stats
are computed globally under shard_map anyway, so 'syncbatch' simply maps to
batch norm.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import instance_norm, make_torch_bias_init, torch_conv_kernel_init


def _conv(features, ks, name, use_bias=True):
    return nn.Conv(features, (ks, ks), padding=ks // 2, use_bias=use_bias,
                   kernel_init=torch_conv_kernel_init,
                   bias_init=nn.initializers.zeros, name=name)


class SPADE(nn.Module):
    norm_nc: int
    param_free_norm_type: str = "instance"
    nhidden: int = 128  # hardcoded in the reference (spade_rp.py:41)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, condition, train: bool = False):
        if self.param_free_norm_type == "instance":
            normalized = instance_norm(x)
        elif self.param_free_norm_type in ("batch", "syncbatch"):
            normalized = nn.BatchNorm(use_running_average=not train,
                                      momentum=0.9, epsilon=1e-5,
                                      use_bias=False, use_scale=False,
                                      dtype=self.dtype, name="pf_bn")(x)
        else:
            raise ValueError(
                f"{self.param_free_norm_type} is not a recognized param-free "
                f"norm type in SPADE")

        n, h, w, _ = x.shape
        cond = jax.image.resize(
            condition, (n, h, w, condition.shape[-1]), method="nearest")
        actv = nn.relu(_conv(self.nhidden, 3, "mlp_shared")(cond))
        gamma = _conv(self.norm_nc, 3, "mlp_gamma")(actv)
        beta = _conv(self.norm_nc, 3, "mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


class SpadeResnetBlock(nn.Module):
    fin: int
    fout: int
    spade_norm: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, condition, train: bool = False):
        learned_shortcut = self.fin != self.fout
        fmiddle = min(self.fin, self.fout)
        actvn = lambda v: nn.leaky_relu(v, negative_slope=0.2)

        if learned_shortcut:
            x_s = _conv(self.fout, 1, "conv_s", use_bias=False)(
                SPADE(self.fin, self.spade_norm, dtype=self.dtype,
                      name="norm_s")(x, condition, train))
        else:
            x_s = x

        dx = _conv(fmiddle, 3, "conv_0")(actvn(
            SPADE(self.fin, self.spade_norm, dtype=self.dtype,
                  name="norm_0")(x, condition, train)))
        dx = _conv(self.fout, 3, "conv_1")(actvn(
            SPADE(fmiddle, self.spade_norm, dtype=self.dtype,
                  name="norm_1")(dx, condition, train)))
        return x_s + dx


class SpadeDecoder(nn.Module):
    ndf: int
    spade_norm: str = "instance"
    condition_nc: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, feat, condition, train: bool = False):
        ndf = self.ndf
        blk = lambda fin, fout, name: SpadeResnetBlock(
            fin, fout, self.spade_norm, dtype=self.dtype, name=name)
        x = blk(self.condition_nc, 16 * ndf, "head")(feat, condition, train)
        x = blk(16 * ndf, 16 * ndf, "rp_middle_0")(x, condition, train)
        x = blk(16 * ndf, 16 * ndf, "rp_middle_1")(x, condition, train)
        x = blk(16 * ndf, 8 * ndf, "d1")(x, condition, train)
        x = blk(8 * ndf, 4 * ndf, "d2")(x, condition, train)
        x = blk(4 * ndf, 2 * ndf, "d3")(x, condition, train)
        x = blk(2 * ndf, 1 * ndf, "d4")(x, condition, train)
        return _conv(3, 3, "conv_img")(x)
