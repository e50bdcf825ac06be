"""Convolution building blocks and RP (resolution-preserving) stacks.

Flax/NHWC equivalents of the reference's block zoo:

  * ``Conv2dBlock``  — reference ``network/base.py:114-198``: pad → conv →
    optional 1x1 "inception" stack → norm → activation → optional SE/SK
    attention.  Default activation is LeakyReLU(0.2) like the reference.
  * RP stack dim plans — the five builder factories
    (``base.py:201-396``): increasing/decreasing-depth plain conv stacks
    and deeper/constant/shallower Conv2dBlock lists.  Here each factory is
    a pure *dim plan* (list of (in, out) channel pairs) consumed by
    ``RPStack``/``RPSequence``, so the stack topology is data, not code.

All convs are stride-1 3x3 (or as configured) with reflection padding —
the "resolution-preserving" property: no pooling, full spatial resolution
at every layer.  Init matches PyTorch Conv2d defaults (kaiming-uniform
a=sqrt(5) ⇒ U(±1/sqrt(fan_in)) for both kernel and bias) so training
dynamics are comparable.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import SEBottleneck, SKBottleneck


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch Conv2d default weight init: U(±1/sqrt(fan_in)).

    shape is flax HWIO: (kh, kw, in_ch, out_ch); fan_in = kh*kw*in_ch.
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# kept for __init__ export symmetry; most callers use make_torch_bias_init
torch_conv_bias_init = make_torch_bias_init


def pad2d(x: jnp.ndarray, pad: int, mode: str = "reflect") -> jnp.ndarray:
    """Spatial padding on NHWC. mode: reflect | replicate (edge) | zero."""
    if pad == 0:
        return x
    jmode = {"reflect": "reflect", "replicate": "edge", "zero": "constant"}[mode]
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=jmode)


class PadConv(nn.Module):
    """Explicit-padding conv: pad(reflect/replicate/zero) then VALID conv.

    Matches the reference's ``nn.ReflectionPad2d + nn.Conv2d`` pairs and
    ``Conv2dBlock``'s pad-then-conv (``base.py:119-127, 188``).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    pad_type: str = "reflect"
    use_bias: bool = True
    dtype: Any = None  # compute dtype (None = infer)

    @nn.compact
    def __call__(self, x):
        x = pad2d(x, self.padding, self.pad_type)
        in_ch = x.shape[-1]
        fan_in = self.kernel_size * self.kernel_size * in_ch
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


def leaky_relu02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


_ACTIVATIONS = {
    "relu": nn.relu,
    "lrelu": leaky_relu02,
    "prelu": None,  # parameterized, handled in Conv2dBlock
    "selu": jax.nn.selu,
    "tanh": jnp.tanh,
    "none": None,
}


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d (affine=False): biased variance over HW."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class Conv2dBlock(nn.Module):
    """Configurable conv unit; reference ``network/base.py:114-198``.

    Order: pad → conv → inception(1x1 × n) → norm → activation → attention.
    The attention block's channel weights are sown into the
    ``intermediates`` collection as ``attention_map`` (the reference caches
    them on the module for ``sort_by_weights``, ``adain_rp.py:230-249``).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    norm: str = "none"
    activation: str = "lrelu"
    pad_type: str = "reflect"
    inception_num: int = 0
    attention: str = "none"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_attention: bool = False):
        x = PadConv(self.features, self.kernel_size, self.stride,
                    self.padding, self.pad_type, dtype=self.dtype)(x)
        for i in range(self.inception_num or 0):
            fan_in = x.shape[-1]
            x = nn.Conv(self.features, (1, 1), use_bias=True,
                        kernel_init=torch_conv_kernel_init,
                        bias_init=make_torch_bias_init(fan_in),
                        dtype=self.dtype, name=f"inception_{i}")(x)
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "in":
            x = instance_norm(x)
        elif self.norm not in ("none", "sn"):
            # 'ln'/'adain' reference classes are undefined in the reference
            # source (base.py:137-139 reference names that are never
            # imported); no runnable config uses them.
            raise NotImplementedError(f"norm {self.norm!r}")

        if self.activation == "prelu":
            alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), ())
            x = jnp.where(x >= 0, x, alpha * x)
        elif self.activation != "none":
            x = _ACTIVATIONS[self.activation](x)

        att = None
        if self.attention == "se":
            x, att = SEBottleneck(planes=self.features, dtype=self.dtype)(
                x, train=train)
            self.sow("intermediates", "attention_map", att)
        elif self.attention == "sk":
            x = SKBottleneck(planes=self.features, dtype=self.dtype)(
                x, train=train)
        if return_attention:
            return x, att
        return x


# ---------------------------------------------------------------------------
# RP stack dim plans.  Each returns [(in_dim, out_dim), ...] of length
# block_num, mirroring the channel progressions of the reference factories.
# ---------------------------------------------------------------------------

def rp_increase_dims(block_num: int, in_dim: int, hidden_dim: int,
                     out_dim: int) -> List[Tuple[int, int]]:
    """build_increase_depth_rp_blocks (base.py:363-379): doubling width."""
    dims = [(in_dim, hidden_dim)]
    h = hidden_dim
    for _ in range(block_num - 2):
        dims.append((h, h * 2))
        h *= 2
    dims.append((h, out_dim))
    return dims


def rp_decrease_dims(block_num: int, in_dim: int, hidden_dim: int,
                     out_dim: int) -> List[Tuple[int, int]]:
    """build_decrease_depth_rp_blocks (base.py:382-396): halving width."""
    dims = [(in_dim, hidden_dim)]
    h = hidden_dim
    for _ in range(block_num - 2):
        dims.append((h, h // 2))
        h //= 2
    dims.append((h, out_dim))
    return dims


def rp_deeper_dims(block_num: int, in_dim: int, hidden_dim: int,
                   out_dim: int) -> List[Tuple[int, int]]:
    """rp_deeper_conv_blocks (base.py:231-257): same progression as increase."""
    return rp_increase_dims(block_num, in_dim, hidden_dim, out_dim)


def rp_constant_dims(block_num: int, in_dim: int, hidden_dim: int,
                     out_dim: int) -> List[Tuple[int, int]]:
    """rp_constant_conv_blocks (base.py:260-285): constant width."""
    dims = [(in_dim, hidden_dim)]
    for _ in range(block_num - 2):
        dims.append((hidden_dim, hidden_dim))
    dims.append((hidden_dim, out_dim))
    return dims


def rp_shallower_dims(block_num: int, in_dim: int, hidden_dim: int,
                      out_dim: int) -> List[Tuple[int, int]]:
    """rp_shallower_conv_blocks (base.py:288-314): halving width."""
    return rp_decrease_dims(block_num, in_dim, hidden_dim, out_dim)


class RPStack(nn.Module):
    """A ModuleList-like stack of Conv2dBlocks that can expose every
    intermediate feature (the multiscale models fuse at each layer,
    ``encode_rp_intermediate`` at adain_rp.py:187-191)."""
    dims: Sequence[Tuple[int, int]]
    kernel_size: int = 3
    padding: int = 1
    activation: str = "lrelu"
    inception_num: int = 0
    attention: str = "none"
    dtype: Any = None

    def setup(self):
        self.blocks = [
            Conv2dBlock(features=out_d, kernel_size=self.kernel_size,
                        stride=1, padding=self.padding,
                        activation=self.activation,
                        inception_num=self.inception_num,
                        attention=self.attention, dtype=self.dtype,
                        name=f"block_{i}")
            for i, (_, out_d) in enumerate(self.dims)]

    def __call__(self, x, train: bool = False):
        for blk in self.blocks:
            x = blk(x, train=train)
        return x

    def intermediates(self, x, train: bool = False):
        feats = []
        for blk in self.blocks:
            x = blk(x, train=train)
            feats.append(x)
        return feats

    def intermediates_with_attention(self, x, train: bool = False):
        """Per-layer features plus SE attention maps (None when the block
        has no attention); used by ``sort_by_weights`` semantics."""
        feats, atts = [], []
        for blk in self.blocks:
            x, att = blk(x, train=train, return_attention=True)
            feats.append(x)
            atts.append(att)
        return feats, atts

    def apply_block(self, x, idx: int, train: bool = False):
        return self.blocks[idx](x, train=train)


class RPSequence(nn.Module):
    """Plain conv+ReLU sequence (no Conv2dBlock extras) matching
    build_increase/decrease_depth_rp_blocks — zero-padded convs with
    inplace ReLU (``base.py:363-396`` uses nn.Conv2d padding=1, i.e.
    zero padding, unlike Conv2dBlock's reflect default)."""
    dims: Sequence[Tuple[int, int]]
    kernel_size: int = 3
    dtype: Any = None

    def setup(self):
        self.convs = [
            PadConv(out_d, self.kernel_size, 1, self.kernel_size // 2,
                    pad_type="zero", dtype=self.dtype, name=f"conv_{i}")
            for i, (_, out_d) in enumerate(self.dims)]

    def __call__(self, x, train: bool = False):
        for conv in self.convs:
            x = nn.relu(conv(x))
        return x
