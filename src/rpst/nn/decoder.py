"""VGG-mirror decoder (512→3) used by SourceNet and the SANet models.

Reference ``network/base.py:25-55`` (duplicated at ``sanet.py:162-192``):
reflection-padded 3x3 convs with ReLU, nearest ×2 upsampling at the three
stage boundaries, no activation on the final RGB conv.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import PadConv


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")


class VGGMirrorDecoder(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = lambda ch, name: PadConv(ch, 3, 1, 1, "reflect",
                                        dtype=self.dtype, name=name)
        x = nn.relu(conv(256, "conv0")(x))
        x = upsample_nearest_2x(x)
        x = nn.relu(conv(256, "conv1")(x))
        x = nn.relu(conv(256, "conv2")(x))
        x = nn.relu(conv(256, "conv3")(x))
        x = nn.relu(conv(128, "conv4")(x))
        x = upsample_nearest_2x(x)
        x = nn.relu(conv(128, "conv5")(x))
        x = nn.relu(conv(64, "conv6")(x))
        x = upsample_nearest_2x(x)
        x = nn.relu(conv(64, "conv7")(x))
        x = conv(3, "conv8")(x)
        return x
