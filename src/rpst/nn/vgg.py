"""Frozen VGG-19 perceptual encoder (``vgg_normalised`` layout).

Reference ``network/base.py:57-111``: a custom VGG-19 with
  * a leading 1x1 conv (3→3, no activation) that bakes RGB normalization
    into weights,
  * reflection padding before every 3x3 conv,
  * ceil-mode 2x2 max pools (== 'SAME'-padded stride-2 max pool for the
    2x2/2 window, identical on even inputs),
  * stage taps at relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1 — the
    ``enc_1..enc_5`` slices of ``base.py:565-571`` and ``sanet.py:202-206``.

Weights load from the torch ``vgg_normalised.pth`` checkpoint (converted
OIHW→HWIO) via :func:`load_vgg_params`, or initialize randomly for tests.
The encoder is frozen everywhere in the reference (``base.py:576-578``);
here its params live in a separate pytree that is simply never passed to
the optimizer, and callers wrap features in ``stop_gradient`` equivalently.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import PadConv, make_torch_bias_init, torch_conv_kernel_init

# (in_ch, out_ch) of each 3x3 conv, grouped per stage; the leading 1x1 conv
# is separate. Pools sit between the groups inside stages 2..5.
_STAGES = [
    # stage 1: conv1x1(3->3) then conv(3->64) -> relu1_1
    [(3, 64)],
    # stage 2: conv(64->64) relu1_2, pool, conv(64->128) -> relu2_1
    [(64, 64), (64, 128)],
    # stage 3: conv(128->128) relu2_2, pool, conv(128->256) -> relu3_1
    [(128, 128), (128, 256)],
    # stage 4: 3x conv(256->256) relu3_2..3_4, pool, conv(256->512) -> relu4_1
    [(256, 256), (256, 256), (256, 256), (256, 512)],
    # stage 5: 3x conv(512->512) relu4_2..4_4, pool, conv(512->512) -> relu5_1
    [(512, 512), (512, 512), (512, 512), (512, 512)],
]

# torch nn.Sequential indices of the conv layers in vgg_normalised
# (base.py:57-111), in the same order as [head] + flattened _STAGES.
_TORCH_CONV_INDICES = [0, 2, 5, 9, 12, 16, 19, 22, 25, 29, 32, 35, 38, 42]


def _maxpool_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool with ceil_mode semantics ('SAME' pads the odd edge)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


class VGG19Encoder(nn.Module):
    """Multi-stage VGG feature extractor.

    ``__call__(x)`` returns ``[relu1_1, ..., relu{num_stages}_1]`` — the
    reference's ``encode_with_intermediate`` (base.py:603-608). NHWC in
    [0,1] RGB (no mean/std normalization: the 1x1 head handles it, matching
    the reference pipeline which feeds raw ToTensor output).
    """
    num_stages: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        conv_i = 0

        def conv(x, out_ch, kernel, pad):
            nonlocal conv_i
            y = PadConv(out_ch, kernel, 1, pad, "reflect", dtype=self.dtype,
                        name=f"conv_{conv_i}")(x)
            conv_i += 1
            return y

        feats = []
        # stage 1
        x = conv(x, 3, 1, 0)  # normalization head, no activation
        x = nn.relu(conv(x, 64, 3, 1))
        feats.append(x)
        for stage in range(2, self.num_stages + 1):
            specs = _STAGES[stage - 1]
            for j, (_, out_ch) in enumerate(specs):
                if j == len(specs) - 1:
                    x = _maxpool_ceil(x)
                x = nn.relu(conv(x, out_ch, 3, 1))
            feats.append(x)
        return feats

    def encode(self, x) -> jnp.ndarray:
        """relu{num_stages}_1 only (reference ``encode``, base.py:611-614)."""
        return self(x)[-1]


def init_vgg_params(rng, num_stages: int = 4, dtype=jnp.float32):
    """Random-init params (tests / no-weights benchmarking)."""
    model = VGG19Encoder(num_stages=num_stages, dtype=dtype)
    x = jnp.zeros((1, 32, 32, 3), dtype)
    return model, model.init(rng, x)


def load_vgg_params(path: str, num_stages: int = 4):
    """Load vgg_normalised weights into the flax param tree.

    Accepts a torch ``.pth`` state dict (requires torch on the host) or an
    ``.npz`` produced by ``tools/convert_vgg.py``.
    """
    if str(path).endswith(".npz"):
        arrays = dict(np.load(path))
        weights = [(arrays[f"w{i}"], arrays[f"b{i}"])
                   for i in range(len(_TORCH_CONV_INDICES))]
    else:
        import torch  # host-side only; never on the TPU compute path
        sd = torch.load(path, map_location="cpu")
        weights = []
        for idx in _TORCH_CONV_INDICES:
            w = sd[f"{idx}.weight"].numpy()  # OIHW
            b = sd[f"{idx}.bias"].numpy()
            weights.append((np.transpose(w, (2, 3, 1, 0)), b))  # -> HWIO

    n_convs = 2 + sum(len(_STAGES[s]) for s in range(1, num_stages))
    params = {}
    for i in range(n_convs):
        w, b = weights[i]
        params[f"conv_{i}"] = {"Conv_0": {"kernel": jnp.asarray(w),
                                          "bias": jnp.asarray(b)}}
    model = VGG19Encoder(num_stages=num_stages)
    return model, {"params": params}
