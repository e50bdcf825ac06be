"""Style-attentional networks; reference ``network/sanet.py``.

  * SANetAttention     — sanet.py:73-99: 1x1 f/g/h convs on mean-variance
    normalized features, HW×HW softmax attention, residual output.
  * AEAModule / AEALReluModule — sanet.py:26-71: learned per-query soft
    attention thresholds over the content-style cosine affinity.
  * AdaptiveSANetAttention — sanet.py:100-138.
  * Transform / AdaptiveTransform — sanet.py:140-160: merge relu4_1 +
    upsampled relu5_1 attention outputs through a 3x3 conv.
  * SAModel / AdaptiveSAModel — sanet.py:196-423: transform + VGG-mirror
    decoder over a frozen 5-stage VGG; content (normalized, relu4_1 +
    relu5_1), style stats (relu1_1..relu5_1) and two identity losses.

The HW×HW attention is this framework's "long context" problem (at 512 px,
relu4_1 has HW=4096). The dense path below is the parity path; the
blockwise Pallas kernel in ``rpst.ops.pallas.flash_attention`` is the TPU
fast path for inference (numerically identical softmax(QKᵀ)V up to
reassociation; the adaptive variant's per-row threshold keeps the dense
matrix because the threshold MLP consumes whole affinity rows).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import PadConv, make_torch_bias_init, torch_conv_kernel_init
from ..nn.decoder import VGGMirrorDecoder, upsample_nearest_2x
from ..ops.affinity import cal_affinity_matrix
from ..ops.stats import mean_variance_norm
from .base import mse, normalized_content_loss, style_stat_loss


def _linear(features, name=None):
    def bias_init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)
    return nn.Dense(features,
                    kernel_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                        k, s, d, -1.0 / jnp.sqrt(s[0]), 1.0 / jnp.sqrt(s[0])),
                    bias_init=bias_init, name=name)


def _conv1x1(features, name):
    return nn.Conv(features, (1, 1), use_bias=True,
                   kernel_init=torch_conv_kernel_init, name=name)


class SANetAttention(nn.Module):
    """Single style-attention module (sanet.py:73-99). NHWC.

    On TPU the HW×HW softmax attention runs through the blockwise Pallas
    kernel (``rpst.ops.pallas.flash_attention``) — O(HW·C) memory instead
    of the reference's dense O(HW²) matrix; on CPU (tests) the dense path
    is used (bit-compatible up to reassociation)."""
    in_planes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, content, style):
        from ..ops.pallas.flash_attention import (_dense_attention,
                                                  sanet_attention)
        F = _conv1x1(self.in_planes, "f")(mean_variance_norm(content))
        G = _conv1x1(self.in_planes, "g")(mean_variance_norm(style))
        H = _conv1x1(self.in_planes, "h")(style)
        n, hc, wc, c = F.shape
        _, hs, ws, _ = G.shape
        Fm = F.reshape(n, hc * wc, c)
        Gm = G.reshape(n, hs * ws, c)
        Hm = H.reshape(n, hs * ws, c)
        from ..ops.engine import mosaic_ok
        if mosaic_ok():
            # Mosaic flash attention: single-device TPU programs only —
            # under a >1-device GSPMD mesh the custom call has no SPMD
            # partitioning rule, so the dense XLA einsum (which GSPMD
            # partitions fine) is used instead; the spatial serving mesh
            # routes through the explicit shard_map attention in
            # models/fast_path_spatial.py
            O = sanet_attention(Fm, Gm, Hm)
        else:
            O = _dense_attention(Fm, Gm, Hm)
        O = O.reshape(n, hc, wc, c)
        O = _conv1x1(self.in_planes, "out_conv")(O)
        return O + content


class _AEABase(nn.Module):
    """Shared psi0/psi1 threshold MLP with two evaluation routes.

    The dense route (``__call__``) consumes whole (N, HWc, HWs) affinity
    rows, as the reference does.  ``thresholds_factorized`` exploits that
    psi0 is linear over a row that is itself linear in the style factor
    (``A[p, q] = ĉ_p·ŝ_q``), so ``psi0(A) = ĉ @ (ŝᵀ W0) + b0`` — the
    affinity matrix never materializes (see ``ops/adaptive_attention``).
    Both routes share the SAME Dense submodules: the factorized route
    feeds psi0 the (N, C, HWs) transposed style factor, whose last dim
    equals the dense route's, so the (HWs, HWs/16) kernel is created
    identically by either route and the param tree never changes.
    """
    inplanes: int  # = HW of the style side (spatial_dims)

    def setup(self):
        self.psi0 = _linear(self.inplanes // 16)
        self.psi1 = _linear(1)

    def _squash(self, z):
        raise NotImplementedError

    def thresholds(self, x):
        """Per-query clamp from dense affinity rows x: (N, HWc, HWs)."""
        h = nn.leaky_relu(self.psi0(x), 0.2)
        return self._squash(self.psi1(h))  # (N, HWc, 1)

    def thresholds_factorized(self, cn, sn):
        """Per-query clamp without the (HWc, HWs) affinity.

        cn: (N, HWc, C), sn: (N, HWs, C) — channel-L2-normalized content
        and style features (the ``cal_affinity_matrix`` factors).  psi0's
        bias is recovered with a zero probe so it is added once after the
        content contraction rather than once per style position."""
        b0 = self.psi0(jnp.zeros((1, sn.shape[-2]), sn.dtype))  # (1, K)
        m = self.psi0(jnp.swapaxes(sn, -1, -2)) - b0            # (N, C, K)
        h = nn.leaky_relu(
            jnp.einsum("npc,nck->npk", cn, m) + b0, 0.2)
        return self._squash(self.psi1(h))  # (N, HWc, 1)


class AEAModule(_AEABase):
    """Adaptive threshold MLP over affinity rows (sanet.py:26-46)."""
    scale_value: float = 50.0
    from_value: float = 0.4
    value_interval: float = 0.5

    def _squash(self, z):
        return nn.sigmoid(z) * self.value_interval + self.from_value

    def __call__(self, x, f_x):
        # x: (N, HWc, HWs) affinity; f_x: (N, HWc, HWs) softmaxed attention
        clamp = self.thresholds(x)
        clamp_fx = nn.sigmoid(self.scale_value * (f_x - clamp))
        return clamp_fx, clamp


class AEALReluModule(_AEABase):
    """tanh + relu + softmax threshold variant (sanet.py:49-71)."""

    def _squash(self, z):
        return (jnp.tanh(z) + 1.0) / 2.0

    def __call__(self, x, f_x):
        clamp = self.thresholds(x)
        clamp_fx = jax.nn.softmax(nn.relu(f_x - clamp), axis=-1)
        return clamp_fx, clamp


class AdaptiveSANetAttention(nn.Module):
    """SANet + learned attention threshold (sanet.py:100-138).

    Returns (output, aux) where aux carries the threshold/attention maps
    the reference stashes on the module for visualization.

    ``blockwise`` selects the O(HW·C)-memory streamed path
    (``ops/adaptive_attention``): "never" = dense parity path, "always" =
    streamed, "auto" = streamed on TPU for HW ≥ 1024 rows.  The streamed
    path cannot return the dense claim maps (they are exactly what it
    avoids materializing), so ``force_dense=True`` (used by
    ``stylize_with_aux`` for visualization) overrides it."""
    in_planes: int
    spatial_dims: int
    ada_module: str = "aea"
    blockwise: str = "auto"
    dtype: Any = None

    def _use_blockwise(self, hw_c: int, hw_s: int) -> bool:
        if self.blockwise == "always":
            return True
        if self.blockwise == "never":
            return False
        return (jax.default_backend() == "tpu"
                and min(hw_c, hw_s) >= 1024)

    @nn.compact
    def __call__(self, content, style, force_dense: bool = False):
        from ..ops.adaptive_attention import adaptive_reweighted_attention
        F = _conv1x1(self.in_planes, "f")(mean_variance_norm(content))
        G = _conv1x1(self.in_planes, "g")(mean_variance_norm(style))
        H = _conv1x1(self.in_planes, "h")(style)
        n, hc, wc, c = F.shape
        _, hs, ws, _ = G.shape
        Fm = F.reshape(n, hc * wc, c)
        Gm = G.reshape(n, hs * ws, c)
        Hm = H.reshape(n, hs * ws, c)
        att_mod = (AEAModule(self.spatial_dims, name="aea")
                   if self.ada_module == "aea"
                   else AEALReluModule(self.spatial_dims, name="aea"))

        if self._use_blockwise(hc * wc, hs * ws) and not force_dense:
            # channel-L2-normalized affinity factors (cal_affinity_matrix
            # semantics, network/sanet.py:12-18) — never materialized
            cf = content.reshape(n, hc * wc, -1)
            sf = style.reshape(n, hs * ws, -1)
            cn = cf / jnp.maximum(
                jnp.linalg.norm(cf, axis=2, keepdims=True), 1e-12)
            sn = sf / jnp.maximum(
                jnp.linalg.norm(sf, axis=2, keepdims=True), 1e-12)
            clamp = att_mod.thresholds_factorized(cn, sn)
            variant = "aea" if self.ada_module == "aea" else "aea_lrelu"
            scale = getattr(att_mod, "scale_value", 50.0)
            O = adaptive_reweighted_attention(Fm, Gm, Hm, clamp,
                                              variant=variant,
                                              scale_value=scale)
            O = O.reshape(n, hc, wc, c)
            O = _conv1x1(self.in_planes, "out_conv")(O) + content
            return O, {"claim_value": clamp}

        affinity = cal_affinity_matrix(content, style)  # (N, HWc, HWs)
        S = jax.nn.softmax(jnp.einsum("npc,nqc->npq", Fm, Gm), axis=-1)
        claim_before = S
        S, claim_value = att_mod(affinity, S)
        O = jnp.einsum("npq,nqc->npc", S, Hm).reshape(n, hc, wc, c)
        O = _conv1x1(self.in_planes, "out_conv")(O) + content
        aux = {"claim_value": claim_value, "claim_before": claim_before,
               "claim_after": S}
        return O, aux


class Transform(nn.Module):
    """Merge relu4_1 and upsampled relu5_1 attention (sanet.py:140-149)."""
    in_planes: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, c4, s4, c5, s5):
        a4 = SANetAttention(self.in_planes, name="sanet4_1")(c4, s4)
        a5 = SANetAttention(self.in_planes, name="sanet5_1")(c5, s5)
        merged = a4 + upsample_nearest_2x(a5)
        return PadConv(self.in_planes, 3, 1, 1, "reflect",
                       name="merge_conv")(merged)


class AdaptiveTransform(nn.Module):
    in_planes: int = 512
    relu4_1_dims: int = 4096
    relu5_1_dims: int = 1024
    ada_module: str = "aea"
    blockwise: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, c4, s4, c5, s5, force_dense: bool = False):
        a4, aux4 = AdaptiveSANetAttention(
            self.in_planes, self.relu4_1_dims, self.ada_module,
            self.blockwise, name="sanet4_1")(c4, s4, force_dense)
        a5, aux5 = AdaptiveSANetAttention(
            self.in_planes, self.relu5_1_dims, self.ada_module,
            self.blockwise, name="sanet5_1")(c5, s5, force_dense)
        merged = a4 + upsample_nearest_2x(a5)
        out = PadConv(self.in_planes, 3, 1, 1, "reflect",
                      name="merge_conv")(merged)
        return out, {"relu4_1": aux4, "relu5_1": aux5}


class SAModel(nn.Module):
    """Static SANet model (sanet.py:196-275): trains transform + decoder."""
    adaptive: bool = False
    img_size: int = 512
    ada_module: str = "aea"
    blockwise: str = "auto"
    dtype: Any = None

    def setup(self):
        if self.adaptive:
            self.transform = AdaptiveTransform(
                in_planes=512,
                relu4_1_dims=(self.img_size // 2 ** 3) ** 2,
                relu5_1_dims=(self.img_size // 2 ** 4) ** 2,
                ada_module=self.ada_module, blockwise=self.blockwise,
                dtype=self.dtype)
        else:
            self.transform = Transform(in_planes=512, dtype=self.dtype)
        self.decoder = VGGMirrorDecoder(dtype=self.dtype)

    def _transform(self, c4, s4, c5, s5):
        if self.adaptive:
            out, _aux = self.transform(c4, s4, c5, s5)
            return out
        return self.transform(c4, s4, c5, s5)

    def stylize_from_feats(self, content_feats, style_feats):
        fusion = self._transform(content_feats[3], style_feats[3],
                                 content_feats[4], style_feats[4])
        return self.decoder(fusion)

    def stylize_with_aux(self, content_feats, style_feats):
        """Stylize and return the adaptive claim maps for visualization
        (the reference dumps them in test(), sanet.py:334-366).  Forces
        the dense attention path — the claim maps ARE the dense
        matrices the blockwise path avoids materializing."""
        if not self.adaptive:
            return self.stylize_from_feats(content_feats, style_feats), {}
        fusion, aux = self.transform(content_feats[3], style_feats[3],
                                     content_feats[4], style_feats[4],
                                     force_dense=True)
        return self.decoder(fusion), aux

    def __call__(self, content_feats, style_feats):
        return self.stylize_from_feats(content_feats, style_feats)

    def loss(self, vgg_features, content, style,
             train: bool = True) -> Dict[str, jnp.ndarray]:
        """Loss components (sanet.py:248-275): normalized content loss on
        relu4_1+relu5_1, style stats over 5 stages, two identity losses."""
        content_feats = jax.lax.stop_gradient(vgg_features(content))
        style_feats = jax.lax.stop_gradient(vgg_features(style))
        g_t = self.stylize_from_feats(content_feats, style_feats)
        g_t_feats = vgg_features(g_t)

        loss_c = (normalized_content_loss(g_t_feats[3], content_feats[3])
                  + normalized_content_loss(g_t_feats[4], content_feats[4]))
        loss_s = sum(style_stat_loss(g, jax.lax.stop_gradient(s))
                     for g, s in zip(g_t_feats, style_feats))

        Icc = self.stylize_from_feats(content_feats, content_feats)
        Iss = self.stylize_from_feats(style_feats, style_feats)
        l_identity1 = mse(Icc, content) + mse(Iss, style)
        Fcc = vgg_features(Icc)
        Fss = vgg_features(Iss)
        l_identity2 = sum(
            mse(a, jax.lax.stop_gradient(b)) + mse(c, jax.lax.stop_gradient(d))
            for a, b, c, d in zip(Fcc, content_feats, Fss, style_feats))
        return {
            "content_loss": loss_c,
            "style_loss": loss_s,
            "l_identity1_loss": l_identity1,
            "l_identity2_loss": l_identity2,
        }
