"""Spatially sharded folded serving — sequence parallelism for images.

``stylize_multi_adain_folded_spatial`` (and the sel_multi_adain / ccam
variants below) runs the folded stylize (models/fast_path.py) inside ONE
``jax.shard_map`` over a mesh's ``spatial`` axis (image rows), with every
cross-shard dependency an explicit ICI collective:

  * **halo exchange**: each stride-1 folded conv needs one folded row from
    each neighbor shard; ``ppermute`` ships shard edges up/down, and the
    global top/bottom shards substitute the reflect ring
    (``ops.folded._row_ring``) — the same values a single device computes.
    The fused Pallas kernel takes these via its ``rings`` input, so Mosaic
    kernels run per-shard (Mosaic custom calls have no SPMD partitioning
    rule — under shard_map they never need one);
  * **AdaIN statistics**: per-channel instance mean/std are global over
    H·W, so the local folded sums ``psum`` over the spatial axis — two
    scalars per channel per image, negligible ICI traffic.

This is the repo's image analogue of sequence/context parallelism
(SURVEY §2.4/§5: the reference materializes everything on one GPU; its
scaling wall is activation memory).  A 2048px image that cannot fit — or
cannot hit latency — on one chip shards its rows across the slice while
every conv still runs the fused kernel.  The ``data`` axis composes
orthogonally (batch parallel; no collectives).

Exactness: equal to the single-device folded path up to f32 reduction
order (tests/test_spatial_fast_path.py drives both on the 8-virtual-CPU
mesh, interpret-mode kernels, and pins allclose).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.folded import (_pad_cols_ring, _row_ring, fold, unfold)
from ..ops.pallas.folded_conv import fused_folded_conv
from .fast_path import _folded_blocks, _lrelu


def _halo_rows(x_l, axis: str, n_shards: int):
    """(row-above, row-below) for the local H-shard of a folded tensor.

    Interior boundaries receive the neighbor shard's edge row over ICI
    (``ppermute``); the global top/bottom shard substitutes the folded
    reflect ring, reproducing single-device padding exactly."""
    above = _row_ring(x_l, True)
    below = _row_ring(x_l, False)
    if n_shards == 1:
        return above, below
    idx = jax.lax.axis_index(axis)
    down = [(s, s + 1) for s in range(n_shards - 1)]   # edge rows flow down
    up = [(s + 1, s) for s in range(n_shards - 1)]     # edge rows flow up
    from_prev = jax.lax.ppermute(x_l[:, -1:], axis, down)
    from_next = jax.lax.ppermute(x_l[:, :1], axis, up)
    above = jnp.where(idx == 0, above, from_prev)
    below = jnp.where(idx == n_shards - 1, below, from_next)
    return above, below


def _conv_lrelu_halo(x_l, k, b, axis: str, n_shards: int, interpret: bool):
    """One folded conv + bias + lrelu on an H-shard — DIFFERENTIABLE.

    Lane-filling layers run the fused Pallas kernel with the halo rows in
    its ``rings`` slot through ``folded_conv_act_halo`` (custom VJP: the
    Pallas backward pair per shard, with the virtual-row cotangents
    returned so autodiff of ``_halo_rows`` ships the adjoint halo rows to
    the neighbor via the ppermute transpose and applies the reflect-pad
    adjoint at the global edges via ``_row_ring``'s transpose); boundary
    layers (3<->hidden channels) take the XLA path on the halo-padded
    slab with local reflect column rings (corners fall out as in
    ``ops.folded.folded_reflect_pad``), differentiable natively."""
    above, below = _halo_rows(x_l, axis, n_shards)
    if (k.shape[2] % 128 == 0 and k.shape[3] % 128 == 0
            and (interpret or jax.default_backend() != "cpu")):
        from ..ops.pallas.folded_conv import folded_conv_act_halo
        return folded_conv_act_halo(0.2, interpret, x_l, k, b,
                                    above.astype(x_l.dtype),
                                    below.astype(x_l.dtype))
    xp = jnp.concatenate([above.astype(x_l.dtype), x_l,
                          below.astype(x_l.dtype)], axis=1)
    y = jax.lax.conv_general_dilated(
        _pad_cols_ring(xp), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return _lrelu(y)


def _folded_adain_spatial(content_f, style_f, axis: str, n_shards: int,
                          eps: float = 1e-5):
    """``ops.folded.folded_adain`` with the instance statistics psum'd
    over the spatial axis (sums are linear — exact up to f32 reduction
    order)."""

    def stats(x_f):
        n, hh, ww, c4 = x_f.shape
        c = c4 // 4
        m = hh * ww * 4 * n_shards  # GLOBAL original pixel count
        v = x_f.astype(jnp.float32).reshape(n, hh * ww, 4, c)
        s1 = jnp.sum(v, axis=(1, 2))
        s2 = jnp.sum(v * v, axis=(1, 2))
        if n_shards > 1:
            s1 = jax.lax.psum(s1, axis)
            s2 = jax.lax.psum(s2, axis)
        mean = s1 / m
        var = (s2 - m * mean * mean) / max(m - 1, 1)
        std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
        tile = lambda t: jnp.tile(t, (1, 4))[:, None, None, :].astype(
            x_f.dtype)
        return tile(mean), tile(std)

    cm, cs = stats(content_f)
    sm, ss = stats(style_f)
    return (content_f - cm) / cs * ss + sm


def _run_spatial(mesh: Mesh, shard_fn, variables, content, style):
    """Common shard_map launch: `{data?, spatial}` specs, height check.

    check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    annotation, and the collectives here are hand-placed anyway."""
    axis = "spatial"
    assert axis in mesh.axis_names, mesh
    n_shards = mesh.shape[axis]
    assert content.shape[1] % (2 * n_shards) == 0, (
        f"image height {content.shape[1]} must divide into 2*{n_shards} "
        "folded shard rows")
    img_spec = (P("data", axis) if "data" in mesh.axis_names
                else P(None, axis))
    return jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(), img_spec, img_spec),
                         out_specs=img_spec,
                         check_vma=False)(variables, content, style)


def stylize_multi_adain_folded_spatial(params, content, style, mesh: Mesh,
                                       dtype=jnp.bfloat16,
                                       interpret: bool | None = None):
    """Folded flagship stylize over a ``{data?, spatial}`` mesh.

    Semantics identical to ``fast_path.stylize_multi_adain_folded``
    (reference adain_rp.py:187-191, 286-302): encode both images keeping
    per-layer features, AdaIN at the deepest scale, per-scale residual
    re-fusion through the decoder — but image rows live sharded over the
    ``spatial`` axis end to end; only halo rows and the AdaIN sums cross
    shards.  ``interpret=None`` auto-selects interpret-mode kernels off
    TPU (the CPU test mesh)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_shards = mesh.shape["spatial"]

    def shard_fn(params, c_l, s_l):
        return _multi_adain_shard_body(params, c_l, s_l, n_shards, dtype,
                                       interpret)

    return _run_spatial(mesh, shard_fn, params, content, style)


def _multi_adain_shard_body(params, c_l, s_l, n_shards: int, dtype,
                            interpret: bool):
    """The per-shard folded flagship stylize — shared by the serving
    entry above and the trainable spatial loss below (every op here is
    differentiable; see ``_conv_lrelu_halo``)."""
    enc = _folded_blocks(params["rp_shared_encoder"])
    dec = _folded_blocks(params["rp_decoder"])
    conv = lambda x, k, b: _conv_lrelu_halo(
        x, k.astype(dtype), b.astype(dtype), "spatial", n_shards,
        interpret)
    adain = partial(_folded_adain_spatial, axis="spatial",
                    n_shards=n_shards)

    def encode(img):
        x = fold(img.astype(dtype))
        feats = []
        for k, b in enc:
            x = conv(x, k, b)
            feats.append(x)
        return feats

    c_feats = encode(c_l)
    s_feats = encode(s_l)
    stylized = adain(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    stylized = conv(stylized, k, b)
    for i, (cf, sf) in enumerate(
            list(zip(c_feats[:-1], s_feats[:-1]))[::-1]):
        fusion = adain(cf, sf)
        k, b = dec[i + 1]
        stylized = conv(stylized + fusion, k, b)
    return unfold(stylized).astype(c_l.dtype)


def _zero_conv_halo(x_l, k, axis: str, n_shards: int):
    """``ops.folded.folded_zero_conv`` (3x3, 1-px original ZERO padding)
    on an H-shard: interior halo rows via ppermute, zero rows at the
    global top/bottom (an original zero ring folds to an all-zero folded
    ring).  Used by the SE bottleneck's middle conv — one layer at the
    deepest scale, so the halo-padded XLA path is fine."""
    zero = jnp.zeros_like(x_l[:, :1])
    if n_shards == 1:
        above = below = zero
    else:
        idx = jax.lax.axis_index(axis)
        down = [(s, s + 1) for s in range(n_shards - 1)]
        up = [(s + 1, s) for s in range(n_shards - 1)]
        above = jnp.where(idx == 0, zero, jax.lax.ppermute(
            x_l[:, -1:], axis, down))
        below = jnp.where(idx == n_shards - 1, zero, jax.lax.ppermute(
            x_l[:, :1], axis, up))
    xp = jnp.concatenate([above, x_l, below], axis=1)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _channel_pool_spatial(x_f, axis: str, n_shards: int):
    """``ops.folded.folded_channel_pool`` with the mean psum'd over the
    spatial axis: (N, Hf, Wf, 4C) -> (N, C) global average."""
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    s = jnp.sum(x_f.astype(jnp.float32).reshape(n, hh * ww, 4, c),
                axis=(1, 2))
    if n_shards > 1:
        s = jax.lax.psum(s, axis)
    return s / (hh * ww * 4 * n_shards)


def _se_bottleneck_spatial(x_f, params, stats, dtype, axis: str,
                           n_shards: int):
    """``fast_path._folded_se_bottleneck`` (eval mode) on an H-shard:
    the 1x1 convs and BatchNorm affines are row-local, the 3x3 zero conv
    exchanges halo rows, and the SE global pool psums."""
    from ..ops.folded import (fold_conv1x1_kernel, fold_conv_kernel,
                              folded_channel_affine, folded_zero_conv)
    from .fast_path import _folded_bn_affine

    f32 = jnp.float32
    residual = x_f
    k1 = fold_conv1x1_kernel(params["conv1"]["kernel"]).astype(dtype)
    s, b = _folded_bn_affine(params["bn1"], stats["bn1"])
    out = jax.nn.relu(folded_channel_affine(
        folded_zero_conv(x_f, k1), s.astype(dtype), b.astype(dtype)))
    k2 = fold_conv_kernel(params["conv2"]["kernel"]).astype(dtype)
    s, b = _folded_bn_affine(params["bn2"], stats["bn2"])
    out = jax.nn.relu(folded_channel_affine(
        _zero_conv_halo(out, k2, axis, n_shards),
        s.astype(dtype), b.astype(dtype)))
    k3 = fold_conv1x1_kernel(params["conv3"]["kernel"]).astype(dtype)
    s, b = _folded_bn_affine(params["bn3"], stats["bn3"])
    out = folded_channel_affine(folded_zero_conv(out, k3),
                                s.astype(dtype), b.astype(dtype))
    se = params["SELayer_0"]
    y = _channel_pool_spatial(out, axis, n_shards)
    y = jax.nn.relu(y @ se["Dense_0"]["kernel"].astype(f32))
    y = jax.nn.sigmoid(y @ se["Dense_1"]["kernel"].astype(f32))
    out = folded_channel_affine(out, y.astype(dtype))
    return jax.nn.relu(out + residual)


def stylize_sel_multi_adain_folded_spatial(variables, content, style,
                                           mesh: Mesh, dtype=jnp.bfloat16,
                                           interpret: bool | None = None):
    """``fast_path.stylize_sel_multi_adain_folded`` (SELastRP eval,
    reference adain_rp.py:451-481) over a ``{data?, spatial}`` mesh."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_shards = mesh.shape["spatial"]

    def shard_fn(variables, c_l, s_l):
        params = variables["params"]
        stats = variables.get("batch_stats", {}).get("attention_block",
                                                     None)
        enc = _folded_blocks(params["ms"]["rp_shared_encoder"])
        dec = _folded_blocks(params["ms"]["rp_decoder"])
        conv = lambda x, k, b: _conv_lrelu_halo(
            x, k.astype(dtype), b.astype(dtype), "spatial", n_shards,
            interpret)
        adain = partial(_folded_adain_spatial, axis="spatial",
                        n_shards=n_shards)

        def encode(img):
            x = fold(img.astype(dtype))
            feats = []
            for k, b in enc:
                x = conv(x, k, b)
                feats.append(x)
            return feats

        c_feats = encode(c_l)
        s_feats = encode(s_l)
        stylized = adain(c_feats[-1], s_feats[-1])
        k, b = dec[0]
        stylized = conv(stylized, k, b)
        pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
        for i, (_, sf) in enumerate(pairs):
            stylized = adain(stylized, sf)
            if i == len(pairs) - 1:
                stylized = _se_bottleneck_spatial(
                    stylized, params["attention_block"], stats, dtype,
                    "spatial", n_shards)
            k, b = dec[i + 1]
            stylized = conv(stylized, k, b)
        return unfold(stylized).astype(c_l.dtype)

    return _run_spatial(mesh, shard_fn, variables, content, style)


def _ccam_spatial(x_f, y_f, scale, axis: str, n_shards: int):
    """``fast_path._folded_ccam`` on an H-shard: the (4C, 4C) folded
    cross-product energy is a sum over pixels, so the local partial
    psums; softmax and the kron(I4, att) recombination are then
    row-local (reference adain_rp.py:348-385 semantics, inputs
    detached)."""
    x_f = jax.lax.stop_gradient(x_f)
    y_f = jax.lax.stop_gradient(y_f)
    n, hh, ww, c4 = x_f.shape
    c = c4 // 4
    xr = x_f.reshape(n, hh * ww, c4)
    yr = y_f.reshape(n, hh * ww, c4)
    e4 = jnp.einsum("npa,npb->nab", xr, yr,
                    preferred_element_type=jnp.float32)
    if n_shards > 1:
        e4 = jax.lax.psum(e4, axis)
    blocks = e4.reshape(n, 4, c, 4, c)
    energy = (blocks[:, 0, :, 0] + blocks[:, 1, :, 1]
              + blocks[:, 2, :, 2] + blocks[:, 3, :, 3])
    energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
    attention = jax.nn.softmax(energy_new, axis=-1)
    att4 = jnp.einsum("st,nck->nsctk", jnp.eye(4, dtype=attention.dtype),
                      attention).reshape(n, c4, c4)
    out = jnp.einsum("npk,nck->npc", yr, att4.astype(yr.dtype))
    return x_f + scale * out.reshape(n, hh, ww, c4)


def stylize_ccam_folded_spatial(variables, content, style, mesh: Mesh,
                                stylized_layers: int = 5,
                                dtype=jnp.bfloat16,
                                interpret: bool | None = None):
    """``fast_path.stylize_ccam_folded`` (CCAMRP eval, reference
    adain_rp.py:348-422) over a ``{data?, spatial}`` mesh: per-scale
    AdaIN + cross-channel-attention residual, energies psum'd."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_shards = mesh.shape["spatial"]

    def shard_fn(variables, c_l, s_l):
        return _ccam_shard_body(variables, c_l, s_l, n_shards,
                                stylized_layers, dtype, interpret)

    return _run_spatial(mesh, shard_fn, variables, content, style)


def _ccam_shard_body(variables, c_l, s_l, n_shards: int,
                     stylized_layers: int, dtype, interpret: bool):
    """Per-shard folded CCAM stylize — shared by the serving entry above
    and the trainable spatial loss (differentiable: the CCAM inputs are
    stop-gradient per the reference's detach, the ``scale`` params and
    convs carry gradients)."""
    params = variables["params"]
    enc = _folded_blocks(params["ms"]["rp_shared_encoder"])
    dec = _folded_blocks(params["ms"]["rp_decoder"])
    conv = lambda x, k, b: _conv_lrelu_halo(
        x, k.astype(dtype), b.astype(dtype), "spatial", n_shards,
        interpret)
    adain = partial(_folded_adain_spatial, axis="spatial",
                    n_shards=n_shards)
    ccam = partial(_ccam_spatial, axis="spatial", n_shards=n_shards)
    scale = lambda i: params[f"ccam_{i}"]["scale"].astype(dtype)

    def encode(img):
        x = fold(img.astype(dtype))
        feats = []
        for k, b in enc:
            x = conv(x, k, b)
            feats.append(x)
        return feats

    c_feats = encode(c_l)
    s_feats = encode(s_l)
    stylized = adain(c_feats[-1], s_feats[-1])
    att_res = ccam(c_feats[-1], s_feats[-1], scale(0))
    k, b = dec[0]
    stylized = conv(stylized + att_res, k, b)
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        k, b = dec[i + 1]
        if i + 1 < stylized_layers:
            stylized = adain(stylized, sf)
            att_res = ccam(stylized, sf, scale(i + 1))
            stylized = conv(stylized + att_res, k, b)
        else:
            stylized = conv(stylized, k, b)
    return unfold(stylized).astype(c_l.dtype)


# ---------------------------------------------------------------------------
# SANet / AdaptiveSANet spatial serving (standard layout, bf16)
# ---------------------------------------------------------------------------

def _reflect_conv_halo_std(x_l, k, b, axis: str, n_shards: int,
                           act: bool = True):
    """Standard-layout reflect 3x3 conv (+ optional relu) on an H-shard.

    Interior halo rows arrive from the neighbor shard over ICI; the
    global top/bottom shards reflect locally (1-px reflection of the
    global row 0 is global row 1, which lives in the same shard).
    1x1 kernels are row-local and skip the exchange."""
    if k.shape[0] == 1:
        y = jax.lax.conv_general_dilated(
            x_l, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jax.nn.relu(y) if act else y
    refl_top = x_l[:, 1:2]
    refl_bot = x_l[:, -2:-1]
    if n_shards == 1:
        above, below = refl_top, refl_bot
    else:
        idx = jax.lax.axis_index(axis)
        down = [(s, s + 1) for s in range(n_shards - 1)]
        up = [(s + 1, s) for s in range(n_shards - 1)]
        above = jnp.where(idx == 0, refl_top,
                          jax.lax.ppermute(x_l[:, -1:], axis, down))
        below = jnp.where(idx == n_shards - 1, refl_bot,
                          jax.lax.ppermute(x_l[:, :1], axis, up))
    xp = jnp.concatenate([above, x_l, below], axis=1)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return jax.nn.relu(y) if act else y


def _mvn_spatial(x, axis: str, n_shards: int, eps: float = 1e-5):
    """``ops.stats.mean_variance_norm`` (unbiased variance over global
    H*W, reference sanet.py:20-24) with the sums psum'd."""
    n, hh, ww, c = x.shape
    m = hh * ww * n_shards
    v = x.astype(jnp.float32)
    s1 = jnp.sum(v, axis=(1, 2), keepdims=True)
    s2 = jnp.sum(v * v, axis=(1, 2), keepdims=True)
    if n_shards > 1:
        s1 = jax.lax.psum(s1, axis)
        s2 = jax.lax.psum(s2, axis)
    mean = s1 / m
    var = (s2 - m * mean * mean) / max(m - 1, 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    return ((v - mean) / std).astype(x.dtype)


def _conv1x1_p(p, x, dtype):
    return (jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
        + p["bias"].astype(dtype))


def _sanet_attention_spatial(p, content_l, style_full, dtype, axis: str,
                             n_shards: int, interpret: bool,
                             adaptive: bool = False,
                             ada_module: str = "aea"):
    """``models.sanet.SANetAttention`` / ``AdaptiveSANetAttention``
    (reference sanet.py:73-138) with content query rows local and the
    style side replicated (pre-all-gathered): the attention is
    row-parallel over queries, so each shard runs the flash kernel on
    its own query block against the full style keys/values.  The
    adaptive threshold uses the factorized psi0/psi1 route
    (ops/adaptive_attention) — per-query, hence shard-local."""
    from ..ops.adaptive_attention import adaptive_reweighted_attention
    from ..ops.pallas.flash_attention import sanet_attention
    from ..ops.stats import mean_variance_norm

    F = _conv1x1_p(p["f"], _mvn_spatial(content_l, axis, n_shards), dtype)
    G = _conv1x1_p(p["g"], mean_variance_norm(style_full), dtype)
    H = _conv1x1_p(p["h"], style_full.astype(dtype), dtype)
    n, hc, wc, c = F.shape
    _, hs, ws, _ = G.shape
    Fm = F.reshape(n, hc * wc, c)
    Gm = G.reshape(n, hs * ws, c)
    Hm = H.reshape(n, hs * ws, c)
    if adaptive:
        cf = content_l.reshape(n, hc * wc, -1).astype(jnp.float32)
        sf = style_full.reshape(n, hs * ws, -1).astype(jnp.float32)
        cn = cf / jnp.maximum(
            jnp.linalg.norm(cf, axis=2, keepdims=True), 1e-12)
        sn = sf / jnp.maximum(
            jnp.linalg.norm(sf, axis=2, keepdims=True), 1e-12)
        aea = p["aea"]
        w0 = aea["psi0"]["kernel"].astype(jnp.float32)
        b0 = aea["psi0"]["bias"].astype(jnp.float32)
        m = jnp.einsum("nqc,qk->nck", sn, w0)
        h = jax.nn.leaky_relu(
            jnp.einsum("npc,nck->npk", cn, m) + b0, 0.2)
        z = (h @ aea["psi1"]["kernel"].astype(jnp.float32)
             + aea["psi1"]["bias"].astype(jnp.float32))
        if ada_module == "aea":
            clamp = jax.nn.sigmoid(z) * 0.5 + 0.4
            variant, scale = "aea", 50.0
        else:
            clamp = (jnp.tanh(z) + 1.0) / 2.0
            variant, scale = "aea_lrelu", 50.0
        O = adaptive_reweighted_attention(Fm, Gm, Hm,
                                          clamp.astype(Fm.dtype),
                                          variant=variant,
                                          scale_value=scale)
    else:
        O = sanet_attention(Fm, Gm, Hm, interpret=interpret)
    O = O.reshape(n, hc, wc, c)
    return _conv1x1_p(p["out_conv"], O, dtype) + content_l.astype(dtype)


def stylize_sanet_spatial(variables, vgg_vars, content, style, mesh: Mesh,
                          adaptive: bool = False, ada_module: str = "aea",
                          dtype=jnp.bfloat16,
                          interpret: bool | None = None):
    """SANet / AdaptiveSANet serving over a ``{data?, spatial}`` mesh
    (reference sanet.py:196-275 / 278-423 semantics): 5-stage VGG encode
    of both images with halo-exchanged reflect convs and row-local ceil
    pools, per-shard flash attention on local query rows against
    all-gathered style keys/values, halo merge conv, and the VGG-mirror
    decoder with row-local nearest upsamples.

    Image rows stay sharded end to end; the only whole-feature
    collectives are the two style-tap all-gathers (relu4_1 + relu5_1 —
    ~5 MB bf16 per image at 512px) and the psum'd instance statistics.
    This extends spatial serving to the attention families, whose Pallas
    flash kernel GSPMD cannot partition (under shard_map it runs
    per-shard and never needs a partitioning rule)."""
    from .fast_path_q8 import (_MIRROR_PROGRAM, _maxpool2x_any,
                               _upsample2x_any, _vgg_q8_layers)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    axis = "spatial"
    assert axis in mesh.axis_names, mesh
    n_shards = mesh.shape[axis]
    assert content.shape[1] % (32 * n_shards) == 0, (
        f"image height {content.shape[1]} must divide into 32*{n_shards} "
        "rows (4 VGG pools per shard, >= 2 relu5_1 rows per shard for "
        "the boundary reflection)")
    img_spec = (P("data", axis) if "data" in mesh.axis_names
                else P(None, axis))

    def shard_fn(variables, vgg_params, c_l, s_l):
        convs, program, tap_idx = _vgg_q8_layers(vgg_params, 5)
        n = c_l.shape[0]

        def encode(x):
            x = x.astype(dtype)
            taps = []
            for li, (k, b) in enumerate(convs):
                pre, act = program[li]
                if pre == "pool":
                    x = _maxpool2x_any(x)
                x = _reflect_conv_halo_std(x, k.astype(dtype),
                                           b.astype(dtype), axis,
                                           n_shards, act=act)
                if li in tap_idx:
                    taps.append(x)
            return taps

        # one 2N encode (no batch-coupled ops in VGG)
        taps = encode(jnp.concatenate([c_l, s_l], axis=0))
        c4, s4 = taps[3][:n], taps[3][n:]
        c5, s5 = taps[4][:n], taps[4][n:]
        if n_shards > 1:
            s4 = jax.lax.all_gather(s4, axis, axis=1, tiled=True)
            s5 = jax.lax.all_gather(s5, axis, axis=1, tiled=True)
        tp = variables["params"]["transform"]
        att = partial(_sanet_attention_spatial, dtype=dtype, axis=axis,
                      n_shards=n_shards, interpret=interpret,
                      adaptive=adaptive, ada_module=ada_module)
        a4 = att(tp["sanet4_1"], c4, s4)
        a5 = att(tp["sanet5_1"], c5, s5)
        merged = a4 + _upsample2x_any(a5)
        x = _reflect_conv_halo_std(
            merged, tp["merge_conv"]["Conv_0"]["kernel"].astype(dtype),
            tp["merge_conv"]["Conv_0"]["bias"].astype(dtype), axis,
            n_shards, act=False)
        dec = variables["params"]["decoder"]
        for li in range(9):
            pre, act = _MIRROR_PROGRAM[li]
            if pre == "up":
                x = _upsample2x_any(x)
            k = dec[f"conv{li}"]["Conv_0"]["kernel"].astype(dtype)
            b = dec[f"conv{li}"]["Conv_0"]["bias"].astype(dtype)
            x = _reflect_conv_halo_std(x, k, b, axis, n_shards, act=act)
        return x.astype(c_l.dtype)

    return jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(), P(), img_spec, img_spec),
                         out_specs=img_spec,
                         check_vma=False)(variables, vgg_vars["params"],
                                          content, style)


# ---------------------------------------------------------------------------
# Spatially sharded folded TRAINING (flagship multi_adain)
# ---------------------------------------------------------------------------

def _vgg_taps_spatial(vgg_params, x_l, axis: str, n_shards: int, dtype):
    """[relu1_1..relu4_1] of an H-shard through the frozen VGG: reflect
    convs exchange halo rows (``_reflect_conv_halo_std``), pools are
    row-local exact 2x2/2 (== ceil mode on the even sizes training uses;
    requires local rows % 8 == 0 for the three pools to relu4_1).
    Differentiable — the loss backward re-enters through these convs."""
    from .fast_path_q8 import _maxpool2x_any, _vgg_q8_layers

    convs, program, tap_idx = _vgg_q8_layers(vgg_params, 4)
    x = x_l.astype(dtype)
    taps = []
    for li, (k, b) in enumerate(convs):
        pre, act = program[li]
        if pre == "pool":
            x = _maxpool2x_any(x)
        x = _reflect_conv_halo_std(x, k.astype(dtype), b.astype(dtype),
                                   axis, n_shards, act=act)
        if li in tap_idx:
            taps.append(x)
    return taps


def _tap_stats_spatial(x_l, axis: str, n_shards: int, eps: float = 1e-5):
    """(mean, std) each (N, C) f32 over the GLOBAL H*W of a sharded tap —
    ``ops.stats.calc_mean_std`` semantics (unbiased variance, eps inside
    sqrt), local sums psum'd over the spatial axis."""
    n, hh, ww, c = x_l.shape
    m = hh * ww * n_shards
    v = x_l.astype(jnp.float32)
    s1 = jnp.sum(v, axis=(1, 2))
    s2 = jnp.sum(v * v, axis=(1, 2))
    if n_shards > 1:
        s1 = jax.lax.psum(s1, axis)
        s2 = jax.lax.psum(s2, axis)
    mean = s1 / m
    var = (s2 - m * mean * mean) / max(m - 1, 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    return mean, std


def _perceptual_rp_losses_spatial(vgg_params, stylized_l, style_l,
                                  content_l, axis: str, n_shards: int,
                                  data_axis, data_shards: int, dtype):
    """``models.base.perceptual_rp_losses`` on H-shards: style-stat MSE
    over relu1..4_1 + relu4_1 content MSE (reference adain_rp.py:321-345),
    every reduction assembled from local sums + psum so the returned
    values are the GLOBAL losses, replicated on every shard.  Parameter
    gradients of the per-shard trace flow only through the shard's local
    terms, so psum-of-grads over all mesh axes reconstructs the exact
    global gradient (the standard SPMD training identity)."""
    n_local = style_l.shape[0]
    n_global = n_local * data_shards

    def all_sum(v):
        if n_shards > 1:
            v = jax.lax.psum(v, axis)
        if data_axis is not None and data_shards > 1:
            v = jax.lax.psum(v, data_axis)
        return v

    def data_sum(v):
        if data_axis is not None and data_shards > 1:
            v = jax.lax.psum(v, data_axis)
        return v

    g_taps = _vgg_taps_spatial(vgg_params, stylized_l, axis, n_shards,
                               dtype)
    sc = jax.lax.stop_gradient(
        jnp.concatenate([style_l, content_l], axis=0))
    t_taps = [jax.lax.stop_gradient(t) for t in
              _vgg_taps_spatial(vgg_params, sc, axis, n_shards, dtype)]

    loss_s = jnp.float32(0.0)
    for g, t in zip(g_taps, t_taps):
        gm, gs = _tap_stats_spatial(g, axis, n_shards)
        tm, ts = _tap_stats_spatial(t[:n_local], axis, n_shards)
        tm, ts = jax.lax.stop_gradient((tm, ts))
        c = gm.shape[-1]
        sq = (jnp.sum((gm - tm) ** 2) + jnp.sum((gs - ts) ** 2))
        loss_s = loss_s + data_sum(sq) / (n_global * c)

    g4 = g_taps[-1].astype(jnp.float32)
    t4 = jax.lax.stop_gradient(t_taps[-1][n_local:]).astype(jnp.float32)
    _, h4, w4, c4 = g4.shape
    loss_c = (all_sum(jnp.sum((g4 - t4) ** 2))
              / (n_global * h4 * w4 * n_shards * c4))
    return {"style_loss": loss_s, "content_loss": loss_c}


def _spatial_loss_and_grads(body, tree, vgg_params, content, style,
                            mesh: Mesh, *, content_weight: float,
                            style_weight: float, dtype, interpret):
    """Shared shard_map loss+grads machinery for the trainable spatial
    folded families.  ``body(tree, c_l, s_l, n_shards) -> stylized_l``
    is the differentiable per-shard forward."""
    axis = "spatial"
    has_spatial = axis in mesh.axis_names
    n_shards = mesh.shape[axis] if has_spatial else 1
    data_axis = "data" if "data" in mesh.axis_names else None
    data_shards = mesh.shape["data"] if data_axis else 1
    assert content.shape[1] % (16 * max(n_shards, 1)) == 0, (
        f"image height {content.shape[1]} must divide into 16*{n_shards} "
        "rows (three VGG pools per shard, >= 2 relu4_1 rows per shard "
        "for the boundary reflection)")
    axes = tuple(a for a, s in ((data_axis, data_shards), (axis, n_shards))
                 if a is not None and s > 1)
    img_spec = P(data_axis, axis if has_spatial else None)

    def shard_fn(tree, vgg_params, c_l, s_l):
        def local_loss(t):
            stylized = body(t, c_l, s_l, n_shards)
            parts = _perceptual_rp_losses_spatial(
                vgg_params, stylized, s_l, c_l, axis, n_shards,
                data_axis, data_shards, dtype)
            total = (content_weight * parts["content_loss"]
                     + style_weight * parts["style_loss"])
            return total, parts

        (total, parts), grads = jax.value_and_grad(
            local_loss, has_aux=True)(tree)
        if axes:
            # Each shard seeds cotangent 1 on its OWN (replicated) loss
            # copy and psum's adjoint is psum, so summing per-shard grads
            # over the mesh yields n·dL/dp for every leaf — pmean, not
            # psum, reconstructs the global gradient exactly (verified
            # against the single-device path in test_spatial_train.py).
            grads = jax.lax.pmean(grads, axes)
        parts = dict(parts)
        parts["total_loss"] = total
        return total, parts, grads

    return jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(), P(), img_spec, img_spec),
                         out_specs=(P(), P(), P()),
                         check_vma=False)(tree, vgg_params, content,
                                          style)


def loss_and_grads_multi_adain_folded_spatial(
        params, vgg_params, content, style, mesh: Mesh, *,
        content_weight: float, style_weight: float, dtype=jnp.bfloat16,
        interpret: bool | None = None):
    """(total, parts, grads) for the flagship folded train step over a
    ``{data?, spatial}`` mesh, in ONE shard_map — forward AND backward run
    the fused Pallas kernels per shard (VERDICT r3 item 3: multi-chip
    training no longer forfeits the fused-kernel +44%).

    Forward: ``_multi_adain_shard_body`` (ppermute halo rows, psum'd
    AdaIN stats) + the spatial perceptual loss above.  Backward: autodiff
    of the per-shard trace — ``folded_conv_act_halo``'s VJP returns the
    virtual-row cotangents, the ppermute/``_row_ring`` transposes ship
    them to the neighbor's edge rows / fold them into the reflect-pad
    adjoint, and the returned per-shard parameter grads pmean over every
    mesh axis.  Gradient equality vs the single-device fused path is
    pinned in tests/test_spatial_train.py."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def body(p, c_l, s_l, n_shards):
        return _multi_adain_shard_body(p, c_l, s_l, n_shards, dtype,
                                       interpret)

    return _spatial_loss_and_grads(
        body, params, vgg_params, content, style, mesh,
        content_weight=content_weight, style_weight=style_weight,
        dtype=dtype, interpret=interpret)


def loss_and_grads_ccam_folded_spatial(
        params, vgg_params, content, style, mesh: Mesh, *,
        stylized_layers: int, content_weight: float, style_weight: float,
        dtype=jnp.bfloat16, interpret: bool | None = None):
    """CCAMRP spatial folded train step (reference adain_rp.py:348-422):
    same machinery as the flagship with psum'd cross-channel energies in
    the forward; the CCAM inputs are stop-gradient (the reference's
    detach), so gradients flow to the convs and the registered ``scale``
    params only (no batch-coupled state under the folded gate).
    Gradient equality pinned in test_spatial_train.py."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def body(p, c_l, s_l, n_shards):
        return _ccam_shard_body({"params": p}, c_l, s_l, n_shards,
                                stylized_layers, dtype, interpret)

    return _spatial_loss_and_grads(
        body, params, vgg_params, content, style, mesh,
        content_weight=content_weight, style_weight=style_weight,
        dtype=dtype, interpret=interpret)


# ---------------------------------------------------------------------------
# SELastRP spatial folded TRAINING (train-mode BatchNorm over the mesh)
# ---------------------------------------------------------------------------

def _folded_bn_train_spatial(x_l, params, stats, axes_info,
                             momentum: float = 0.9, eps: float = 1e-5):
    """``fast_path._folded_bn_train`` with the batch statistics psum'd
    over every mesh axis in ``axes_info`` [(axis, n_shards), ...]: BN
    batch stats are global over (batch, H, W, sub-position), so the
    local sums combine exactly and the running-stat update is computed
    identically (replicated) on every shard."""
    from ..ops.folded import folded_channel_affine

    n, hh, ww, c4 = x_l.shape
    c = c4 // 4
    v = x_l.astype(jnp.float32).reshape(n, hh * ww, 4, c)
    s1 = jnp.sum(v, axis=(0, 1, 2))
    s2 = jnp.sum(jnp.square(v), axis=(0, 1, 2))
    cnt = n * hh * ww * 4
    for ax, sh in axes_info:
        if sh > 1:
            s1 = jax.lax.psum(s1, ax)
            s2 = jax.lax.psum(s2, ax)
            cnt *= sh
    mean = s1 / cnt
    var = s2 / cnt - jnp.square(mean)
    scale = params["scale"].astype(jnp.float32) / jnp.sqrt(var + eps)
    shift = params["bias"].astype(jnp.float32) - mean * scale
    y = folded_channel_affine(x_l, scale.astype(x_l.dtype),
                              shift.astype(x_l.dtype))
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var,
    }
    return y, new_stats


def _se_bottleneck_train_spatial(x_f, params, stats, dtype, axis: str,
                                 n_shards: int, axes_info):
    """Train-mode ``fast_path._folded_se_bottleneck_train`` on an
    H-shard: batch-stat BatchNorm psum'd over the mesh, halo-exchanged
    3x3 zero conv, psum'd SE global pool.  Returns (y_f, new_stats)."""
    from ..ops.folded import (fold_conv1x1_kernel, fold_conv_kernel,
                              folded_channel_affine, folded_zero_conv)

    f32 = jnp.float32
    residual = x_f
    new_stats = {}
    k1 = fold_conv1x1_kernel(params["conv1"]["kernel"]).astype(dtype)
    out, new_stats["bn1"] = _folded_bn_train_spatial(
        folded_zero_conv(x_f, k1), params["bn1"], stats["bn1"], axes_info)
    out = jax.nn.relu(out)
    k2 = fold_conv_kernel(params["conv2"]["kernel"]).astype(dtype)
    out, new_stats["bn2"] = _folded_bn_train_spatial(
        _zero_conv_halo(out, k2, axis, n_shards), params["bn2"],
        stats["bn2"], axes_info)
    out = jax.nn.relu(out)
    k3 = fold_conv1x1_kernel(params["conv3"]["kernel"]).astype(dtype)
    out, new_stats["bn3"] = _folded_bn_train_spatial(
        folded_zero_conv(out, k3), params["bn3"], stats["bn3"], axes_info)
    se = params["SELayer_0"]
    y = _channel_pool_spatial(out, axis, n_shards)
    y = jax.nn.relu(y @ se["Dense_0"]["kernel"].astype(f32))
    y = jax.nn.sigmoid(y @ se["Dense_1"]["kernel"].astype(f32))
    out = folded_channel_affine(out, y.astype(out.dtype))
    return jax.nn.relu(out + residual), new_stats


def _sel_shard_body_train(variables, c_l, s_l, n_shards: int, axes_info,
                          dtype, interpret: bool):
    """Per-shard train-mode SELastRP forward (running AdaIN re-fusion,
    train SE bottleneck before the final decoder block — reference
    adain_rp.py:451-481).  Returns (stylized_l, muts)."""
    params = variables["params"]
    stats = variables["batch_stats"]["attention_block"]
    enc = _folded_blocks(params["ms"]["rp_shared_encoder"])
    dec = _folded_blocks(params["ms"]["rp_decoder"])
    conv = lambda x, k, b: _conv_lrelu_halo(
        x, k.astype(dtype), b.astype(dtype), "spatial", n_shards,
        interpret)
    adain = partial(_folded_adain_spatial, axis="spatial",
                    n_shards=n_shards)

    def encode(img):
        x = fold(img.astype(dtype))
        feats = []
        for k, b in enc:
            x = conv(x, k, b)
            feats.append(x)
        return feats

    c_feats = encode(c_l)
    s_feats = encode(s_l)
    stylized = adain(c_feats[-1], s_feats[-1])
    k, b = dec[0]
    stylized = conv(stylized, k, b)
    new_stats = None
    pairs = list(zip(c_feats[:-1], s_feats[:-1]))[::-1]
    for i, (_, sf) in enumerate(pairs):
        stylized = adain(stylized, sf)
        if i == len(pairs) - 1:
            stylized, new_stats = _se_bottleneck_train_spatial(
                stylized, params["attention_block"], stats, dtype,
                "spatial", n_shards, axes_info)
        k, b = dec[i + 1]
        stylized = conv(stylized, k, b)
    muts = {"batch_stats": {"attention_block": new_stats}}
    return unfold(stylized).astype(c_l.dtype), muts


def loss_and_grads_sel_folded_spatial(
        params, batch_stats, vgg_params, content, style, mesh: Mesh, *,
        content_weight: float, style_weight: float, dtype=jnp.bfloat16,
        interpret: bool | None = None):
    """(total, parts, grads, muts) for the SELastRP folded train step
    over a ``{data?, spatial}`` mesh: the spatial shard_map Pallas
    machinery of the flagship plus train-mode BatchNorm whose batch
    statistics psum over the mesh (exactly the single-device stats) and
    whose running-stat updates come back replicated in ``muts``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    axis = "spatial"
    has_spatial = axis in mesh.axis_names
    n_shards = mesh.shape[axis] if has_spatial else 1
    data_axis = "data" if "data" in mesh.axis_names else None
    data_shards = mesh.shape["data"] if data_axis else 1
    assert content.shape[1] % (16 * max(n_shards, 1)) == 0, (
        f"image height {content.shape[1]} must divide into 16*{n_shards}")
    axes = tuple(a for a, s in ((data_axis, data_shards), (axis, n_shards))
                 if a is not None and s > 1)
    axes_info = [(a, s) for a, s in ((data_axis, data_shards),
                                     (axis, n_shards)) if a is not None]
    img_spec = P(data_axis, axis if has_spatial else None)

    def shard_fn(params, batch_stats, vgg_params, c_l, s_l):
        def local_loss(p):
            stylized, muts = _sel_shard_body_train(
                {"params": p, "batch_stats": batch_stats}, c_l, s_l,
                n_shards, axes_info, dtype, interpret)
            parts = _perceptual_rp_losses_spatial(
                vgg_params, stylized, s_l, c_l, axis, n_shards,
                data_axis, data_shards, dtype)
            total = (content_weight * parts["content_loss"]
                     + style_weight * parts["style_loss"])
            return total, (parts, muts)

        (total, (parts, muts)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        if axes:
            grads = jax.lax.pmean(grads, axes)  # see _spatial_loss_and_grads
        parts = dict(parts)
        parts["total_loss"] = total
        return total, parts, grads, muts

    return jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(), P(), P(), img_spec, img_spec),
                         out_specs=(P(), P(), P(), P()),
                         check_vma=False)(params, batch_stats, vgg_params,
                                          content, style)
