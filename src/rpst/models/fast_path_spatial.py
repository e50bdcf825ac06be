"""Spatially sharded folded serving — sequence parallelism for images.

``stylize_multi_adain_folded_spatial`` runs the flagship folded stylize
(models/fast_path.py) inside ONE ``jax.shard_map`` over a mesh's
``spatial`` axis (image rows), with every cross-shard dependency an
explicit ICI collective:

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
    """One folded conv + bias + lrelu on an H-shard.

    Lane-filling layers run the fused Pallas kernel with the halo rows in
    its ``rings`` slot; boundary layers (3<->hidden channels) take the XLA
    path on the halo-padded slab with local reflect column rings (corners
    fall out as in ``ops.folded.folded_reflect_pad``)."""
    above, below = _halo_rows(x_l, axis, n_shards)
    if (k.shape[2] % 128 == 0 and k.shape[3] % 128 == 0
            and (interpret or jax.default_backend() != "cpu")):
        rings = jnp.concatenate([above, below], axis=1)
        return fused_folded_conv(x_l, k, b, rings=rings,
                                 interpret=interpret)
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
    axis = "spatial"
    assert axis in mesh.axis_names, mesh
    n_shards = mesh.shape[axis]
    assert content.shape[1] % (2 * n_shards) == 0, (
        f"image height {content.shape[1]} must divide into 2*{n_shards} "
        "folded shard rows")
    img_spec = (P("data", axis) if "data" in mesh.axis_names
                else P(None, axis))

    def shard_fn(params, c_l, s_l):
        enc = _folded_blocks(params["rp_shared_encoder"])
        dec = _folded_blocks(params["rp_decoder"])
        conv = lambda x, k, b: _conv_lrelu_halo(
            x, k.astype(dtype), b.astype(dtype), axis, n_shards, interpret)
        adain = partial(_folded_adain_spatial, axis=axis, n_shards=n_shards)

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

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, and the collectives here are hand-placed anyway
    return jax.shard_map(shard_fn, mesh=mesh,
                         in_specs=(P(), img_spec, img_spec),
                         out_specs=img_spec,
                         check_vma=False)(params, content, style)
