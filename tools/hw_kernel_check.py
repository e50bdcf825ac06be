#!/usr/bin/env python
"""On-device numerics check: every Pallas kernel vs its XLA reference.

Interpret mode exercises kernel *semantics* but not Mosaic *lowering* —
the original manual-DMA folded conv passed every interpret test while
producing a corrupt top ring row on real hardware (caught 2026-08-17 by
this tool's diff). Run this on the real chip after ANY kernel change:

    python tools/hw_kernel_check.py

Exit code 0 = all kernels match their XLA references within dtype noise.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, got, ref, atol):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    err = np.abs(got - ref).max()
    ok = err <= atol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max|err| = {err:.3e} "
          f"(atol {atol:.1e}, scale {np.abs(ref).max():.2f})")
    if not ok:
        FAILED.append(name)


def main():
    from rpst.ops.folded import fold_bias, fold_conv_kernel, folded_conv
    from rpst.ops.pallas.folded_conv import fused_folded_conv
    from rpst.ops.pallas.folded_conv_q8 import (fused_folded_conv_q8,
                                                quantize_activations,
                                                quantize_weights)

    rng = np.random.default_rng(0)
    C = 32
    k = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    kf_f32, bf_f32 = fold_conv_kernel(k), fold_bias(b)
    kf, bf = kf_f32.astype(jnp.bfloat16), bf_f32.astype(jnp.bfloat16)

    def ring_ref(x, kf, bf):
        y = folded_conv(x, kf, bf)
        return jnp.where(y >= 0, y, 0.2 * y)

    for bs, h, w in ((1, 256, 256), (2, 64, 256), (1, 32, 256),
                     (1, 64, 1024)):  # w=1024 = 2048px: VMEM-driven BR=2
        x = jnp.asarray(rng.normal(size=(bs, h, w, 4 * C))
                        .astype(np.float32)).astype(jnp.bfloat16)
        ref = jax.jit(ring_ref)(x, kf, bf)
        got = jax.jit(fused_folded_conv)(x, kf, bf)
        # bf16 matmul accumulation reassociation: ~1e-1 on O(20) values
        check(f"fused_folded_conv bf16 b{bs} h{h} w{w}", got, ref, atol=0.25)

    # rings override (the spatial shard_map halo path): custom boundary
    # rows spliced in place of the reflect ring must equal the XLA conv
    # over the halo-padded slab (models/fast_path_spatial.py)
    from rpst.ops.folded import _pad_cols_ring

    for bs, h in ((1, 64), (2, 32)):
        x = jnp.asarray(rng.normal(size=(bs, h, 256, 4 * C))
                        .astype(np.float32)).astype(jnp.bfloat16)
        rings = jnp.asarray(rng.normal(size=(bs, 2, 256, 4 * C))
                            .astype(np.float32)).astype(jnp.bfloat16)

        def halo_ref(x, rings, kf, bf):
            xp = jnp.concatenate([rings[:, :1], x, rings[:, 1:]], axis=1)
            y = jax.lax.conv_general_dilated(
                _pad_cols_ring(xp), kf, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf
            return jnp.where(y >= 0, y, 0.2 * y)

        ref = jax.jit(halo_ref)(x, rings, kf, bf)
        got = jax.jit(lambda x, r: fused_folded_conv(
            x, kf, bf, rings=r))(x, rings)
        check(f"fused_folded_conv rings-override b{bs} h{h}", got, ref,
              atol=0.25)

    # folded-conv backward kernel pair vs XLA autodiff of the ring path
    from rpst.ops.pallas.folded_conv import folded_conv_lrelu

    for bs, h in ((1, 256), (2, 64), (1, 32)):
        xf32 = jnp.asarray(rng.normal(size=(bs, h, 256, 4 * C))
                           .astype(np.float32))
        g32 = jnp.asarray(rng.normal(size=(bs, h, 256, 4 * C))
                          .astype(np.float32))

        def loss_ref(x, kf, bf):
            return jnp.sum(ring_ref(x, kf, bf).astype(jnp.float32) * g32)

        def loss_fused(x, kf, bf):
            return jnp.sum(folded_conv_lrelu(x, kf, bf)
                           .astype(jnp.float32) * g32)

        x16 = xf32.astype(jnp.bfloat16)
        r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(x16, kf, bf)
        f = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(x16, kf, bf)
        # dk/db sum over N*H*W bf16 products — compare relative to scale
        for nm, a, b_, tol in (("dx", f[0], r[0], 0.25),
                               ("dk", f[1], r[1],
                                0.005 * float(jnp.abs(r[1]).max())),
                               ("db", f[2], r[2],
                                0.005 * float(jnp.abs(r[2]).max()))):
            check(f"folded_conv_lrelu bwd {nm} b{bs} h{h}", a, b_, atol=tol)

    # halo custom VJP (spatial shard_map TRAINING): grads w.r.t. x, k, b
    # AND the two virtual boundary rows vs XLA autodiff of the
    # halo-padded conv (fast_path_spatial._conv_lrelu_halo's XLA branch)
    from rpst.ops.folded import _pad_cols_ring as _pcr
    from rpst.ops.pallas.folded_conv import folded_conv_act_halo

    for bs, h in ((1, 64), (2, 32)):
        xf32 = jnp.asarray(rng.normal(size=(bs, h, 256, 4 * C))
                           .astype(np.float32))
        ab32 = jnp.asarray(rng.normal(size=(bs, 1, 256, 4 * C))
                           .astype(np.float32))
        be32 = jnp.asarray(rng.normal(size=(bs, 1, 256, 4 * C))
                           .astype(np.float32))
        gh = jnp.asarray(rng.normal(size=(bs, h, 256, 4 * C))
                         .astype(np.float32))

        def halo_xla(x, kf_, bf_, ab, be):
            xp = jnp.concatenate([ab, x, be], axis=1)
            y = jax.lax.conv_general_dilated(
                _pcr(xp), kf_, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bf_
            return jnp.where(y >= 0, y, 0.2 * y)

        def loss_xla(x, kf_, bf_, ab, be):
            return jnp.sum(halo_xla(x, kf_, bf_, ab, be)
                           .astype(jnp.float32) * gh)

        def loss_halo(x, kf_, bf_, ab, be):
            return jnp.sum(
                folded_conv_act_halo(0.2, False, x, kf_, bf_, ab, be)
                .astype(jnp.float32) * gh)

        args = (xf32.astype(jnp.bfloat16), kf, bf,
                ab32.astype(jnp.bfloat16), be32.astype(jnp.bfloat16))
        r = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))(*args)
        f = jax.jit(jax.grad(loss_halo, argnums=(0, 1, 2, 3, 4)))(*args)
        for nm, a, b_, tol in (
                ("dx", f[0], r[0], 0.25),
                ("dk", f[1], r[1], 0.005 * float(jnp.abs(r[1]).max())),
                ("db", f[2], r[2], 0.005 * float(jnp.abs(r[2]).max())),
                ("dabove", f[3], r[3], 0.25),
                ("dbelow", f[4], r[4], 0.25)):
            check(f"folded_conv_act_halo bwd {nm} b{bs} h{h}", a, b_,
                  atol=tol)

    # int8 kernel vs emulated integer reference
    w_q, w_scale = quantize_weights(kf_f32)
    x_scale = 0.02
    for bs, h in ((1, 64), (2, 32)):
        xf = rng.normal(size=(bs, h, 256, 4 * C)).astype(np.float32) * 2.0
        x_q = quantize_activations(jnp.asarray(xf), x_scale)
        deq = (x_scale * w_scale).astype(jnp.float32)
        sc = jnp.stack([deq, bf_f32.astype(jnp.float32),
                        jnp.zeros_like(deq)])

        def int_ref(x_q):
            # exact integer conv emulated in f32 on the QUANTIZED weights
            y = folded_conv(x_q.astype(jnp.float32),
                            w_q.astype(jnp.float32),
                            jnp.zeros_like(bf_f32))
            y = y * deq + bf_f32
            return jnp.where(y >= 0, y, 0.2 * y)

        ref = jax.jit(int_ref)(x_q)
        got = jax.jit(lambda x_q: fused_folded_conv_q8(
            x_q, w_q, sc, out_int8=False))(x_q)
        check(f"fused_folded_conv_q8 b{bs} h{h}", got, ref, atol=0.25)

        _, s1, s2 = jax.jit(lambda x_q: fused_folded_conv_q8(
            x_q, w_q, sc, out_int8=False, with_stats=True))(x_q)
        rs1 = jnp.sum(ref.astype(jnp.float32), axis=(1, 2))
        rs2 = jnp.sum(ref.astype(jnp.float32) ** 2, axis=(1, 2))
        check(f"fused_folded_conv_q8 stats s1 b{bs} h{h}", s1, rs1,
              atol=0.005 * float(jnp.abs(rs1).max()))
        check(f"fused_folded_conv_q8 stats s2 b{bs} h{h}", s2, rs2,
              atol=0.005 * float(jnp.abs(rs2).max()))

        # wide-K (K=3*C4) contraction must be BIT-exact vs the 9-matmul
        # form on the chip (int32 sums reassociate)
        wide = jax.jit(lambda x_q: fused_folded_conv_q8(
            x_q, w_q, sc, out_int8=False, wide_k=True))(x_q)
        check(f"fused_folded_conv_q8 wideK b{bs} h{h}", wide, got, atol=0.0)

        # triple-buffered slab DMA must be BIT-exact vs depth 2
        d3 = jax.jit(lambda x_q: fused_folded_conv_q8(
            x_q, w_q, sc, out_int8=False, dma_depth=3))(x_q)
        check(f"fused_folded_conv_q8 dma3 b{bs} h{h}", d3, got, atol=0.0)

        # ring rows via DMA (halo slots written by async copy instead of
        # value-domain splices) must be BIT-exact — incl. with stats
        rd = jax.jit(lambda x_q: fused_folded_conv_q8(
            x_q, w_q, sc, out_int8=False, ring_dma=True))(x_q)
        check(f"fused_folded_conv_q8 ring_dma b{bs} h{h}", rd, got,
              atol=0.0)
        _, rs1d, rs2d = jax.jit(lambda x_q: fused_folded_conv_q8(
            x_q, w_q, sc, out_int8=False, with_stats=True,
            ring_dma=True))(x_q)
        check(f"fused_folded_conv_q8 ring_dma stats b{bs} h{h}", rs1d, s1,
              atol=0.0)

    # two-layer fused int8 conv pair: BIT-exact vs two single-layer calls
    # (same matmuls/epilogue/requant; boundary rows recomputed) — incl.
    # the in-kernel layer-2 ring construction and both layers' stats
    from rpst.ops.pallas.folded_conv2_q8 import fused_folded_conv2_q8

    w2_q, w2_scale = quantize_weights(
        jnp.asarray(rng.normal(size=(3, 3, 4 * C, 4 * C))
                    .astype(np.float32) * 0.2))
    b2_f = jnp.asarray(rng.normal(size=(4 * C,)).astype(np.float32))
    o1s, o2s = 0.9, 1.1
    for bs, h in ((1, 64), (2, 32), (1, 16)):
        xf = rng.normal(size=(bs, h, 256, 4 * C)).astype(np.float32) * 2.0
        x_q = quantize_activations(jnp.asarray(xf), x_scale)
        sc1 = jnp.stack([(x_scale * w_scale).astype(jnp.float32),
                         bf_f32.astype(jnp.float32),
                         jnp.broadcast_to(jnp.float32(1.0 / o1s),
                                          w_scale.shape)])
        sc2 = jnp.stack([(o1s * w2_scale).astype(jnp.float32), b2_f,
                         jnp.broadcast_to(jnp.float32(1.0 / o2s),
                                          w2_scale.shape)])
        y1_ref = jax.jit(lambda x: fused_folded_conv_q8(
            x, w_q, sc1, out_int8=True))(x_q)
        y2_ref = jax.jit(lambda y: fused_folded_conv_q8(
            y, w2_q, sc2, out_int8=True))(y1_ref)
        y1, y2 = jax.jit(lambda x: fused_folded_conv2_q8(
            x, w_q, sc1, w2_q, sc2, out_int8=True))(x_q)
        check(f"fused_folded_conv2_q8 y1 b{bs} h{h}", y1, y1_ref, atol=0.0)
        check(f"fused_folded_conv2_q8 y2 b{bs} h{h}", y2, y2_ref, atol=0.0)
        r = jax.jit(lambda x: fused_folded_conv2_q8(
            x, w_q, sc1, w2_q, sc2, out_int8=True, with_stats=True))(x_q)
        _, s1ref1, s2ref1 = jax.jit(lambda x: fused_folded_conv_q8(
            x, w_q, sc1, out_int8=True, with_stats=True))(x_q)
        _, s1ref2, s2ref2 = jax.jit(lambda y: fused_folded_conv_q8(
            y, w2_q, sc2, out_int8=True, with_stats=True))(y1_ref)
        check(f"fused_folded_conv2_q8 stats11 b{bs} h{h}", r[2], s1ref1,
              atol=0.005 * float(jnp.abs(s1ref1).max()))
        check(f"fused_folded_conv2_q8 stats12 b{bs} h{h}", r[3], s2ref1,
              atol=0.005 * float(jnp.abs(s2ref1).max()))
        check(f"fused_folded_conv2_q8 stats21 b{bs} h{h}", r[4], s1ref2,
              atol=0.005 * float(jnp.abs(s1ref2).max()))
        check(f"fused_folded_conv2_q8 stats22 b{bs} h{h}", r[5], s2ref2,
              atol=0.005 * float(jnp.abs(s2ref2).max()))

    # standard-layout int8 conv (wide channels) vs emulated int reference
    from rpst.ops.pallas.conv2d_q8 import fused_conv2d_q8

    for ch, co, bs, h in ((256, 256, 1, 64), (128, 256, 2, 32)):
        ks = jnp.asarray(rng.normal(size=(3, 3, ch, co))
                         .astype(np.float32) * 0.05)
        bs_f = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        w_qs, w_ss = quantize_weights(ks)
        xf = rng.normal(size=(bs, h, 128, ch)).astype(np.float32) * 2.0
        x_qs = quantize_activations(jnp.asarray(xf), x_scale)
        deqs = (x_scale * w_ss).astype(jnp.float32)
        scs = jnp.stack([deqs, bs_f, jnp.zeros_like(deqs)])

        def std_int_ref(x_q):
            xp = jnp.pad(x_q.astype(jnp.float32),
                         ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            y = jax.lax.conv_general_dilated(
                xp, w_qs.astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y * deqs + bs_f
            return jnp.where(y >= 0, y, 0.2 * y)

        ref = jax.jit(std_int_ref)(x_qs)
        got = jax.jit(lambda x_q: fused_conv2d_q8(
            x_q, w_qs, scs, out_int8=False))(x_qs)
        check(f"fused_conv2d_q8 ch{ch}->{co} b{bs} h{h}", got, ref,
              atol=0.25)

        def std_int_ref_zero(x_q):
            y = jax.lax.conv_general_dilated(
                x_q.astype(jnp.float32), w_qs.astype(jnp.float32),
                (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y * deqs + bs_f
            return jnp.maximum(y, 0)

        ref = jax.jit(std_int_ref_zero)(x_qs)
        got = jax.jit(lambda x_q: fused_conv2d_q8(
            x_q, w_qs, scs, out_int8=False, alpha=0.0,
            pad_mode="zero"))(x_qs)
        check(f"fused_conv2d_q8 zero ch{ch}->{co} b{bs} h{h}", got, ref,
              atol=0.25)

        # wide-K form bit-exact vs narrow, both pad modes
        for pm in ("reflect", "zero"):
            a = jax.jit(lambda x_q: fused_conv2d_q8(
                x_q, w_qs, scs, out_int8=False, pad_mode=pm,
                wide_k=False))(x_qs)
            b = jax.jit(lambda x_q: fused_conv2d_q8(
                x_q, w_qs, scs, out_int8=False, pad_mode=pm,
                wide_k=True))(x_qs)
            check(f"fused_conv2d_q8 wideK {pm} ch{ch} b{bs}", b, a,
                  atol=0.0)

    # flash attention fwd + bwd vs the dense reference
    from rpst.ops.pallas.flash_attention import (_dense_attention,
                                                 flash_attention)
    qkv = [jnp.asarray(rng.normal(size=(1, 1024, 512)).astype(np.float32))
           .astype(jnp.bfloat16) * 0.05 for _ in range(3)]

    ref = jax.jit(_dense_attention)(*qkv)
    got = jax.jit(flash_attention)(*qkv)
    check("flash_attention fwd (1024, 512)", got, ref, atol=0.02)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_attention(q, k, v).astype(jnp.float32) ** 2)

    g_got = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(*qkv)
    g_ref = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(*qkv)
    for name, a, b in zip("dq dk dv".split(), g_got, g_ref):
        check(f"flash_attention bwd {name} (1024, 512)", a, b, atol=0.05)

    if FAILED:
        print(f"\n{len(FAILED)} kernel check(s) FAILED: {FAILED}")
        return 1
    print("\nall kernels match on hardware")
    return 0


if __name__ == "__main__":
    sys.exit(main())
