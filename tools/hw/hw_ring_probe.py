#!/usr/bin/env python
"""Micro-probe: which in-kernel int8 ring-row construction lowers
correctly on hardware?  (fused_folded_conv2_q8's layer-2 ring rows come
out corrupt on chip while interpret is bit-exact.)

Each variant builds a (R, W, C4) int8 buffer from an input value where
row 0 must become [row2 first-half-lanes | row1 second-half] and writes
it out; compared against the numpy composition.
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "src"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W, C4 = 18, 256, 128
HALF = C4 // 2


def lane_sel(a, b):
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane < HALF, a, b)


def k_where(x_ref, o_ref):  # V1: value-domain row-iota where
    v = x_ref[...]
    ring = lane_sel(v[2], v[1])
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0)
    i = pl.program_id(0)
    v = jnp.where(jnp.logical_and(i == 0, row == 0), ring[None], v)
    o_ref[...] = v


def k_pred_store(x_ref, o_ref, scratch):  # V2: scratch + pl.when store
    scratch[...] = x_ref[...]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        scratch[0] = lane_sel(scratch[2], scratch[1])

    o_ref[...] = scratch[...]


def k_uncond_store(x_ref, o_ref, scratch):  # V3: unconditional row store
    v = x_ref[...]
    scratch[...] = v
    i = pl.program_id(0)
    ring = lane_sel(v[2], v[1])
    row0 = jnp.where(i == 0, ring, v[0])
    scratch[0] = row0
    o_ref[...] = scratch[...]


def k_value_only(x_ref, o_ref):  # V4: pure value concat rows
    v = x_ref[...]
    ring = lane_sel(v[2], v[1])
    i = pl.program_id(0)
    row0 = jnp.where(i == 0, ring, v[0])
    o_ref[...] = jnp.concatenate([row0[None], v[1:]], axis=0)


def run(name, kernel, scratch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (1, R, W, C4)).astype(np.int8))
    ref = np.asarray(x[0]).copy()
    ref[0, :, :HALF] = ref[2, :, :HALF]
    ref[0, :, HALF:] = ref[1, :, HALF:]
    kw = dict(
        grid=(1,),
        in_specs=[pl.BlockSpec((1, R, W, C4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, W, C4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, W, C4), jnp.int8),
    )
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM((R, W, C4), jnp.int8)]

    def body(k_fn, x):
        def k(x_ref, o_ref, *s):
            if scratch:
                k_fn(x_ref.at[0], o_ref.at[0], *s)
            else:
                k_fn(x_ref.at[0], o_ref.at[0])
        return pl.pallas_call(k, **kw)(x)

    got = np.asarray(jax.jit(functools.partial(body, kernel))(x))[0]
    err = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    bad_rows = np.unique(np.nonzero(err)[0])
    print(f"{'PASS' if err.max() == 0 else 'FAIL'} {name}: "
          f"max|err|={err.max()} bad_rows={bad_rows[:6]}", flush=True)


def main():
    run("V1 value-where", k_where, False)
    run("V2 pred-store", k_pred_store, True)
    run("V3 uncond-store", k_uncond_store, True)
    run("V4 value-concat", k_value_only, False)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# V5: reproduce the REAL kernel's structure — y1q produced by a matmul +
# f32 epilogue + reshape, 2D multi-step grid, DMA'd input slab, ring from
# scratch reads under pl.when — the fused2 layer-2 path minus layer 2.
# ---------------------------------------------------------------------------

def probe_v5(nblocks=4, br=16):
    rng = np.random.default_rng(1)
    h = nblocks * br
    x = jnp.asarray(rng.integers(-5, 6, (1, h + 2, W, C4)).astype(np.int8))
    w1 = jnp.asarray(rng.integers(-3, 4, (C4, C4)).astype(np.int8))

    def kernel(x_hbm, w_ref, o_ref, y1s, scratch, sem):
        i = pl.program_id(1)
        c = pltpu.make_async_copy(
            x_hbm.at[0, pl.ds(i * br, br + 2)], scratch.at[0], sem.at[0])
        c.start()
        c.wait()
        slab = scratch[0]
        acc = jax.lax.dot_general(
            slab.reshape((br + 2) * W, C4), w_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * 0.01
        y = jnp.where(y >= 0, y, 0.2 * y)
        yq = jnp.clip(jnp.round(y * 8.0), -127, 127).astype(jnp.int8)
        yq = yq.reshape(br + 2, W, C4)
        y1s[...] = yq

        @pl.when(i == 0)
        def _():
            y1s[0] = lane_sel(y1s[2], y1s[1])

        @pl.when(i == pl.num_programs(1) - 1)
        def _():
            y1s[br + 1] = lane_sel(y1s[br], y1s[br - 1])

        o_ref[0] = y1s[...]

    out = pl.pallas_call(
        kernel,
        grid=(1, nblocks),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((C4, C4), lambda n, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, br + 2, W, C4),
                               lambda n, i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, br + 2, W, C4), jnp.int8),
        scratch_shapes=[pltpu.VMEM((br + 2, W, C4), jnp.int8),
                        pltpu.VMEM((1, br + 2, W, C4), jnp.int8),
                        pltpu.SemaphoreType.DMA((1,))],
    )(x, w1)
    out = np.asarray(out)

    # numpy reference
    xs = np.asarray(x)[0].astype(np.int32)
    acc = xs.reshape(-1, C4) @ np.asarray(w1).astype(np.int32)
    y = acc.astype(np.float32) * 0.01
    y = np.where(y >= 0, y, 0.2 * y)
    yq = np.clip(np.round(y * 8.0), -127, 127).astype(np.int8)
    yq = yq.reshape(h + 2, W, C4)
    ok = True
    for i in range(nblocks):
        ref = yq[i * br:i * br + br + 2].copy()
        if i == 0:
            ref[0, :, :HALF] = ref[2, :, :HALF]
            ref[0, :, HALF:] = ref[1, :, HALF:]
        if i == nblocks - 1:
            ref[br + 1, :, :HALF] = ref[br, :, :HALF]
            ref[br + 1, :, HALF:] = ref[br - 1, :, HALF:]
        err = np.abs(out[i].astype(np.int32) - ref.astype(np.int32))
        if err.max() > 0:
            rows = np.unique(np.nonzero(err)[0])
            print(f"FAIL V5 block {i}: max|err|={err.max()} rows={rows[:6]}",
                  flush=True)
            ok = False
    if ok:
        print("PASS V5 matmul+grid+scratch ring", flush=True)


if "--v5" in sys.argv or True:
    probe_v5()
