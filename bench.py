#!/usr/bin/env python
"""Benchmark: 512px stylized images/sec on one chip for the flagship model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md), so the
comparison point is a FLOPs-derived V100 estimate for the same model
documented in BASELINE.md (constant multiscale AdaIN, rp5/h32, 512px
stylization ≈ 59.4 GFLOP/image ⇒ ~90 img/s at a deliberately generous
35% of V100 fp32 peak — the derivation of record lives in BASELINE.md
"Reference baseline"). vs_baseline = measured / 90.

Extra diagnostics (per-dtype throughput, p50 latency) go to stderr.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))

import jax
import jax.numpy as jnp
import numpy as np

V100_BASELINE_IMG_PER_S = 90.0
IMG = 512


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dtype_name: str, img: int = IMG):
    from rpst.config import load_config
    from rpst.models import build_model
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=5, hidden_dim=32, inception_num=0,
                           attention="none", img_size=img,
                           compute_dtype=dtype_name))
    return build_model(cfg)


def _rand_pair(batch: int, img: int):
    content = jnp.asarray(
        np.random.default_rng(0).random((batch, img, img, 3), np.float32))
    style = jnp.asarray(
        np.random.default_rng(1).random((batch, img, img, 3), np.float32))
    return content, style


def _bench_chained(apply, tree, content, style, iters: int = 10,
                   repeats: int = 3) -> float:
    """Time ``iters`` chained ``apply(tree, c, s)`` passes inside ONE
    jitted fori_loop and fetch a scalar — robust against async dispatch
    and remote-tunnel runtimes where per-call block_until_ready doesn't
    measure compute.  Returns seconds/pass (best of ``repeats``).  This
    is THE timing methodology for every throughput number in BASELINE.md
    — change it here or nowhere."""
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def run_n(tree, content, style, n):
        def body(i, carry):
            c, acc = carry
            # i-dependent input perturbation prevents loop-invariant hoisting
            c = c.at[0, 0, 0, 0].add(1e-12 * i)
            out = apply(tree, c, style)
            return (c, acc + jnp.mean(out))

        _, acc = jax.lax.fori_loop(0, n, body, (content, 0.0))
        return acc

    # compile + warm with the same static n (different n ⇒ different program)
    float(run_n(tree, content, style, iters))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(tree, content, style, iters))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_stylize(bundle, batch: int, iters: int = 20, repeats: int = 3,
                  mode: str = "standard", img: int = None):
    """Flagship stylize throughput via :func:`_bench_chained`.

    ``mode='folded'`` uses the space-to-depth execution strategy
    (``rpst.models.fast_path``) — exact same model/params, ~4x less HBM
    traffic at hidden_dim=32 (see BASELINE.md). ``mode='q8'`` adds int8
    PTQ serving (2x MXU rate on v5e; ~59 dB PSNR vs bf16, still within
    the <1e-2 mean-abs-pixel parity target)."""
    img = img or IMG
    rng = jax.random.PRNGKey(0)
    content, style = _rand_pair(batch, img)
    variables = bundle.model.init(rng, content, style, train=False)

    if mode == "q8":
        from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                              stylize_multi_adain_folded_q8)
        # per-tensor absmax needs few images; calibrating on the full
        # serving batch would make calibration peak memory exceed
        # serving peak memory at the large-batch rows (b32/b48)
        scales = calibrate_multi_adain_q8(variables["params"],
                                          content[:min(batch, 8)],
                                          style[:min(batch, 8)])

        def apply(variables, c, s):
            return stylize_multi_adain_folded_q8(variables["params"], scales,
                                                 c, s)
    elif mode == "folded":
        from rpst.models.fast_path import stylize_multi_adain_folded

        def apply(variables, c, s):
            return stylize_multi_adain_folded(variables["params"], c, s)
    else:
        def apply(variables, c, s):
            return bundle.model.apply(variables, c, s, train=False)

    per_pass = _bench_chained(apply, variables, content, style,
                              iters=iters, repeats=repeats)
    return batch / per_pass, per_pass


# Per-family FLOPs-derived V100 denominators (img/s): XLA cost analysis of
# each family's stylize at 512px b1 (tools/flops_estimate.py) divided into
# the same optimistic V100 effective rate used for the flagship
# (15.7 fp32 TFLOPs x 35% ≈ 5.5 TFLOP/s).  GFLOP/img: multi_adain 63.7,
# adain 2508, wct 732, sanet 569, dynamic_sanet 653.
FAMILY_BASELINE_IMG_PER_S = {
    "multi_adain": V100_BASELINE_IMG_PER_S,  # 90 (documented in BASELINE.md)
    "adain": 2.19,
    "wct": 7.51,
    "sanet": 9.67,
    "dynamic_sanet": 8.42,
    "sel_multi_adain": 78.59,  # GFLOP/img 69.9
    "ccam": 79.43,             # GFLOP/img 69.2
    "mst": 86.61,              # GFLOP/img 63.4
    "ld_adain": 0.88,          # GFLOP/img 6232.4 (full-res ConvTranspose)
    "ld_adain2": 6.26,         # GFLOP/img 877.5
    "ld_adain3": 35.88,        # GFLOP/img 153.1
    "ld_adain4": 25.59,        # GFLOP/img 214.7
    "ld_adain5": 24.85,        # GFLOP/img 221.1
    "src": 13.48,              # GFLOP/img 407.7
    "mrf": 1.10,               # GFLOP/img 5008.3 ((HW)^2 affinity)
    "spade": 0.58,             # GFLOP/img 9413.2
    "seg_adain": 2.19,         # GFLOP/img 2508.1
}


def _family_sweep(label: str, network: str, make_apply, batches, img,
                  iters: int = 10):
    """Shared per-family sweep: one log line per batch, failures contained
    per-batch (model init and calibration run inside the try — a broken
    family must not abort the --all sweep).  ``make_apply(content, style)``
    returns ``(apply, tree)`` for :func:`_bench_chained`."""
    base = FAMILY_BASELINE_IMG_PER_S.get(network)
    if base is not None and img != IMG:
        # the denominators are FLOPs-derived at 512px; conv FLOPs scale
        # linearly with pixel count (the quadratic attention/affinity paths
        # scale faster, so this understates our advantage at high res)
        base *= (IMG / img) ** 2
    for batch in batches:
        try:
            # inside the try: _rand_pair device-puts, which can itself
            # raise RESOURCE_EXHAUSTED under tunnel-server heap drift
            content, style = _rand_pair(batch, img)
            apply, tree = make_apply(content, style)
            per = _bench_chained(apply, tree, content, style, iters=iters)
            vs = f", vs_baseline {batch/per/base:.2f}x" if base else ""
            log(f"[all] {label} {img}px batch={batch}: "
                f"{batch/per:.2f} img/s ({per*1e3:.1f} ms/pass){vs}")
        except Exception as e:
            log(f"[all] {label} {img}px batch={batch}: "
                f"{type(e).__name__}: {str(e)[:120]}")
    # drop this family's compiled executables (and their device-side
    # buffers) — the long --all sweep otherwise accumulates server-side
    # heap until an innocent device_put hits RESOURCE_EXHAUSTED
    # (observed 2026-08-19 at the 20th program of the sweep)
    jax.clear_caches()


def bench_family(network: str, batches=(1, 4), img=IMG, **cfg_over):
    """Secondary per-family throughput (stderr only): every registry
    family at 512px, bf16, through ``bundle.stylize``."""
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params

    cfg = load_config(dict(network=network, img_size=img,
                           compute_dtype="bfloat16", **cfg_over))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)

    def make_apply(content, style):
        _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
        variables = bundle.init(rng, content, style, vgg_vars)

        def apply(tree, c, s):
            v, g = tree
            return bundle.stylize(v, g, c, s)

        return apply, (variables, vgg_vars)

    _family_sweep(network, network, make_apply, batches, img)


def bench_std_q8(network: str, batches=(1, 4), img=IMG, **cfg_over):
    """adain/wct/mrf/seg_adain/ld_adain int8 PTQ serving (standard-layout
    wide-channel Pallas kernel, fast_path_q8.stylize_adain_q8 /
    stylize_wct_q8; ld_adain adds XLA int8 7x7 bigs + the conv_impl
    batch gate, stylize_ld_q8) — stderr only."""
    from functools import partial
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.models import fast_path_q8 as q8

    cfg = load_config(dict(network=network, img_size=img,
                           compute_dtype="bfloat16", **cfg_over))
    if network == "wct":
        calibrate = partial(q8.calibrate_wct_q8, method=cfg.wct_method)
        stylize = partial(q8.stylize_wct_q8, method=cfg.wct_method)
    elif network == "mrf":
        calibrate = q8.calibrate_mrf_q8
        stylize = q8.stylize_mrf_q8
    elif network == "seg_adain":
        calibrate = lambda p, c, s: q8.calibrate_adain_q8(
            p["adain_rp"], c, s)
        stylize = lambda p, sc, c, s: q8.stylize_adain_q8(
            p["adain_rp"], sc, c, s)
    elif network == "ld_adain":
        calibrate = partial(q8.calibrate_ld_q8,
                            stylized_layers=cfg.stylized_layers)
        stylize = partial(q8.stylize_ld_q8,
                          stylized_layers=cfg.stylized_layers)
    elif network == "ld_adain2":
        calibrate = partial(q8.calibrate_ld2_q8,
                            stylized_layers=cfg.stylized_layers)
        stylize = partial(q8.stylize_ld2_q8,
                          stylized_layers=cfg.stylized_layers)
    else:
        calibrate = q8.calibrate_adain_q8
        stylize = q8.stylize_adain_q8
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)

    def make_apply(content, style):
        from functools import partial as _p
        variables = jax.jit(_p(bundle.model.init, train=False))(
            rng, content, style)
        params = variables["params"]
        scales = calibrate(params, content, style)

        def apply(params, c, s):
            return stylize(params, scales, c, s)

        return apply, params

    _family_sweep(f"{network}-q8", network, make_apply, batches, img)


def bench_engine_q8(network: str, batches=(1, 4), img=IMG, **cfg_over):
    """Any-family int8 PTQ serving through the serving engine
    (rpst.serving.calibrate_scales/make_run_impl — the exact dispatch
    serve.py --mode q8 runs); used for the families without a dedicated
    wrapper above (mst, spade)."""
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.serving import calibrate_scales, make_run_impl

    cfg = load_config(dict(network=network, img_size=img,
                           compute_dtype="bfloat16", **cfg_over))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)

    def make_apply(content, style):
        _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
        variables = bundle.init(rng, content, style, vgg_vars)
        scales = calibrate_scales(bundle, cfg, variables, vgg_vars,
                                  content, style)
        run_impl = make_run_impl(bundle, cfg, "q8", scales, vgg_vars)
        return run_impl, variables

    _family_sweep(f"{network}-q8", network, make_apply, batches, img)


def bench_train(exec_strategy: str, batch: int, iters: int = 10,
                repeats: int = 3, img: int = None, label: str = "",
                **cfg_over):
    """Full train-step throughput (stderr): loss + 3xVGG + grads + Adam.

    ``cfg_over`` A/Bs training knobs (e.g. ``train_q8_targets=True`` —
    the no-grad style/content VGG loss targets through the chained-int8
    encoder; ``remat=True``)."""
    from functools import partial
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.train import create_train_state
    from rpst.train.step import make_train_step

    img = img or IMG
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=5, hidden_dim=32, inception_num=0,
                           attention="none", img_size=img, batch_size=batch,
                           compute_dtype="bfloat16",
                           exec_strategy=exec_strategy, **cfg_over))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    content = jnp.asarray(np.random.default_rng(0).random(
        (batch, img, img, 3), np.float32))
    style = jnp.asarray(np.random.default_rng(1).random(
        (batch, img, img, 3), np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=4)
    if cfg.get("train_q8_targets", False):
        from rpst.models.fast_path_q8 import calibrate_vgg_targets_q8
        bundle.q8_target_scales = calibrate_vgg_targets_q8(
            vgg_vars, content, style)
    state, tx = create_train_state(bundle, rng, content, style, vgg_vars)
    tcache = None
    if cfg_over.get("target_cache"):
        # steady-state device-resident target cache: warm once (miss),
        # then every timed step takes the hit path — per-step slot
        # bookkeeping + gathers included, as in real training
        from rpst.train.target_cache import DeviceTargetCache
        tcache = DeviceTargetCache(
            img_size=img, dtype=bundle._folded_dtype(),
            content_slots=max(int(cfg_over["target_cache"]), batch),
            style_slots=max(64, batch))
        keys = list(range(batch))
        step = make_train_step(bundle, tx, with_targets=True)
        t = tcache.targets_for_batch(vgg_vars, style, content, keys, keys)
        state, parts = step(state, vgg_vars, content, style, t)
    else:
        step = make_train_step(bundle, tx)
        state, parts = step(state, vgg_vars, content, style)
    float(parts["total_loss"])  # axon: block_until_ready doesn't sync
    best = float("inf")
    for _ in range(repeats):
        # async-dispatch the whole window, sync ONCE at the end — measures
        # device step time, not per-step host/tunnel round trips (real
        # training only fetches losses every log_iter steps)
        t0 = time.perf_counter()
        if tcache is not None:
            for _ in range(iters):
                t = tcache.targets_for_batch(vgg_vars, style, content,
                                             keys, keys)
                state, parts = step(state, vgg_vars, content, style, t)
        else:
            for _ in range(iters):
                state, parts = step(state, vgg_vars, content, style)
        float(parts["total_loss"])
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    tag = f" {label}" if label else ""
    log(f"[train] {exec_strategy}{tag} {img}px batch={batch}: "
        f"{batch/per:.2f} img/s ({per*1e3:.1f} ms/step)")
    jax.clear_caches()


def bench_vgg_q8(network: str, batches=(1, 4), img=IMG, **cfg_over):
    """sanet / dynamic_sanet / src int8 PTQ serving (chained-int8 VGG
    encode + int8 mirror decode, fast_path_q8.stylize_sanet_q8 /
    stylize_src_q8) — stderr only."""
    from functools import partial
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.models import fast_path_q8 as q8
    from rpst.nn.vgg import init_vgg_params

    cfg = load_config(dict(network=network, img_size=img,
                           compute_dtype="bfloat16", **cfg_over))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    adaptive = network == "dynamic_sanet"

    def make_apply(content, style):
        _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
        variables = bundle.init(rng, content, style, vgg_vars)
        if network == "src":
            calibrate = partial(q8.calibrate_src_q8,
                                variables["params"], vgg_vars)
            stylize = partial(q8.stylize_src_q8, variables["params"],
                              vgg_vars)
        else:
            calibrate = partial(q8.calibrate_sanet_q8, variables,
                                vgg_vars, adaptive=adaptive,
                                ada_module=cfg.ada_module)
            stylize = partial(q8.stylize_sanet_q8, variables, vgg_vars,
                              adaptive=adaptive, ada_module=cfg.ada_module)
        scales = calibrate(content, style)

        # scales/variables/vgg_vars are closed over (jit constants — the
        # replay reads scales as concrete floats), matching the original
        # harness; the tree slot carries nothing
        def apply(_, c, s):
            return stylize(scales, c, s)

        return apply, jnp.float32(0)

    _family_sweep(f"{network}-q8", network, make_apply, batches, img)


def _require_responsive_backend(timeout_s: int = 180):
    """Fail FAST when backend init would hang.

    A half-open TPU tunnel makes PJRT client creation block indefinitely
    (observed 2026-08-18: ``jax.devices()`` hung >10 min with zero CPU).
    Probe device enumeration in a subprocess with a timeout; exit(2) with
    a diagnostic instead of hanging the driver's bench run."""
    import os
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.device_count())"],
            capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ))
        if r.returncode == 0:
            return
        log(f"backend probe failed rc={r.returncode}: {r.stderr[-300:]}")
    except subprocess.TimeoutExpired:
        log(f"backend probe hung >{timeout_s}s (TPU tunnel down/half-open) "
            "— refusing to bench")
    sys.exit(2)


def main():
    _require_responsive_backend()
    if "--hires" in sys.argv:
        # 1024/2048px (4x/16x the reference's pixel count) through the
        # fast paths — the production high-res serving claim on one chip
        for img in (1024, 2048):
            bundle = build("bfloat16", img=img)
            for mode in ("q8", "folded"):
                for batch in ((1, 2) if img == 1024 else (1,)):
                    try:
                        ips, med = bench_stylize(bundle, batch, iters=10,
                                                 mode=mode, img=img)
                        log(f"[hires] {img}px {mode} batch={batch}: "
                            f"{ips:.1f} img/s ({med*1e3:.1f} ms/pass)")
                    except Exception as e:
                        log(f"[hires] {img}px {mode} b{batch}: "
                            f"{type(e).__name__}: {str(e)[:120]}")
        return
    if "--train" in sys.argv:
        for strat in ("folded", "standard"):
            for batch in (8, 4, 1):
                bench_train(strat, batch)
        # A/B rows (VERDICT r3 item 2): int8 no-grad VGG loss targets,
        # remat memory/throughput, and 1024px training
        for batch in (8, 4, 1):
            bench_train("folded", batch, label="q8tgt",
                        train_q8_targets=True)
        for batch in (4, 1):
            bench_train("folded", batch, img=1024, label="1024")
            bench_train("folded", batch, img=1024, label="1024+q8tgt",
                        train_q8_targets=True)
        bench_train("folded", 4, label="remat", remat=True)
        bench_train("folded", 8, label="remat", remat=True)
        return
    if "--all" in sys.argv:
        # secondary sweep: other model families + high-res scaling
        bench_family("wct", rp_blocks=5, hidden_dim=16,
                     enc_stack_way="deeper")
        bench_std_q8("wct", rp_blocks=5, hidden_dim=16,
                     enc_stack_way="deeper")
        bench_family("sanet")
        bench_vgg_q8("sanet")
        bench_family("dynamic_sanet")
        bench_vgg_q8("dynamic_sanet")
        bench_family("adain", rp_blocks=5, hidden_dim=32)
        bench_std_q8("adain", rp_blocks=5, hidden_dim=32)
        bench_family("sel_multi_adain", enc_stack_way="constant",
                     rp_blocks=5, hidden_dim=32, inception_num=0,
                     attention="none", exec_strategy="folded")
        bench_family("ccam", enc_stack_way="constant", rp_blocks=5,
                     hidden_dim=32, inception_num=0, attention="none",
                     exec_strategy="folded")
        bench_family("mst", enc_stack_way="constant", rp_blocks=5,
                     hidden_dim=32, stylized_layers=1,
                     exec_strategy="folded")
        bench_engine_q8("mst", enc_stack_way="constant", rp_blocks=5,
                        hidden_dim=32, stylized_layers=1,
                        exec_strategy="folded")
        bench_family("ld_adain", hidden_dim=16, ld_layer_num=5,
                     stylized_layers=5)
        bench_std_q8("ld_adain", hidden_dim=16, ld_layer_num=5,
                     stylized_layers=5, use_mask=False)
        bench_family("ld_adain2", hidden_dim=8, ld_layer_num=5)
        bench_std_q8("ld_adain2", hidden_dim=8, ld_layer_num=5,
                     use_mask=False)
        bench_family("ld_adain3", hidden_dim=32, ld_layer_num=5,
                     stylized_layers=5)
        bench_family("ld_adain4", hidden_dim=32, ld_layer_num=5)
        bench_family("ld_adain5", hidden_dim=32, ld_layer_num=5)
        bench_family("src", hidden_dim=32)
        bench_vgg_q8("src", hidden_dim=32)
        bench_family("mrf")
        bench_std_q8("mrf")
        bench_family("spade")
        bench_engine_q8("spade")
        bench_family("seg_adain")
        bench_std_q8("seg_adain")
        bench_family("dynamic_sanet", batches=(1,), img=1024)
        bench_family("multi_adain", batches=(1, 4), img=1024,
                     enc_stack_way="constant", rp_blocks=5, hidden_dim=32,
                     inception_num=0, attention="none",
                     exec_strategy="folded")
        bench_engine_q8("multi_adain", batches=(1, 2), img=1024,
                        enc_stack_way="constant", rp_blocks=5,
                        hidden_dim=32, inception_num=0, attention="none",
                        exec_strategy="folded")
        return
    log(f"devices: {jax.devices()}")
    results = {}
    variants = (("int8-folded", "bfloat16", "q8"),
                ("bfloat16-folded", "bfloat16", "folded"),
                ("bfloat16", "bfloat16", "standard"))
    for name, dtype, mode in variants:
        bundle = build(dtype)
        best_ips, best_batch, p50_b1 = 0.0, 0, None
        # large batches keep amortizing per-dispatch/per-step cost well
        # past 8 (measured 2026-08-20: b8 529 -> b24 652 -> b48 713
        # img/s int8; b64 OOM) — throughput serving runs the big-batch
        # rows, the p50 latency row stays batch 1
        batches = (1, 8, 32, 48) if mode == "q8" else (1, 8)
        for batch in batches:
            try:
                ips, med = bench_stylize(bundle, batch, mode=mode,
                                         iters=10 if batch <= 8 else 6)
            except Exception as e:  # transient device OOM etc. — the
                # other batch sizes may still succeed (shared-device
                # free memory fluctuates; observed 2026-08-18)
                log(f"{name} batch={batch}: {type(e).__name__}: "
                    f"{str(e)[:120]}")
                continue
            log(f"{name} batch={batch}: {ips:.2f} img/s "
                f"(median {med*1e3:.1f} ms)")
            if batch == 1:
                p50_b1 = med
            if ips > best_ips:
                best_ips, best_batch = ips, batch
        jax.clear_caches()
        results[name] = (best_ips, best_batch, p50_b1)

    best_name = max(results, key=lambda d: results[d][0])
    ips, batch, p50 = results[best_name]
    p50_txt = f"{p50*1e3:.1f} ms" if p50 is not None else "n/a"
    log(f"best: {best_name} batch={batch} {ips:.2f} img/s; "
        f"p50 batch-1 latency {p50_txt}")
    print(json.dumps({
        "metric": f"512px stylized images/sec/chip "
                  f"(multi_adain constant rp5/h32, {best_name}, "
                  f"batch {batch})",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / V100_BASELINE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
