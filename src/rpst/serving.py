"""Production serving: stylize engine + dynamic-batching daemon.

The reference has no serving layer at all (SURVEY §1: "no serving
layer"; its only inference surface is the training-time eval dump,
reference train.py:200-219).  This module is the deployment story on
top of the per-family execution strategies:

  * **engine helpers** — ``resolve_mode`` / ``calibrate_scales`` /
    ``make_run_impl`` pick the fastest supported execution path
    (int8 PTQ > folded bf16 > standard) and build the jit-able
    ``run(variables, content, style) -> stylized`` callable shared by
    the folder sweeper (serve.py) and the daemon,
  * **DynamicBatcher** — coalesces concurrent single-image requests
    into fixed-shape device batches (one compiled program): the first
    request opens a batching window of ``max_wait_ms``; the batch
    dispatches when full or when the window closes, padded to the
    static batch size.  On TPU this is the difference between paying
    per-dispatch latency per image and amortizing it 8-way (BASELINE.md:
    b1 3.8 ms vs b8 13.8 ms ⇒ 266 vs 578 img/s on the flagship),
  * **serve_daemon** — a line-delimited-JSON TCP loop over the batcher:
    decode in per-connection threads (host IO overlaps device compute),
    one reply per request with per-request latency.

Protocol (one JSON object per line, localhost TCP):

  request   {"id": "r1", "content": "/path/c.png", "style": "/path/s.png"}
  reply     {"id": "r1", "ok": true, "out": "<out_dir>/r1.png", "ms": 12.3}
  stats     {"cmd": "stats"}  ->  {"served": N, "batches": M, ...}
  shutdown  {"cmd": "shutdown"}
"""

from __future__ import annotations

import json
import socketserver
import threading
import time
from concurrent.futures import Future
from pathlib import Path
from queue import Empty, Queue
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .train.metrics import logger, save_image


# ---------------------------------------------------------------------------
# Engine: execution-mode resolution, calibration, run_impl construction
# ---------------------------------------------------------------------------

def resolve_mode(bundle, mode: str, batch: int | None = None,
                 q8_native: bool | None = None) -> str:
    """Resolve ``--mode`` (incl. ``auto``) against the bundle's coverage.

    ``auto`` picks the measured-fastest path this network supports AT
    THIS BATCH (the crossover table in ``rpst.policy`` — e.g. ld_adain2
    serves bf16 at b1 and q8 from b2) — but only counts q8 where its
    Pallas kernels compile natively (on the CPU backend they'd run in
    interpret mode, orders of magnitude slower than standard).
    ``q8_native`` overrides the backend check (tests)."""
    if mode == "auto":
        if q8_native is None:
            q8_native = jax.default_backend() != "cpu"
        mode = ("q8" if q8_native and bundle.q8_recommended(batch)
                else "folded" if bundle.folded_infer() else "standard")
        logger.info(f"--mode auto resolved to {mode}"
                    + (f" (batch {batch})" if batch else ""))
    fast_ok = bundle.q8_infer() if mode == "q8" else bundle.folded_infer()
    if mode in ("folded", "q8") and not fast_ok:
        logger.warning(f"--mode {mode} is unsupported for this network/"
                       "config (coverage: serve.py docstring); falling "
                       "back to standard")
        mode = "standard"
    return mode


def calibrate_scales(bundle, cfg, variables, vgg_vars, calib, calib_style):
    """One-shot PTQ calibration for ``mode='q8'`` on a representative
    batch — dispatches to the family's calibrator (fast_path_q8).

    On device RESOURCE_EXHAUSTED the pass retries once with a single
    calibration image: the shared-device free memory fluctuates
    (observed 2026-08-18 — identical capped passes alternated between
    success and OOM), and per-tensor absmax scales from one image are a
    strictly better outcome than a dead serving process."""
    try:
        return _calibrate_scales(bundle, cfg, variables, vgg_vars,
                                 calib, calib_style)
    except Exception as e:
        if "RESOURCE_EXHAUSTED" not in str(e) or calib.shape[0] <= 1:
            raise
        logger.warning("calibration hit RESOURCE_EXHAUSTED; retrying "
                       "with a single-image batch")
        return _calibrate_scales(bundle, cfg, variables, vgg_vars,
                                 calib[:1], calib_style[:1])


def _calibrate_scales(bundle, cfg, variables, vgg_vars, calib, calib_style):
    from .models import fast_path_q8 as q8

    net = bundle.network
    if net == "sel_multi_adain":
        return q8.calibrate_sel_multi_adain_q8(variables, calib, calib_style)
    if net == "ccam":
        return q8.calibrate_ccam_q8(variables, calib, calib_style,
                                    stylized_layers=cfg.stylized_layers)
    if net == "adain":
        return q8.calibrate_adain_q8(variables["params"], calib, calib_style)
    if net == "seg_adain":
        return q8.calibrate_adain_q8(variables["params"]["adain_rp"],
                                     calib, calib_style)
    if net == "wct":
        return q8.calibrate_wct_q8(variables["params"], calib, calib_style,
                                   method=cfg.wct_method,
                                   wct_dtype=jnp.dtype(cfg.wct_dtype))
    if net in ("sanet", "dynamic_sanet"):
        return q8.calibrate_sanet_q8(
            variables, vgg_vars, calib, calib_style,
            adaptive=net == "dynamic_sanet", ada_module=cfg.ada_module,
            blockwise=cfg.get("adaptive_blockwise", "auto"))
    if net == "src":
        return q8.calibrate_src_q8(variables["params"], vgg_vars, calib,
                                   calib_style)
    if net == "mrf":
        return q8.calibrate_mrf_q8(variables["params"], calib, calib_style)
    if net == "mst":
        return q8.calibrate_mst_q8(
            variables["params"], calib, calib_style,
            stylized_layers=cfg.stylized_layers,
            n_clusters=cfg.n_clusters, mst_lambda=cfg.mst_lambda)
    if net == "spade":
        return q8.calibrate_spade_q8(variables["params"], calib, calib_style)
    if net == "ld_adain":
        return q8.calibrate_ld_q8(variables["params"], calib, calib_style,
                                  stylized_layers=cfg.stylized_layers)
    if net == "ld_adain2":
        return q8.calibrate_ld2_q8(variables["params"], calib, calib_style,
                                   stylized_layers=cfg.stylized_layers)
    return q8.calibrate_multi_adain_q8(variables["params"], calib,
                                       calib_style)


def make_run_impl(bundle, cfg, mode: str, scales, vgg_vars,
                  q8_interpret: bool = False) -> Callable:
    """Build ``run_impl(variables, content, style) -> stylized`` for the
    resolved mode (jit it — optionally with mesh shardings — at the call
    site)."""
    if mode != "q8":
        # folded mode routes through bundle.stylize (exec_strategy=folded
        # picks the family's folded fast path; standard stays standard)
        return lambda v, c, s: bundle.stylize(v, vgg_vars, c, s)

    from .models import fast_path_q8 as q8

    net = bundle.network

    def run_impl(variables, content, style):
        if net == "sel_multi_adain":
            return q8.stylize_sel_multi_adain_folded_q8(
                variables, scales, content, style, interpret=q8_interpret)
        if net == "ccam":
            return q8.stylize_ccam_folded_q8(
                variables, scales, content, style,
                stylized_layers=cfg.stylized_layers, interpret=q8_interpret)
        if net == "adain":
            return q8.stylize_adain_q8(variables["params"], scales,
                                       content, style,
                                       interpret=q8_interpret)
        if net == "seg_adain":
            return q8.stylize_adain_q8(variables["params"]["adain_rp"],
                                       scales, content, style,
                                       interpret=q8_interpret)
        if net == "wct":
            return q8.stylize_wct_q8(variables["params"], scales, content,
                                     style, method=cfg.wct_method,
                                     wct_dtype=jnp.dtype(cfg.wct_dtype),
                                     interpret=q8_interpret)
        if net in ("sanet", "dynamic_sanet"):
            return q8.stylize_sanet_q8(
                variables, vgg_vars, scales, content, style,
                adaptive=net == "dynamic_sanet", ada_module=cfg.ada_module,
                blockwise=cfg.get("adaptive_blockwise", "auto"),
                interpret=q8_interpret)
        if net == "src":
            return q8.stylize_src_q8(variables["params"], vgg_vars, scales,
                                     content, style, interpret=q8_interpret)
        if net == "mrf":
            return q8.stylize_mrf_q8(variables["params"], scales, content,
                                     style, interpret=q8_interpret)
        if net == "mst":
            return q8.stylize_mst_folded_q8(
                variables["params"], scales, content, style,
                stylized_layers=cfg.stylized_layers,
                n_clusters=cfg.n_clusters, mst_lambda=cfg.mst_lambda,
                interpret=q8_interpret)
        if net == "spade":
            return q8.stylize_spade_q8(
                variables["params"], scales, content, style,
                ndf=cfg.ndf, spade_norm=cfg.spade_norm,
                interpret=q8_interpret)
        if net == "ld_adain":
            return q8.stylize_ld_q8(
                variables["params"], scales, content, style,
                stylized_layers=cfg.stylized_layers,
                interpret=q8_interpret)
        if net == "ld_adain2":
            return q8.stylize_ld2_q8(
                variables["params"], scales, content, style,
                stylized_layers=cfg.stylized_layers,
                interpret=q8_interpret)
        return q8.stylize_multi_adain_folded_q8(
            variables["params"], scales, content, style,
            interpret=q8_interpret)

    return run_impl


# ---------------------------------------------------------------------------
# Dynamic batching
# ---------------------------------------------------------------------------

class DynamicBatcher:
    """Coalesce concurrent stylize requests into fixed-shape batches.

    ``run(content, style) -> stylized`` must accept exactly
    ``(batch_size, H, W, 3)`` arrays (ONE compiled program — short
    batches are padded by repeating the last request).  The first queued
    request opens a ``max_wait_ms`` window; the batch dispatches when
    ``batch_size`` requests are waiting or the window closes, whichever
    is first.  A failing batch fails only its own requests — the worker
    survives for the next window."""

    def __init__(self, run: Callable, batch_size: int,
                 max_wait_ms: float = 5.0):
        assert batch_size >= 1
        self.run = run
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1e3
        self._q: Queue = Queue()
        self._stats_lock = threading.Lock()
        self.served = 0
        self.batches = 0
        # bounded: a persistent daemon must not grow per-batch history
        # without limit (p50/p95 over the recent window is the signal)
        from collections import deque
        self.batch_ms: Any = deque(maxlen=1024)
        self._stop = threading.Event()
        # double buffering via a dedicated flusher thread: the worker
        # dispatches batch t and hands it off, then collects/stacks
        # batch t+1 while the flusher blocks on batch t's device fetch.
        # maxsize=1 bounds in-flight batches to one (same memory as the
        # old inline scheme); unlike flushing inline after the NEXT
        # dispatch, futures resolve as soon as the device finishes and
        # batch_ms never includes the next batch's collection window
        # (round-4 ADVICE item 3)
        self._flush_q: Queue = Queue(maxsize=1)
        self._flusher = threading.Thread(target=self._flush_loop,
                                         daemon=True)
        self._flusher.start()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, content: np.ndarray, style: np.ndarray) -> Future:
        """Queue one (H, W, 3) request; the Future resolves to the
        stylized (H, W, 3) numpy image."""
        fut: Future = Future()
        if self._stop.is_set():
            fut.set_exception(RuntimeError("batcher closed"))
            return fut
        self._q.put((content, style, fut))
        return fut

    def stats(self) -> Dict[str, Any]:
        with self._stats_lock:
            ms = sorted(self.batch_ms)
            p50 = ms[len(ms) // 2] if ms else None
            return {"served": self.served, "batches": self.batches,
                    "batch_size": self.batch_size,
                    "p50_batch_ms": round(p50, 2) if p50 else None}

    def close(self):
        """Stop the worker and FAIL any still-queued requests — a handler
        blocked in ``Future.result`` must get an error reply rather than
        hang past shutdown."""
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=10)
        self._flush_q.put(None)  # worker exited — sentinel lands last
        self._flusher.join(timeout=10)
        self._drain_failed()

    def _drain_failed(self):
        while True:
            try:
                item = self._q.get_nowait()
            except Empty:
                return
            if item is not None and not item[2].done():
                item[2].set_exception(RuntimeError("batcher closed"))

    # -- worker -------------------------------------------------------
    def _collect(self):
        """Block for the first request, then fill the batch within the
        window."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        deadline = time.perf_counter() + self.max_wait
        while len(items) < self.batch_size:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _flush_loop(self):
        # blocks on the device fetch of the batch in flight; futures
        # resolve the moment the device finishes, independent of what
        # the worker is collecting
        while True:
            p = self._flush_q.get()
            if p is None:
                return
            futs, dev_out, t0 = p
            try:
                out = np.asarray(dev_out)  # blocks until device done
                ms = (time.perf_counter() - t0) * 1e3
                with self._stats_lock:
                    self.served += len(futs)
                    self.batches += 1
                    self.batch_ms.append(ms)
                for b, fut in enumerate(futs):
                    fut.set_result(out[b])
            except Exception as e:  # fail THIS batch, keep serving
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)

    def _loop(self):
        # a batch already collected when close() lands still serves;
        # never-collected requests are failed by close()'s drain.
        # DOUBLE-BUFFERED: batch t is dispatched asynchronously (JAX
        # async dispatch) and handed to the flusher thread, which blocks
        # on the device fetch while this worker collects/stacks batch
        # t+1 — host-side stack + scatter overlap device compute, so
        # sustained throughput approaches the device rate instead of
        # host+device serialized (identity-runner host cost measured
        # 5.7 ms/batch-8 at 512px on one core — comparable to the 15 ms
        # device batch).  The maxsize-1 hand-off queue keeps exactly one
        # batch in flight.
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            futs = [f for _, _, f in items]
            try:
                t0 = time.perf_counter()
                content = np.stack([c for c, _, _ in items])
                style = np.stack([s for _, s, _ in items])
                pad = self.batch_size - len(items)
                if pad:
                    content = np.concatenate(
                        [content, content[-1:].repeat(pad, 0)])
                    style = np.concatenate(
                        [style, style[-1:].repeat(pad, 0)])
                dev_out = self.run(jnp.asarray(content),
                                   jnp.asarray(style))  # async dispatch
            except Exception as e:
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            # blocks while one batch is already in flight (bounded depth)
            self._flush_q.put((futs, dev_out, t0))


# ---------------------------------------------------------------------------
# TCP daemon
# ---------------------------------------------------------------------------

def serve_daemon(batcher: DynamicBatcher, img_size: int, out_dir: Path,
                 port: int = 0, host: str = "127.0.0.1",
                 default_style: Optional[np.ndarray] = None,
                 to_u8=None) -> None:
    """Line-delimited-JSON TCP serving loop over ``batcher`` (blocks
    until a ``{"cmd": "shutdown"}`` request).

    Request decode runs in per-connection threads, so host IO overlaps
    the device batch in flight — the same overlap the folder sweeper
    gets from double buffering."""
    import itertools
    import re

    from .data.transforms import load_image

    out_dir.mkdir(parents=True, exist_ok=True)
    seq = itertools.count()  # GIL-atomic; uniquifies output filenames

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            # replies are keyed by request id, so each stylize request
            # runs in its own thread — pipelined requests on ONE
            # connection coalesce into a batch instead of serializing
            self._wlock = threading.Lock()
            pending = []
            for raw in self.rfile:
                try:
                    req = json.loads(raw)
                except json.JSONDecodeError as e:
                    self._reply({"ok": False, "error": f"bad json: {e}"})
                    continue
                cmd = req.get("cmd")
                if cmd == "stats":
                    self._reply({"ok": True, **batcher.stats()})
                    continue
                if cmd == "shutdown":
                    for t in pending:
                        t.join(timeout=600)
                    self._reply({"ok": True, "shutdown": True})
                    threading.Thread(target=self.server.shutdown,
                                     daemon=True).start()
                    return
                t = threading.Thread(
                    target=lambda r=req: self._reply(self._stylize(r)),
                    daemon=True)
                t.start()
                pending.append(t)
            for t in pending:
                t.join(timeout=600)

        def _stylize(self, req):
            rid = req.get("id", "req")
            t0 = time.perf_counter()
            try:
                # to_u8: ship uint8 across the device boundary (the
                # caller's jitted fn dequantizes on device — 4x less
                # transfer; exact round trip for 8-bit sources)
                cvt = to_u8 if to_u8 is not None else (lambda a: a)
                content = cvt(load_image(req["content"], img_size))
                if "style" in req:
                    style = cvt(load_image(req["style"], img_size))
                elif default_style is not None:
                    style = default_style
                else:
                    return {"id": rid, "ok": False,
                            "error": "no style (request key or --style)"}
                out = batcher.submit(content, style).result(timeout=600)
                # client ids are untrusted: sanitize (no path escapes)
                # and uniquify (concurrent id collisions must not
                # overwrite each other's results — the reply carries
                # the actual path)
                safe = re.sub(r"[^A-Za-z0-9_.-]", "_", str(rid))[:80] \
                    or "req"
                path = out_dir / f"{safe}-{next(seq):06d}.png"
                save_image(out, path)
                return {"id": rid, "ok": True, "out": str(path),
                        "ms": round((time.perf_counter() - t0) * 1e3, 2)}
            except Exception as e:
                return {"id": rid, "ok": False,
                        "error": f"{type(e).__name__}: {str(e)[:200]}"}

        def _reply(self, obj):
            with self._wlock:
                self.wfile.write((json.dumps(obj) + "\n").encode())
                self.wfile.flush()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server((host, port), Handler) as server:
        bound = server.server_address[1]
        # the sweeper/CLI test parses this line to find the bound port
        logger.info(f"DAEMON LISTENING {host}:{bound} "
                    f"(batch {batcher.batch_size}, "
                    f"window {batcher.max_wait * 1e3:.0f} ms) -> {out_dir}")
        server.serve_forever()
    logger.info(f"Daemon stopped after {batcher.stats()}")
