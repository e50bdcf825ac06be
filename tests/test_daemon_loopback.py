"""Daemon loopback: DynamicBatcher driven by the REAL jitted runner (no
TCP, no fake run fns) + a sustained-load soak (round-4 VERDICT item 6).

The earlier batcher tests (test_serving.py) use fake run fns; these pin
the full in-process pipeline: numpy stack -> device -> jitted stylize ->
fetch -> per-future scatter, with per-request output correctness, and a
1k-request mixed-arrival soak for ordering/leak bugs.  The on-hw rate
companion is tools/hw/hw_daemon_loopback.py.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.serving import DynamicBatcher

pytestmark = pytest.mark.slow


def _real_runner(img=32):
    """The serve.py uint8-boundary runner on a tiny flagship, jitted."""
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=2, hidden_dim=8, img_size=img,
                           inception_num=0, attention="none",
                           exec_strategy="folded",
                           compute_dtype="float32"))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, img, img, 3))
    variables = bundle.model.init(rng, sample, sample, train=False)

    @jax.jit
    def run(content, style):
        c = content.astype(jnp.float32) / 255.0
        s = style.astype(jnp.float32) / 255.0
        y = bundle.stylize(variables, None, c, s)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
        return y.astype(jnp.uint8)

    return run, img


def test_loopback_real_runner_correct_per_request():
    run, img = _real_runner()
    rng = np.random.default_rng(0)
    n = 12
    contents = [rng.integers(0, 255, (img, img, 3), np.uint8)
                for _ in range(n)]
    style = rng.integers(0, 255, (img, img, 3), np.uint8)

    # expected: the same jitted program on exact-size batches
    expected = {}
    for i in range(0, n, 4):
        chunk = contents[i:i + 4]
        pad = 4 - len(chunk)
        batch = np.stack(chunk + [chunk[-1]] * pad)
        out = np.asarray(run(jnp.asarray(batch),
                             jnp.asarray(np.stack([style] * 4))))
        for j, c in enumerate(chunk):
            expected[i + j] = out[j]

    batcher = DynamicBatcher(lambda c, s: run(c, s), batch_size=4,
                             max_wait_ms=200.0)
    try:
        futs = [batcher.submit(c, style) for c in contents]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    # every request's output equals the direct batched run of ITS batch —
    # requests arrived in order and saturated, so batches align 4-by-4
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, expected[i], err_msg=str(i))
    st = batcher.stats()
    assert st["served"] == n
    assert st["batches"] == 3


def test_loopback_soak_1k_mixed_arrival():
    """1000 requests, bursty arrival from 8 submitter threads, fast
    runner: every future resolves with ITS payload (identity marker),
    nothing leaks, the stats window stays bounded."""
    import gc

    def run(c, s):
        return c  # identity: output must carry the request's own marker

    batcher = DynamicBatcher(run, batch_size=8, max_wait_ms=1.0)
    results = {}
    lock = threading.Lock()
    errs = []

    def submitter(tid, count):
        rng = np.random.default_rng(tid)
        for k in range(count):
            marker = np.full((4, 4, 3), (tid * 1000 + k) % 251,
                             np.uint8)
            fut = batcher.submit(marker, marker)
            try:
                out = fut.result(timeout=60)
                with lock:
                    results[(tid, k)] = (out == marker).all()
            except Exception as e:  # noqa: BLE001
                with lock:
                    errs.append((tid, k, repr(e)))
            if rng.random() < 0.05:
                time.sleep(rng.random() * 0.01)  # bursty gaps

    threads = [threading.Thread(target=submitter, args=(t, 125))
               for t in range(8)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive(), "submitter hung"
    finally:
        st = batcher.stats()
        batcher.close()
    assert not errs, errs[:5]
    assert len(results) == 1000 and all(results.values())
    assert st["served"] == 1000
    assert batcher._q.empty()
    assert len(batcher.batch_ms) <= 1024  # bounded history
    gc.collect()
    # the worker thread is the only batcher thread left after close
    assert not batcher._worker.is_alive()


def test_loopback_close_fails_queued():
    """Requests still queued at close() get an error, not a hang."""
    ev = threading.Event()

    def slow_run(c, s):
        ev.wait(5)
        return c

    batcher = DynamicBatcher(slow_run, batch_size=2, max_wait_ms=1.0)
    a = batcher.submit(np.zeros((2, 2, 3), np.uint8),
                       np.zeros((2, 2, 3), np.uint8))
    time.sleep(0.1)  # let the worker collect batch 1 and block in run
    b = batcher.submit(np.zeros((2, 2, 3), np.uint8),
                       np.zeros((2, 2, 3), np.uint8))
    t = threading.Thread(target=batcher.close)
    t.start()
    ev.set()
    t.join(timeout=30)
    assert not t.is_alive()
    a.result(timeout=10)  # collected batch still serves
    with pytest.raises(RuntimeError):
        b.result(timeout=10)
