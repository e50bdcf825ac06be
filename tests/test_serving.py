"""Serving layer: dynamic request batching + the line-JSON TCP daemon.

The reference has no serving story at all (SURVEY §1); these cover the
deployment path rpst adds: DynamicBatcher semantics (coalescing, static
padding, deadline dispatch, per-batch failure containment) as unit
tests, and serve.py --daemon end-to-end as a subprocess CLI test.
"""

import json
import os
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from rpst.serving import DynamicBatcher

REPO = Path(__file__).resolve().parent.parent


def _img(v, size=4):
    return np.full((size, size, 3), v, np.float32)


def test_batcher_coalesces_and_pads():
    """3 concurrent requests with batch_size=4 dispatch as ONE padded
    batch; each future resolves to its own row."""
    seen = []

    def run(c, s):
        seen.append(np.asarray(c).shape)
        return np.asarray(c) + np.asarray(s)

    b = DynamicBatcher(run, batch_size=4, max_wait_ms=200.0)
    try:
        futs = [b.submit(_img(i), _img(10 * i)) for i in range(3)]
        outs = [f.result(timeout=30) for f in futs]
        for i, out in enumerate(outs):
            np.testing.assert_allclose(out, _img(11 * i))
        assert seen == [(4, 4, 4, 3)]  # one batch, padded 3 -> 4
        st = b.stats()
        assert st["served"] == 3 and st["batches"] == 1
    finally:
        b.close()


def test_batcher_dispatches_full_batch_without_waiting():
    """A full batch goes immediately; a later request opens a second
    batch after the window."""
    calls = []

    def run(c, s):
        calls.append(np.asarray(c)[:, 0, 0, 0].tolist())
        return np.asarray(c)

    b = DynamicBatcher(run, batch_size=2, max_wait_ms=10_000.0)
    try:
        f1, f2 = b.submit(_img(1), _img(0)), b.submit(_img(2), _img(0))
        f1.result(timeout=30), f2.result(timeout=30)
        assert calls == [[1.0, 2.0]]  # no 10s wait: batch was full
        t0 = time.perf_counter()
        b3 = DynamicBatcher(run, batch_size=2, max_wait_ms=50.0)
        try:
            f3 = b3.submit(_img(3), _img(0))
            f3.result(timeout=30)
            assert time.perf_counter() - t0 < 10  # window, not forever
        finally:
            b3.close()
    finally:
        b.close()


def test_batcher_contains_failures_per_batch():
    """A failing run fails its own futures; the worker keeps serving."""
    state = {"fail": True}

    def run(c, s):
        if state["fail"]:
            raise RuntimeError("boom")
        return np.asarray(c)

    b = DynamicBatcher(run, batch_size=1, max_wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError):
            b.submit(_img(1), _img(0)).result(timeout=30)
        state["fail"] = False
        out = b.submit(_img(2), _img(0)).result(timeout=30)
        np.testing.assert_allclose(out, _img(2))
        assert b.stats()["served"] == 1  # failures aren't counted served
    finally:
        b.close()


# ---------------------------------------------------------------------------
# CLI daemon end-to-end (subprocess, CPU backend)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_serve_daemon_cli(tmp_path):
    from PIL import Image
    import yaml

    data = tmp_path / "data"
    for sub in ("content", "style"):
        (data / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        for sub in ("content", "style"):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8),
                            "RGB").save(data / sub / f"{i:02d}.png")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(yaml.safe_dump(dict(
        network="multi_adain", enc_stack_way="constant", rp_blocks=2,
        hidden_dim=8, inception_num=0, attention="none", img_size=32,
        batch_size=2, num_workers=0, output=str(tmp_path / "out"),
        content_dir=str(data / "content"), style_dir=str(data / "style"),
        vgg="")))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "serve.py"), "--config", str(cfg),
         "--content", str(data / "content"),
         "--style", str(data / "style" / "00.png"),
         "--out", str(tmp_path / "served"), "--mode", "standard",
         "--batch", "2", "--daemon", "--max-wait-ms", "100"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(REPO))
    try:
        # parse the bound port from the startup line
        port, lines = None, []
        deadline = time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            lines.append(line)
            if "DAEMON LISTENING" in line:
                port = int(line.split("DAEMON LISTENING")[1]
                           .split()[0].rsplit(":", 1)[1])
                break
        assert port, "".join(lines)

        with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
            f = s.makefile("rw")
            # two requests in one window -> one coalesced batch
            for i in range(2):
                req = {"id": f"r{i}",
                       "content": str(data / "content" / f"{i:02d}.png")}
                if i == 1:  # per-request style override
                    req["style"] = str(data / "style" / "01.png")
                f.write(json.dumps(req) + "\n")
            f.flush()
            replies = [json.loads(f.readline()) for _ in range(2)]
            assert {r["id"] for r in replies} == {"r0", "r1"}
            for r in replies:
                assert r["ok"], r
                assert Path(r["out"]).exists()
                img = np.asarray(Image.open(r["out"]))
                assert img.shape == (32, 32, 3)
            f.write(json.dumps({"cmd": "stats"}) + "\n")
            f.flush()
            st = json.loads(f.readline())
            assert st["ok"] and st["served"] == 2, st
            f.write(json.dumps({"cmd": "shutdown"}) + "\n")
            f.flush()
            assert json.loads(f.readline())["shutdown"]
        proc.wait(timeout=120)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_batcher_close_fails_stranded_requests():
    """The batch in flight at close() still serves; requests never
    collected (or submitted after close) get an error instead of a
    future that never resolves."""
    import threading as th

    entered, gate = th.Event(), th.Event()

    def run(c, s):
        entered.set()
        gate.wait(30)  # hold the worker inside the in-flight batch
        return np.asarray(c)

    b = DynamicBatcher(run, batch_size=1, max_wait_ms=1.0)
    f1 = b.submit(_img(1), _img(0))
    assert entered.wait(10)              # worker is now holding f1
    f2 = b.submit(_img(2), _img(0))      # queued behind it
    closer = th.Thread(target=b.close)
    closer.start()                       # close blocks joining the worker
    time.sleep(0.05)
    gate.set()
    closer.join(30)
    np.testing.assert_allclose(f1.result(timeout=30), _img(1))
    with pytest.raises(RuntimeError):
        f2.result(timeout=30)
    with pytest.raises(RuntimeError):
        b.submit(_img(3), _img(0)).result(timeout=30)  # post-close


def test_batcher_concurrent_submitters_stress():
    """Many threads hammering submit() concurrently: every request gets
    its own correct row back (no cross-request mixups from the
    batching/padding/reply plumbing), and stats stay consistent."""
    import threading as th

    def run(c, s):
        return np.asarray(c) * 2.0

    b = DynamicBatcher(run, batch_size=4, max_wait_ms=2.0)
    errs = []

    def client(base):
        try:
            for i in range(10):
                v = float(base * 100 + i)
                out = b.submit(_img(v), _img(0)).result(timeout=60)
                np.testing.assert_allclose(out, _img(2 * v))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [th.Thread(target=client, args=(t,)) for t in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    b.close()
    assert not errs, errs
    st = b.stats()
    assert st["served"] == 60 and st["batches"] >= 15


def test_calibrate_scales_retries_on_resource_exhausted(monkeypatch):
    """A device RESOURCE_EXHAUSTED during calibration retries once with
    a single-image batch (shared-device free memory fluctuates)."""
    from rpst import serving

    calls = []

    def fake(bundle, cfg, variables, vgg_vars, calib, calib_style):
        calls.append(calib.shape[0])
        if len(calls) == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")
        return {"act_scales": np.zeros(3, np.float32)}

    monkeypatch.setattr(serving, "_calibrate_scales", fake)
    out = serving.calibrate_scales(None, None, None, None,
                                   np.zeros((4, 8, 8, 3), np.float32),
                                   np.zeros((4, 8, 8, 3), np.float32))
    assert calls == [4, 1]
    assert "act_scales" in out

    # non-OOM errors propagate unchanged
    def fail(*a):
        raise ValueError("boom")

    monkeypatch.setattr(serving, "_calibrate_scales", fail)
    with pytest.raises(ValueError):
        serving.calibrate_scales(None, None, None, None,
                                 np.zeros((2, 8, 8, 3), np.float32),
                                 np.zeros((2, 8, 8, 3), np.float32))
