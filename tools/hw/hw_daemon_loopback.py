"""On-hw daemon loopback: DynamicBatcher + the real jitted flagship q8
runner, NO TCP — pins the batching pipeline against bench.py's b8
compute rate (round-4 VERDICT item 6).

Three arms, each 256 requests from 8 pre-loaded submitter threads
(saturated arrival):

  * pipeline — runner ignores its inputs and runs the compiled q8
    program on cached device arrays, returning a tiny (B,1,1,3) u8
    stub: measures batch formation + dispatch + future scatter at
    device compute rate with NO host<->device image transfer.  This is
    the number that must ≈ bench.py's b8 img/s; a shortfall is batcher
    overhead.
  * loopback — the full serve.py path (u8 in, u8 out, device_put +
    fetch per batch): on a PCIe host this is the real serving rate; on
    the axon tunnel it is transfer-bound (documented 2026-08-18) and
    the gap vs 'pipeline' measures the transfer share.
  * bench    — bench.py's chained fori_loop b8 rate, same process, for
    the apples-to-apples denominator.

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_daemon_loopback.py
"""
import sys
import threading
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(_ROOT / "src"))
sys.path.insert(0, str(_ROOT))

import bench

bench._require_responsive_backend()

import jax
import jax.numpy as jnp
import numpy as np

from rpst.serving import DynamicBatcher

print("devices:", jax.devices(), flush=True)

IMG, BATCH, N_REQ, THREADS = 512, 8, 256, 8

bundle = bench.build("bfloat16")
rng = jax.random.PRNGKey(0)
content, style = bench._rand_pair(BATCH, IMG)
variables = bundle.model.init(rng, content, style, train=False)

from rpst.models.fast_path_q8 import (calibrate_multi_adain_q8,
                                      stylize_multi_adain_folded_q8)

scales = calibrate_multi_adain_q8(variables["params"], content, style)


@jax.jit
def run_u8(c, s):
    cf = c.astype(jnp.float32) / 255.0
    sf = s.astype(jnp.float32) / 255.0
    y = stylize_multi_adain_folded_q8(variables["params"], scales, cf, sf)
    y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
    return y.astype(jnp.uint8)


dev_c = jnp.asarray((np.asarray(content) * 255).astype(np.uint8))
dev_s = jnp.asarray((np.asarray(style) * 255).astype(np.uint8))


@jax.jit
def run_cached(c_unused, s_unused):
    y = run_u8(dev_c, dev_s)
    # tiny output: one pixel per image — keeps the device compute while
    # removing the 6 MB/batch output fetch from the measurement
    return y[:, :1, :1]


def drive(runner, tag, req_img=IMG):
    # the pipeline arm submits 1x1 stubs so the batcher's own
    # jnp.asarray(stack) moves ~nothing across the tunnel
    batcher = DynamicBatcher(runner, batch_size=BATCH, max_wait_ms=20.0)
    img_u8 = np.zeros((req_img, req_img, 3), np.uint8)
    futs = []
    lock = threading.Lock()

    def submitter(count):
        mine = [batcher.submit(img_u8, img_u8) for _ in range(count)]
        with lock:
            futs.extend(mine)

    # warm (compile) outside the timed window
    batcher.submit(img_u8, img_u8).result(timeout=600)
    t0 = time.perf_counter()
    threads = [threading.Thread(target=submitter, args=(N_REQ // THREADS,))
               for _ in range(THREADS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for f in futs:
        f.result(timeout=600)
    dt = time.perf_counter() - t0
    st = batcher.stats()
    batcher.close()
    ips = N_REQ / dt
    print(f"{tag}: {ips:.1f} img/s ({st['batches']} batches, "
          f"p50 batch {st['p50_batch_ms']} ms)", flush=True)
    return ips


pipeline = drive(lambda c, s: run_cached(c, s), "pipeline (no transfers)",
                 req_img=1)
loopback = drive(lambda c, s: run_u8(c, s), "loopback (u8 transfers)")

ips, med = bench.bench_stylize(bundle, BATCH, iters=10, mode="q8")
print(f"bench    (fori_loop b8): {ips:.1f} img/s ({med*1e3:.1f} ms/pass)",
      flush=True)
print(f"summary: pipeline/bench = {pipeline/ips:.2f} "
      f"(batcher overhead = {max(0.0, 1 - pipeline/ips)*100:.0f}%); "
      f"loopback/bench = {loopback/ips:.2f} (transfer share)", flush=True)
