"""Same-seed loss-curve A/B: int8 vs bf16 VGG loss targets (round-4
VERDICT item 2's quality evidence).

Two flagship training runs from IDENTICAL init/seed/data — one with
``train_q8_targets`` (no-grad style/content VGG forwards through the
chained-int8 encoder), one bf16 — for N steps at 512px b4 on synthetic
natural-ish images.  Reports the per-100-step mean total loss of both
arms and their relative gap; the arms should track within quantization
noise (<~2%) if int8 targets are safe.  Also prints the measured step
throughput of each arm (the speed claim).

Run serialized (box otherwise idle):
    PYTHONPATH=/root/.axon_site:src python -u tools/hw/hw_q8tgt_curve.py [steps]
"""
import sys
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

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params
from rpst.train import create_train_state
from rpst.train.step import make_train_step

print("devices:", jax.devices(), flush=True)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 500
IMG, BATCH = 512, 4


def _fake_images(rng, n):
    """Smooth low-frequency fields + noise — closer to natural-image
    statistics than white noise (calibration absmaxes matter)."""
    base = rng.random((n, 16, 16, 3), np.float32)
    up = jnp.asarray(base)
    up = jax.image.resize(up, (n, IMG, IMG, 3), "linear")
    noise = jnp.asarray(rng.random((n, IMG, IMG, 3), np.float32)) * 0.15
    return jnp.clip(up * 0.85 + noise, 0.0, 1.0)


def run_arm(q8_targets: bool):
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=5, hidden_dim=32, inception_num=0,
                           attention="none", img_size=IMG,
                           batch_size=BATCH, compute_dtype="bfloat16",
                           exec_strategy="folded",
                           folded_train_pallas=True,
                           train_q8_targets=q8_targets, lr=1e-4,
                           lr_decay=5e-5))
    bundle = build_model(cfg)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    pool_c = _fake_images(rng, 32)
    pool_s = _fake_images(rng, 32)
    if q8_targets:
        from rpst.models.fast_path_q8 import calibrate_vgg_targets_q8
        bundle.q8_target_scales = calibrate_vgg_targets_q8(
            vgg_vars, pool_c[:BATCH], pool_s[:BATCH])
    state, tx = create_train_state(bundle, key, pool_c[:BATCH],
                                   pool_s[:BATCH], vgg_vars)
    step = make_train_step(bundle, tx)
    idx = np.random.default_rng(1)  # SAME data order both arms
    losses = []
    t0 = None
    for i in range(STEPS):
        ci = idx.choice(32, BATCH, replace=False)
        si = idx.choice(32, BATCH, replace=False)
        state, parts = step(state, vgg_vars, pool_c[ci], pool_s[si])
        if i == 4:
            float(parts["total_loss"])  # sync past compile
            t0 = time.perf_counter()
        if i % 10 == 0 or i == STEPS - 1:
            losses.append((i, float(parts["total_loss"])))
    float(parts["total_loss"])
    dt = time.perf_counter() - t0
    ips = BATCH * (STEPS - 5) / dt
    jax.clear_caches()
    return losses, ips


bf, ips_bf = run_arm(False)
q8, ips_q8 = run_arm(True)

print(f"\nthroughput: bf16-targets {ips_bf:.1f} img/s, "
      f"q8-targets {ips_q8:.1f} img/s ({100*(ips_q8/ips_bf-1):+.1f}%)",
      flush=True)
print("step  bf16-tgt  q8-tgt   rel", flush=True)
for (i, a), (_, b) in zip(bf, q8):
    rel = (b - a) / (abs(a) + 1e-9)
    print(f"{i:5d} {a:9.4f} {b:8.4f} {rel:+7.2%}", flush=True)
win = min(len(bf), 10)
tail_a = np.mean([a for _, a in bf[-win:]])
tail_b = np.mean([b for _, b in q8[-win:]])
print(f"tail mean (last {win} samples): bf16 {tail_a:.4f} "
      f"q8 {tail_b:.4f} rel {(tail_b-tail_a)/abs(tail_a):+.2%}", flush=True)
