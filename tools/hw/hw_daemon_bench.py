"""On-hardware serving-daemon throughput: flagship 512px, concurrent
line-JSON requests through serve.py --daemon (auto mode -> q8 on TPU).

Run serialized (box otherwise idle):
    python -u tools/hw/hw_daemon_bench.py
"""
import json
import socket
import subprocess
import sys
import threading
import time
from pathlib import Path

import os
import numpy as np
from PIL import Image
import yaml

ROOT = Path(os.environ.get("DB_ROOT", "/tmp/daemon_bench"))
N_REQ = int(os.environ.get("DB_NREQ", 64))
CONNS = int(os.environ.get("DB_CONNS", 8))
IMG = int(os.environ.get("DB_IMG", 512))
HID = int(os.environ.get("DB_HID", 32))
RPB = int(os.environ.get("DB_RPB", 5))

(ROOT / "content").mkdir(parents=True, exist_ok=True)
(ROOT / "style").mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(0)
for i in range(16):
    Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), np.uint8),
                    "RGB").save(ROOT / "content" / f"{i:02d}.png")
Image.fromarray(rng.integers(0, 255, (IMG, IMG, 3), np.uint8),
                "RGB").save(ROOT / "style" / "s.png")
cfg = ROOT / "cfg.yaml"
cfg.write_text(yaml.safe_dump(dict(
    network="multi_adain", enc_stack_way="constant", rp_blocks=RPB,
    hidden_dim=HID, inception_num=0, attention="none", img_size=IMG,
    batch_size=8, num_workers=0, output=str(ROOT / "out"),
    content_dir=str(ROOT / "content"), style_dir=str(ROOT / "style"),
    vgg="")))

proc = subprocess.Popen(
    [sys.executable, "serve.py", "--config", str(cfg),
     "--content", str(ROOT / "content"),
     "--style", str(ROOT / "style" / "s.png"),
     "--out", str(ROOT / "served"), "--mode", "auto", "--batch", "8",
     "--daemon", "--max-wait-ms", "10"],
    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    cwd="/root/repo")
port = None
for _ in range(400):
    line = proc.stdout.readline()
    if not line:
        break
    print("daemon:", line.rstrip(), flush=True)
    if "DAEMON LISTENING" in line:
        port = int(line.split("DAEMON LISTENING")[1]
                   .split()[0].rsplit(":", 1)[1])
        break
assert port, "daemon never came up"

lat = []
lat_lock = threading.Lock()

def client(ci, n):
    with socket.create_connection(("127.0.0.1", port), timeout=600) as s:
        f = s.makefile("rw")
        # pipelined: all requests first, then read replies
        for i in range(n):
            f.write(json.dumps(
                {"id": f"c{ci}r{i}",
                 "content": str(ROOT / "content" / f"{(ci+i) % 16:02d}.png")
                 }) + "\n")
        f.flush()
        for _ in range(n):
            r = json.loads(f.readline())
            assert r["ok"], r
            with lat_lock:
                lat.append(r["ms"])

# warmup (jit compile on first batch)
client(0, 2)
lat.clear()
t0 = time.perf_counter()
threads = [threading.Thread(target=client, args=(c, N_REQ // CONNS))
           for c in range(CONNS)]
for t in threads:
    t.start()
for t in threads:
    t.join()
dt = time.perf_counter() - t0
lat.sort()
print(f"daemon: {N_REQ} reqs / {CONNS} conns in {dt:.2f}s = "
      f"{N_REQ / dt:.1f} img/s; per-request p50 {lat[len(lat) // 2]:.1f} ms "
      f"p95 {lat[int(len(lat) * 0.95)]:.1f} ms", flush=True)

with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
    f = s.makefile("rw")
    f.write(json.dumps({"cmd": "stats"}) + "\n")
    f.flush()
    print("stats:", f.readline().strip(), flush=True)
    f.write(json.dumps({"cmd": "shutdown"}) + "\n")
    f.flush()
proc.wait(timeout=120)
print("HW DAEMON BENCH DONE", flush=True)
