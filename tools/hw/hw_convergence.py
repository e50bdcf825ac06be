#!/usr/bin/env python
"""Round-5 VERDICT item 5: sustained training dynamics beyond 300 steps.

Trains three families (flagship multi_adain folded, wct, dynamic_sanet)
for 1-2k steps at 512px on the structured synthetic corpus
(tools/make_synthetic_corpus.py) via the REAL train.py CLI, then copies
the loss JSONLs + step-0/mid/final eval stylizations into
docs/convergence/ for the repo record.

No real VGG weights exist in this environment, so the perceptual losses
target a FIXED RANDOM VGG — still a well-posed optimization problem
(monotone descent expected), documented as such in BASELINE.md.
"""

import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
CORPUS = Path("/tmp/rpst_corpus")

RUNS = [
    ("flagship", dict(network="multi_adain", enc_stack_way="constant",
                      rp_blocks=5, hidden_dim=32, inception_num=0,
                      attention="none", exec_strategy="folded",
                      batch_size=8, max_iter=2001, lr=1e-4),
     2000),
    ("wct", dict(network="wct", enc_stack_way="deeper", rp_blocks=5,
                 hidden_dim=16, batch_size=4, max_iter=1001, lr=1e-4),
     1000),
    ("dynamic_sanet", dict(network="dynamic_sanet", ada_module="aea",
                           batch_size=2, max_iter=801, lr=1e-4), 800),
]


def run_one(name, over, steps):
    out = Path(f"/tmp/conv_{name}")
    if out.exists():
        shutil.rmtree(out)
    cfg = dict(img_size=512, content_dir=str(CORPUS / "content"),
               style_dir=str(CORPUS / "style"),
               test_dir=str(CORPUS / "test"), num_workers=2,
               log_iter=20, test_iter=max(steps // 2, 1),
               snapshot_save_iter=steps, output=str(out), vgg="",
               lr_decay=5e-5, content_weight=1.0, style_weight=3.0,
               compute_dtype="bfloat16", use_mask=False)
    cfg.update(over)
    cfg_path = Path(f"/tmp/conv_{name}.yaml")
    import yaml
    cfg_path.write_text(yaml.safe_dump(cfg))
    print(f"=== {name}: {steps} steps @512px ===", flush=True)
    r = subprocess.run([sys.executable, str(REPO / "train.py"),
                        "--config", str(cfg_path)],
                       capture_output=True, text=True, timeout=5400)
    tail = "\n".join(r.stderr.splitlines()[-6:])
    print(f"rc={r.returncode}\n{tail}", flush=True)
    dst = REPO / "docs" / "convergence" / name
    dst.mkdir(parents=True, exist_ok=True)
    metrics = out / "logs" / "metrics.jsonl"
    if metrics.exists():
        shutil.copy(metrics, dst / "metrics.jsonl")
    # keep a small sheet: first test pair at each dump cadence
    for d in sorted((out / "test").glob("*")):
        cats = sorted(d.glob("*-cat.png"))
        if cats:
            from PIL import Image
            im = Image.open(cats[0])
            im.thumbnail((768, 256))
            im.save(dst / f"step{d.name}_{cats[0].name}")
    return r.returncode


def main():
    names = sys.argv[1:] or [n for n, _, _ in RUNS]
    for name, over, steps in RUNS:
        if name in names:
            run_one(name, over, steps)


if __name__ == "__main__":
    main()
