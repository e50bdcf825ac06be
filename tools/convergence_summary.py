#!/usr/bin/env python
"""Summarize a training metrics.jsonl into a descent table (used for
the BASELINE.md convergence evidence; VERDICT r5 item 5)."""

import json
import sys
from pathlib import Path

import numpy as np


def summarize(path: Path, key: str = "style_loss"):
    rows = [json.loads(l) for l in path.read_text().splitlines() if l]
    steps = np.asarray([r["step"] for r in rows])
    vals = np.asarray([float(r[key]) for r in rows])
    total = np.asarray([float(r.get("total_loss", r[key])) for r in rows])
    k = max(len(vals) // 10, 1)
    first, last = float(vals[:k].mean()), float(vals[-k:].mean())
    # fraction of smoothed-curve segments that decrease
    w = max(len(vals) // 20, 1)
    sm = np.convolve(vals, np.ones(w) / w, mode="valid")
    frac_down = float(np.mean(np.diff(sm) <= 0))
    return {
        "file": str(path), "n_logs": len(rows),
        "steps": [int(steps[0]), int(steps[-1])],
        f"{key}_first10pct": first, f"{key}_last10pct": last,
        "reduction_x": first / max(last, 1e-30),
        "smoothed_frac_decreasing": round(frac_down, 3),
        "total_first": float(total[:k].mean()),
        "total_last": float(total[-k:].mean()),
    }


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(json.dumps(summarize(Path(p)), indent=None))
