"""The measured crossover table — ONE data-driven policy for every
serving mode / engine gate (round-4 VERDICT item 5).

Every constant here is a measured v5e crossover recorded in BASELINE.md;
the gates that consume them (`serving.resolve_mode`,
`ModelBundle.q8_recommended`, the folded/LD engine selectors) import
from this module instead of hardcoding thresholds, and
tests/test_policy.py pins the table to BASELINE.md's measured winners
per (family, batch).

The reference has no serving story at all (SURVEY §1: no serving layer);
this is rpst-only machinery.
"""

from __future__ import annotations

from typing import Optional, Tuple

# --------------------------------------------------------------------------
# q8-vs-best-bf16 winners per family: the inclusive batch range where the
# int8 PTQ path measured FASTER than the family's best bf16 path
# (BASELINE.md "Full --all sweep refresh" 2026-08-19 + the per-family A/B
# entries cited inline).  None = q8 never recommended (explicit
# ``--mode q8`` still works everywhere q8_infer allows).
# --------------------------------------------------------------------------
Q8_WIN_RANGE: dict[str, Optional[Tuple[int, Optional[int]]]] = {
    "multi_adain": (1, None),     # q8 266-281 b1 / 573-584 b8 vs bf16 249/514
    "adain": (1, None),           # q8 62.9/88.6 vs 51.8/48.2 (b1/b4)
    "seg_adain": (1, None),       # q8 62.2/88.6 vs 50.0/48.1
    "wct": (1, None),             # q8 66.4/72.5 vs 58.9/68.9
    "sanet": (1, None),           # q8 71.7/128.1 vs 60.3/81.2
    "mrf": (1, None),             # q8 36.5/49.0 vs 31.0/33.8
    "sel_multi_adain": (1, None), # q8 194.8 b1 / 426.7 b8 vs 176/393
    "ld_adain": (1, None),        # q8 +44% b1 / +35% b2 / +74% b4
    "ld_adain2": (2, None),       # b1 26.9 -> 25.5 (-5%); b2 +35%, b4 +15%
                                  #   (BASELINE "LD v2 int8 serving")
    "dynamic_sanet": (4, None),   # b1 71.3 vs bf16 75.0 (q8 loses);
                                  #   b4 128.4 vs 81.6 (q8 wins)
    "src": (4, None),             # b1 83.0 vs bf16 88.0; b4 147.0 vs 96.3
    "mst": (1, 3),                # b1 q8 167.0 vs 157.4; b4 folded-bf16
                                  #   246 > q8 210.3 ("Folded-engine gate
                                  #   moved to N <= 4" table)
    "ccam": None,                 # q8 a measured wash (einsum-dominated);
                                  #   folded bf16 167.5/100.2 recommended
    "spade": None,                # bf16 SPADE generator dominates; int8
                                  #   encoders only add requant (-15% b4)
}


def q8_preferred(network: str, batch: Optional[int] = None) -> bool:
    """Is q8 the measured winner for ``network`` at ``batch``?

    ``batch=None`` (unknown at resolve time) asks "does q8 win at the
    serving default b8" — the family-level answer the pre-policy boolean
    gave, kept for callers without a batch in hand."""
    rng = Q8_WIN_RANGE.get(network)
    if rng is None:
        return False
    lo, hi = rng
    if batch is None:
        batch = 8
    return batch >= lo and (hi is None or batch <= hi)


# --------------------------------------------------------------------------
# Engine crossovers (kernel/program selection inside a mode)
# --------------------------------------------------------------------------

# Fused folded Pallas kernel vs the XLA ring conv for bf16 folded
# execution: Pallas wins at N <= 4 and always at high res
# (BASELINE.md "Folded-engine gate moved to N <= 4": b4 Pallas 312/291/
# 263/246 vs XLA 248/118/101/166; b8 XLA 478/400/299/220 wins).
FOLDED_PALLAS_MAX_BATCH = 4
FOLDED_PALLAS_MIN_HIRES_H = 1024

# Wide-K (K=3*C4 lane-stacked) folded int8 contraction: +3% b8 / -7% b1
# (hw_flagship_ab 2026-08-18) -> on at batch >= 4.
WIDE_K_MIN_BATCH = 4

# LD v1 mixed Mosaic+XLA engines collapse below a 2N encode batch of 8
# (the small-batch layout war, BASELINE "LD v1 int8 serving") -> XLA-only
# program when 2N < 8.
LD_MIXED_ENGINE_MIN_2N = 8

# LD v2 3x3 int8 engine: Pallas vs XLA crossover at shared-encode batch 4
# (b1 pallas 23.0 vs xla 25.5; b2 28.2 vs 22.2 — BASELINE "LD v2 int8
# serving") -> Pallas iff 2N >= 4.
LD_PALLAS_MIN_2N = 4

# LD v2 2N shared-encoder batching: b4 +16%, b1 -13% (hw_ld2_2n_ab)
# -> gated to batch >= 4 for variant 2 (v1 keeps it at every batch;
# v3-v5 measured negative and stay separate-encode).
LD2_2N_ENCODE_MIN_BATCH = 4

# Two-layer fused int8 encoder pairs (folded_conv2_q8): chains
# consecutive eligible encoder convs into one Pallas program — the
# intermediate's HBM read disappears, boundary rows recomputed
# (bit-exact).  Default off until the serving A/B lands
# (tools/hw/hw_fused2_ab.py); flipped by measurement only.
FUSED2_ENCODE = False

# Int8 no-grad VGG loss targets (train_q8_targets): 512px measured
# b8 60.6 -> 65.1 img/s (+7.5%), b4 +1.7% (noise), b1 -11% (the
# small-batch Mosaic/XLA engine mix) — bench.py --train 2026-08-20.
# Applied only at batch >= this when the knob is on.
TRAIN_Q8_TARGETS_MIN_BATCH = 4
