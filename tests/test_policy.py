"""The measured crossover policy (rpst/policy.py) must match
BASELINE.md's measured winners per (family, batch), and drive
``--mode auto`` / the engine gates (round-4 VERDICT item 5)."""

import pytest

from rpst import policy
from rpst.config import load_config
from rpst.models import build_model
from rpst.serving import resolve_mode


def _bundle(net, **over):
    base = dict(network=net, img_size=32, rp_blocks=2, hidden_dim=32,
                inception_num=0, attention="none")
    base.update(over)
    return build_model(load_config(base))


class TestQ8Winners:
    """Pins the table to BASELINE.md's measured winners."""

    def test_always_win_families(self):
        for fam in ("multi_adain", "adain", "seg_adain", "wct", "sanet",
                    "mrf", "sel_multi_adain", "ld_adain"):
            for b in (1, 2, 4, 8):
                assert policy.q8_preferred(fam, b), (fam, b)

    def test_ld2_b1_regression(self):
        # BASELINE "LD v2 int8 serving": b1 26.9 -> 25.5 (-5%), b2 +35%
        assert not policy.q8_preferred("ld_adain2", 1)
        assert policy.q8_preferred("ld_adain2", 2)
        assert policy.q8_preferred("ld_adain2", 4)

    def test_dynamic_sanet_src_cross_at_b4(self):
        # sweep: dynamic_sanet q8 71.3 vs bf16 75.0 at b1; 128.4 vs 81.6
        # at b4; src 83.0 vs 88.0 b1, 147.0 vs 96.3 b4
        for fam in ("dynamic_sanet", "src"):
            assert not policy.q8_preferred(fam, 1), fam
            assert policy.q8_preferred(fam, 4), fam

    def test_mst_inverts_above_b3(self):
        # b1 q8 167.0 > bf16 157.4; b4 folded-bf16 246 > q8 210.3
        assert policy.q8_preferred("mst", 1)
        assert not policy.q8_preferred("mst", 4)
        assert not policy.q8_preferred("mst", 8)

    def test_never_win_families(self):
        for fam in ("spade", "ccam"):
            for b in (1, 4, 8):
                assert not policy.q8_preferred(fam, b), (fam, b)

    def test_unknown_family_defaults_off(self):
        assert not policy.q8_preferred("nonexistent", 4)


class TestResolveModeBatch:
    """--mode auto consults the table with the serving batch."""

    def test_ld2_b1_serves_bf16_under_auto(self):
        b = _bundle("ld_adain2", hidden_dim=8, rp_blocks=5,
                    use_mask=False)
        assert b.q8_infer()  # q8 exists — but is not the b1 winner
        assert resolve_mode(b, "auto", batch=1, q8_native=True) \
            == "standard"
        assert resolve_mode(b, "auto", batch=2, q8_native=True) == "q8"

    def test_mst_auto_by_batch(self):
        b = _bundle("mst", exec_strategy="folded", stylized_layers=1,
                    n_clusters=2)
        assert resolve_mode(b, "auto", batch=1, q8_native=True) == "q8"
        assert resolve_mode(b, "auto", batch=8, q8_native=True) \
            == "folded"

    def test_spade_auto_never_q8(self):
        b = _bundle("spade", hidden_dim=8)
        assert resolve_mode(b, "auto", batch=8, q8_native=True) \
            == "standard"

    def test_explicit_q8_still_works(self):
        b = _bundle("spade", hidden_dim=8)
        assert resolve_mode(b, "q8", batch=8, q8_native=True) == "q8"

    def test_cpu_backend_never_q8(self):
        b = _bundle("multi_adain", exec_strategy="folded")
        assert resolve_mode(b, "auto", batch=8) == "folded"


class TestEngineConstants:
    """The engine gates read the table (spot-check the wired values)."""

    def test_constants_match_baseline(self):
        assert policy.FOLDED_PALLAS_MAX_BATCH == 4
        assert policy.WIDE_K_MIN_BATCH == 4
        assert policy.LD_MIXED_ENGINE_MIN_2N == 8
        assert policy.LD_PALLAS_MIN_2N == 4
        assert policy.LD2_2N_ENCODE_MIN_BATCH == 4

    def test_q8_recommended_takes_batch(self):
        b = _bundle("ld_adain2", hidden_dim=8, rp_blocks=5,
                    use_mask=False)
        assert not b.q8_recommended(1)
        assert b.q8_recommended(2)
        # no-batch call keeps the family-level (serving default) answer
        assert b.q8_recommended() == b.q8_recommended(8)
