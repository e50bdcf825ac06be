"""Drop-in config compatibility: every reference YAML builds a model.

The reference ships 36 configs under config/rl and config/v100 (SURVEY
§2.1); all must load verbatim through our schema and construct their
network. Uses tiny img_size overrides so construction stays cheap."""

from pathlib import Path

import pytest

from rpst.config import load_config
from rpst.models import build_model

REF_CONFIG_DIR = Path("/root/reference/config")

pytestmark = pytest.mark.skipif(not REF_CONFIG_DIR.exists(),
                                reason="reference configs not mounted")

ALL_YAMLS = sorted(REF_CONFIG_DIR.glob("*/*.yaml"))


def test_found_all_reference_configs():
    assert len(ALL_YAMLS) >= 30, [p.name for p in ALL_YAMLS]


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_reference_yaml_loads_and_builds(path):
    cfg = load_config(path, overrides={"img_size": 32})
    bundle = build_model(cfg)
    assert bundle.model is not None
    assert bundle.network == cfg.network


def test_flagship_config_values():
    """Spot-check the flagship YAML parses to the expected architecture."""
    cfg = load_config(REF_CONFIG_DIR / "rl" /
                      "train_constant_multiscale_rp_adain.yaml")
    assert cfg.network == "multi_adain"
    assert cfg.enc_stack_way == "constant"
    assert cfg.rp_blocks == 5 and cfg.hidden_dim == 32
    assert cfg.attention == "se"
    assert cfg.img_size == 512 and cfg.batch_size == 2
    assert cfg.lr == 1e-4 and cfg.lr_decay == 1e-5
    assert cfg.use_mask is True and cfg.test_dataset == "photoreal"
