"""Drop-in config compatibility: every reference YAML builds a model.

The reference ships 36 configs under config/rl and config/v100 (SURVEY
§2.1); all must load verbatim through our schema and construct their
network. Uses tiny img_size overrides so construction stays cheap."""

from pathlib import Path

import pytest

from rpst.config import load_config
from rpst.models import build_model

REF_CONFIG_DIR = Path("/root/reference/config")

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not REF_CONFIG_DIR.exists(),
                                 reason="reference configs not mounted")]

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


_MODEL_KEYS = ("network", "enc_stack_way", "rp_blocks", "hidden_dim",
               "inception_num", "attention", "shuffle", "sort",
               "stylized_layers", "ld_layer_num", "k", "ndf", "spade_norm",
               "ada_module", "use_mask")


def _distinct_model_cfgs():
    """One representative YAML per distinct model configuration."""
    seen, out = set(), []
    for p in ALL_YAMLS:
        if not p.stem.startswith("train"):
            continue
        cfg = load_config(p, overrides={"img_size": 16, "batch_size": 1,
                                        "use_mask": False})
        key = tuple((k, cfg.get(k)) for k in _MODEL_KEYS)
        if key not in seen:
            seen.add(key)
            out.append(p)
    return out


@pytest.mark.parametrize("path", _distinct_model_cfgs() or [None],
                         ids=lambda p: p.stem if p else "none")
def test_reference_yaml_runs_one_loss_step(path):
    """Every distinct reference model configuration computes a finite
    training loss (not just constructs) at tiny size."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rpst.nn.vgg import init_vgg_params

    if path is None:
        pytest.skip("reference configs not mounted")
    cfg = load_config(path, overrides={"img_size": 16, "batch_size": 1,
                                       "use_mask": False, "resume": False})
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    content = jnp.asarray(r.random((1, 16, 16, 3)).astype(np.float32))
    style = jnp.asarray(r.random((1, 16, 16, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(rng, num_stages=bundle.vgg_stages)
    variables = bundle.init(rng, content, style, vgg_vars)
    total, (parts, _) = bundle.loss(variables, vgg_vars, content, style,
                                    train=True)
    assert np.isfinite(float(total)), (path.name, parts)
