"""Golden regression fixtures: deterministic tiny stylize outputs per
model family, committed as .npz. Catches unintended numeric changes from
refactors (the parity suite checks math against torch; this checks *us*
against ourselves).

Regenerate after an INTENDED change with:
    python tests/test_goldens.py regen
"""

import os
import sys
from pathlib import Path

if __name__ == "__main__":  # regen mode: replicate conftest's env setup
    # (env vars are too late — sitecustomize may import jax first; the
    # config update below forces the CPU backend either way)
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params

pytestmark = pytest.mark.slow

GOLDEN_DIR = Path(__file__).parent / "goldens"

CASES = {
    "adain": dict(network="adain", rp_blocks=3, hidden_dim=4, img_size=16),
    "multi_adain": dict(network="multi_adain", enc_stack_way="constant",
                        rp_blocks=3, hidden_dim=8, img_size=16),
    "wct": dict(network="wct", rp_blocks=3, hidden_dim=4, img_size=16),
    "mrf": dict(network="mrf", rp_blocks=3, hidden_dim=4, img_size=16, k=3),
    "spade": dict(network="spade", rp_blocks=3, hidden_dim=4, img_size=16,
                  ndf=4),
    "src": dict(network="src", img_size=32),
    "sanet": dict(network="sanet", img_size=32),
    "ld_adain4": dict(network="ld_adain4", ld_layer_num=2, hidden_dim=4,
                      img_size=16, stylized_layers=2),
    "ld_adain": dict(network="ld_adain", ld_layer_num=2, hidden_dim=4,
                     img_size=16, stylized_layers=2),
    "ld_adain2": dict(network="ld_adain2", ld_layer_num=2, hidden_dim=4,
                      img_size=16, stylized_layers=2),
    "ld_adain3": dict(network="ld_adain3", ld_layer_num=2, hidden_dim=4,
                      img_size=16, stylized_layers=2),
    "ld_adain5": dict(network="ld_adain5", ld_layer_num=2, hidden_dim=4,
                      img_size=16, stylized_layers=2),
    "ccam": dict(network="ccam", rp_blocks=3, hidden_dim=8, img_size=16),
    "sel_multi_adain": dict(network="sel_multi_adain", rp_blocks=3,
                            hidden_dim=16, img_size=16),
    "mst": dict(network="mst", rp_blocks=3, hidden_dim=8, img_size=16,
                stylized_layers=1),
    "seg_adain": dict(network="seg_adain", rp_blocks=3, hidden_dim=4,
                      img_size=16),
    "dynamic_sanet": dict(network="dynamic_sanet", img_size=64),
    # segment-masked AdaIN path (labels fed at stylize time)
    "multi_adain_masked": dict(network="multi_adain", rp_blocks=3,
                               hidden_dim=8, img_size=16, use_mask=True,
                               max_seg_labels=4),
}


def _compute(name):
    cfg = load_config(dict(CASES[name]))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(42)
    rng = np.random.default_rng(42)
    s = cfg.img_size
    content = jnp.asarray(rng.random((1, s, s, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, s, s, 3)).astype(np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=bundle.vgg_stages)
    variables = bundle.init(key, content, style, vgg_vars)
    if cfg.get("use_mask"):
        labels = rng.integers(0, 3, size=(2, 1, s, s)).astype(np.int32)
        out = bundle.stylize(variables, vgg_vars, content, style,
                             jnp.asarray(labels[0]), jnp.asarray(labels[1]))
    else:
        out = bundle.stylize(variables, vgg_vars, content, style)
    return np.asarray(out, np.float32)


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    path = GOLDEN_DIR / f"{name}.npz"
    assert path.exists(), f"golden missing — run: python {__file__} regen"
    golden = np.load(path)["out"]
    got = _compute(name)
    assert got.shape == golden.shape
    np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name in sorted(CASES):
            np.savez_compressed(GOLDEN_DIR / f"{name}.npz",
                                out=_compute(name))
            print("wrote", name)
