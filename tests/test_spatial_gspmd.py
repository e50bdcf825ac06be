"""Spatial-mesh serving equality for the GSPMD families.

serve.py routes multi_adain/sel/ccam (folded) and sanet/dynamic_sanet
(standard) through hand-placed shard_map paths; every OTHER family under
``--mesh data=K,spatial=N`` takes XLA's GSPMD partitioning of the
standard program (the stride-1 conv halo exchanges derive from the
sharding annotations).  These tests pin that route per family: the exact
jit serve.py builds (u8 in → f32 stylize → u8 out, inputs/outputs
sharded ``P("data", "spatial")``) must reproduce the single-device
output to ≤1 u8 LSB on the virtual CPU mesh.

Reference models exercised: adain_rp.py:15-138 (adain), wct_rp.py:139-147,
mrf_rp.py:109-136, spade_rp.py:215-227, seg_adain_rp.py:38-165,
base.py:562-649 (src), adain_rp.py:484-858 (ld_adain1-5).

mst's graph-cut host callback is documented spatially-unsupported
(serve.py docstring); the CLI test pins the clean error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rpst.config import load_config
from rpst.dist import make_mesh
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params

pytestmark = pytest.mark.slow

_TINY = dict(img_size=32, rp_blocks=2, hidden_dim=8, inception_num=0,
             attention="none", compute_dtype="float32")

FAMILIES = [
    ("adain", {}),
    ("wct", {}),
    ("mrf", {}),
    ("spade", {}),
    ("seg_adain", {}),
    ("src", {}),
    ("ld_adain", {"use_mask": False}),
    ("ld_adain2", {"use_mask": False}),
    ("ld_adain3", {"use_mask": False}),
    ("ld_adain4", {"use_mask": False}),
    ("ld_adain5", {"use_mask": False}),
]


def _build(net, over, rng):
    cfg = load_config({**_TINY, "network": net, **over})
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    img = cfg.img_size
    content = jnp.asarray(rng.random((2, img, img, 3), np.float32))
    style = jnp.asarray(rng.random((2, img, img, 3), np.float32))
    _, vgg_vars = init_vgg_params(key, num_stages=bundle.vgg_stages)
    variables = bundle.init(key, content, style, vgg_vars)
    return bundle, vgg_vars, variables, content, style


def _run_u8_fn(bundle, vgg_vars):
    """The exact math serve.py jits (serve.py::_run_u8): uint8 transfer
    boundary, f32 stylize, clip*255+0.5 floor back to uint8."""
    def run(variables, content, style):
        c = content.astype(jnp.float32) / 255.0
        s = style.astype(jnp.float32) / 255.0
        y = bundle.stylize(variables, vgg_vars, c, s)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
        return y.astype(jnp.uint8)
    return run


@pytest.mark.parametrize("net,over", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_gspmd_spatial_matches_single_device(net, over, rng):
    bundle, vgg_vars, variables, content, style = _build(net, over, rng)
    run = _run_u8_fn(bundle, vgg_vars)
    c_u8 = (np.asarray(content) * 255).astype(np.uint8)
    s_u8 = (np.asarray(style) * 255).astype(np.uint8)

    ref = np.asarray(jax.jit(run)(variables, jnp.asarray(c_u8),
                                  jnp.asarray(s_u8)))

    mesh = make_mesh({"data": 1, "spatial": 2}, jax.devices()[:2])
    img_spec = NamedSharding(mesh, P("data", "spatial"))
    rep = NamedSharding(mesh, P())
    run_sharded = jax.jit(run, in_shardings=(rep, img_spec, img_spec),
                          out_shardings=img_spec)
    got = np.asarray(run_sharded(
        jax.device_put(variables, rep),
        jax.device_put(jnp.asarray(c_u8), img_spec),
        jax.device_put(jnp.asarray(s_u8), img_spec)))

    diff = np.abs(ref.astype(int) - got.astype(int)).max()
    assert diff <= 1, f"{net}: max u8 diff {diff}"


def test_gspmd_spatial_data_axis_combo(rng):
    """data=2,spatial=2 over 4 devices for one representative GSPMD
    family — both axes at once (batch AND rows sharded)."""
    bundle, vgg_vars, variables, content, style = _build("adain", {}, rng)
    run = _run_u8_fn(bundle, vgg_vars)
    c_u8 = jnp.asarray((np.asarray(content) * 255).astype(np.uint8))
    s_u8 = jnp.asarray((np.asarray(style) * 255).astype(np.uint8))
    ref = np.asarray(jax.jit(run)(variables, c_u8, s_u8))

    mesh = make_mesh({"data": 2, "spatial": 2}, jax.devices()[:4])
    img_spec = NamedSharding(mesh, P("data", "spatial"))
    rep = NamedSharding(mesh, P())
    got = np.asarray(jax.jit(run, in_shardings=(rep, img_spec, img_spec),
                             out_shardings=img_spec)(
        jax.device_put(variables, rep),
        jax.device_put(c_u8, img_spec),
        jax.device_put(s_u8, img_spec)))
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1


def test_mst_spatial_mesh_clean_error(tmp_path):
    """mst + spatial mesh through the serve CLI fails fast with the
    documented message (graph-cut host callback cannot shard spatially)
    instead of crashing mid-compile."""
    from tests.test_cli_drivers import _make_data, _run, _write_cfg

    data = tmp_path / "data"
    _make_data(data)
    cfg = tmp_path / "mst.yaml"
    _write_cfg(cfg, data, tmp_path / "out_mst", network="mst",
               hidden_dim=8, rp_blocks=2, stylized_layers=1, n_clusters=2)
    r = _run("serve.py", "--config", str(cfg),
             "--content", str(data / "content"),
             "--style", str(data / "style" / "00.png"),
             "--out", str(tmp_path / "served"), "--mode", "standard",
             "--batch", "1", "--mesh", "data=1,spatial=2",
             env_extra={"XLA_FLAGS":
                        "--xla_force_host_platform_device_count=2"})
    assert r.returncode != 0
    assert "cannot shard spatially" in r.stderr
    assert "data-only mesh" in r.stderr
