"""End-to-end CLI driver tests: train.py / test.py run as subprocesses on
the CPU backend against synthetic data — the same drop-in surface as the
reference drivers (train.py --config <yaml>), covering arg parsing, the
output tree (logs/checkpoints/test dumps), resume, and test.py's
3-panel + stylized PNG outputs (reference test.py:139-150)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _make_data(root: Path, n: int = 2, size: int = 32):
    rng = np.random.default_rng(0)
    for sub in ["content", "style", "test/content", "test/style"]:
        (root / sub).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), dtype=np.uint8),
                "RGB").save(root / sub / f"{i:02d}.png")


def _write_cfg(path: Path, data: Path, out: Path, **over):
    import yaml
    cfg = dict(network="multi_adain", enc_stack_way="constant", rp_blocks=2,
               hidden_dim=8, inception_num=0, attention="none", img_size=32,
               batch_size=2, max_iter=3, test_iter=2, snapshot_save_iter=2,
               log_iter=1, num_workers=0, lr=1e-4, lr_decay=0.0,
               content_weight=1.0, style_weight=1.0, test_dataset="paired",
               content_dir=str(data / "content"), style_dir=str(data / "style"),
               test_dir=str(data / "test"), output=str(out), vgg="")
    cfg.update(over)
    path.write_text(yaml.safe_dump(cfg))


def _run(script: str, *args, env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, str(REPO / script), *args],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=600)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    data, out, cfg = tmp / "data", tmp / "out", tmp / "cfg.yaml"
    _make_data(data)
    _write_cfg(cfg, data, out)
    r = _run("train.py", "--config", str(cfg))
    assert r.returncode == 0, r.stderr[-2000:]
    return cfg, out


def test_train_cli_output_tree(trained):
    _, out = trained
    assert (out / "checkpoints").is_dir()
    assert (out / "logs").is_dir()
    ckpts = list((out / "checkpoints").iterdir())
    assert ckpts, "no checkpoint written"
    dumps = list((out / "test").rglob("*.png"))
    assert dumps, "no eval image dumps"


def test_train_cli_metrics_log(trained):
    _, out = trained
    metrics = list((out / "logs").rglob("*.jsonl"))
    assert metrics, "no JSONL metrics written"
    rows = [json.loads(l) for l in metrics[0].read_text().splitlines() if l]
    assert any("total_loss" in r for r in rows)


def test_test_cli_writes_panels(trained):
    cfg, out = trained
    ckpt = sorted((out / "checkpoints").iterdir(),
                  key=lambda p: p.name)[-1]
    r = _run("test.py", "--config", str(cfg),
             "--set", f"checkpoint_path={ckpt}", f"output={out}")
    assert r.returncode == 0, r.stderr[-2000:]
    pngs = list((out / "test").rglob("*-cat.png"))
    assert pngs, "no 3-panel comparison PNGs"


def test_train_cli_resume(trained):
    cfg, out = trained
    ckpt = sorted((out / "checkpoints").iterdir(), key=lambda p: p.name)[-1]
    r = _run("train.py", "--config", str(cfg),
             "--set", "resume=True", f"checkpoint_path={ckpt}", "max_iter=4")
    assert r.returncode == 0, r.stderr[-2000:]


def test_serve_cli(trained, tmp_path):
    cfg, out = trained
    dst = tmp_path / "served"
    data_dir = Path(str(cfg)).parent / "data"
    r = _run("serve.py", "--config", str(cfg),
             "--content", str(data_dir / "content"),
             "--style", str(data_dir / "style" / "00.png"),
             "--out", str(dst), "--mode", "folded", "--batch", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    outs = list(dst.glob("*.png"))
    assert len(outs) == 2, outs


def test_train_cli_mesh_tp(trained, tmp_path):
    """mesh_shape with data x model axes from the config: params/moments
    channel-shard over 'model' (TP), batch over 'data'."""
    cfg, out = trained
    r = _run("train.py", "--config", str(cfg),
             "--set", "mesh_shape={data: 2, model: 2}", "hidden_dim=32",
             "max_iter=3", "test_iter=1000", "snapshot_save_iter=1000",
             f"output={tmp_path / 'out_tp'}",
             env_extra={"XLA_FLAGS":
                        "--xla_force_host_platform_device_count=4"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mesh: {'data': 2, 'model': 2}" in r.stderr + r.stdout


def test_serve_cli_mesh(trained, tmp_path):
    """Data-parallel serving over a 2-device mesh, including the padded
    final chunk (3 images, batch 2, mesh 2), must write every output."""
    cfg, out = trained
    dst = tmp_path / "served_mesh"
    data_dir = Path(str(cfg)).parent / "data"
    extra = data_dir / "content" / "99.png"
    if not extra.exists():
        Image.fromarray(np.full((32, 32, 3), 128, np.uint8), "RGB").save(extra)
    r = _run("serve.py", "--config", str(cfg),
             "--content", str(data_dir / "content"),
             "--style", str(data_dir / "style" / "00.png"),
             "--out", str(dst), "--mode", "folded", "--batch", "2",
             "--mesh", "2",
             env_extra={"XLA_FLAGS":
                        "--xla_force_host_platform_device_count=2"})
    assert r.returncode == 0, r.stderr[-2000:]
    outs = list(dst.glob("*.png"))
    assert len(outs) == 3, outs


def test_serve_cli_spatial_mesh(trained, tmp_path):
    """Spatial serving: image ROWS sharded over a {data:1, spatial:2} mesh
    (the single-high-res-image multi-chip path), pixel-identical to the
    single-device outputs."""
    cfg, out = trained
    data_dir = Path(str(cfg)).parent / "data"
    single, spatial = tmp_path / "single", tmp_path / "spatial"
    common = ["--config", str(cfg),
              "--content", str(data_dir / "content"),
              "--style", str(data_dir / "style" / "00.png"),
              "--mode", "standard", "--batch", "1"]
    r = _run("serve.py", *common, "--out", str(single))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("serve.py", *common, "--out", str(spatial),
             "--mesh", "data=1,spatial=2",
             env_extra={"XLA_FLAGS":
                        "--xla_force_host_platform_device_count=2"})
    assert r.returncode == 0, r.stderr[-2000:]
    singles = sorted(single.glob("*.png"))
    spatials = sorted(spatial.glob("*.png"))
    assert [p.name for p in singles] == [p.name for p in spatials] != []
    for a, b in zip(singles, spatials):
        ia, ib = np.asarray(Image.open(a)), np.asarray(Image.open(b))
        assert np.abs(ia.astype(int) - ib.astype(int)).max() <= 1, a.name


@pytest.mark.parametrize("net", ["multi_adain", "sel_multi_adain", "ccam"])
def test_serve_cli_spatial_mesh_folded(tmp_path, net):
    """Folded serving over a {data:1, spatial:2} mesh goes through the
    shard_map fast path (per-shard Pallas kernels in interpret mode on
    CPU, ppermute halo rows, psum'd AdaIN stats / SE pools / CCAM
    energies) and must match the single-device folded outputs
    pixel-for-pixel."""
    data = tmp_path / "data"
    _make_data(data)
    cfg = tmp_path / "spatial_folded.yaml"
    # hidden 32 -> folded 128 channels: the Pallas-eligible lane width
    _write_cfg(cfg, data, tmp_path / "out_sf", hidden_dim=32, network=net,
               compute_dtype="float32")
    single, spatial = tmp_path / "single_f", tmp_path / "spatial_f"
    common = ["--config", str(cfg),
              "--content", str(data / "content"),
              "--style", str(data / "style" / "00.png"),
              "--mode", "folded", "--batch", "1"]
    r = _run("serve.py", *common, "--out", str(single))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("serve.py", *common, "--out", str(spatial),
             "--mesh", "data=1,spatial=2",
             env_extra={"XLA_FLAGS":
                        "--xla_force_host_platform_device_count=2"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "shard_map folded stylize" in r.stderr + r.stdout
    singles = sorted(single.glob("*.png"))
    spatials = sorted(spatial.glob("*.png"))
    assert [p.name for p in singles] == [p.name for p in spatials] != []
    for a, b in zip(singles, spatials):
        ia, ib = np.asarray(Image.open(a)), np.asarray(Image.open(b))
        assert np.abs(ia.astype(int) - ib.astype(int)).max() <= 1, a.name


def test_serve_cli_spatial_mesh_sanet(tmp_path):
    """Standard-mode SANet serving over a {data:1, spatial:2} mesh goes
    through the shard_map path (halo VGG encode, per-shard flash
    attention in interpret mode on CPU vs all-gathered style K/V) and
    must match the single-device outputs pixel-for-pixel."""
    data = tmp_path / "data"
    _make_data(data, size=64)
    cfg = tmp_path / "spatial_sanet.yaml"
    _write_cfg(cfg, data, tmp_path / "out_ss", network="sanet",
               img_size=64, compute_dtype="float32")
    single, spatial = tmp_path / "single_s", tmp_path / "spatial_s"
    common = ["--config", str(cfg),
              "--content", str(data / "content"),
              "--style", str(data / "style" / "00.png"),
              "--mode", "standard", "--batch", "1"]
    r = _run("serve.py", *common, "--out", str(single))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run("serve.py", *common, "--out", str(spatial),
             "--mesh", "data=1,spatial=2",
             env_extra={"XLA_FLAGS":
                        "--xla_force_host_platform_device_count=2"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "shard_map sanet stylize" in r.stderr + r.stdout
    singles = sorted(single.glob("*.png"))
    spatials = sorted(spatial.glob("*.png"))
    assert [p.name for p in singles] == [p.name for p in spatials] != []
    for a, b in zip(singles, spatials):
        ia, ib = np.asarray(Image.open(a)), np.asarray(Image.open(b))
        assert np.abs(ia.astype(int) - ib.astype(int)).max() <= 1, a.name


@pytest.mark.parametrize("net,over", [
    ("adain", {"hidden_dim": 32, "rp_blocks": 5}),
    ("sanet", {}),
    ("mrf", {"hidden_dim": 32, "rp_blocks": 5}),
    ("mst", {"hidden_dim": 32, "rp_blocks": 3, "stylized_layers": 1,
             "n_clusters": 2}),
    ("spade", {"hidden_dim": 32, "rp_blocks": 5}),
    ("ld_adain", {"hidden_dim": 16, "rp_blocks": 5, "use_mask": False}),
    ("ld_adain2", {"hidden_dim": 8, "rp_blocks": 5, "use_mask": False}),
])
def test_serve_cli_q8(tmp_path, net, over):
    """--mode q8 through the CLI on the CPU backend (the serve driver
    auto-selects interpret mode for the int8 Pallas kernels off-TPU) —
    covers the per-family calibrate/stylize dispatch with random params
    (no checkpoint)."""
    data = tmp_path / "data"
    _make_data(data)
    cfg = tmp_path / f"{net}.yaml"
    _write_cfg(cfg, data, tmp_path / f"out_{net}", network=net, **over)
    dst = tmp_path / f"served_q8_{net}"
    r = _run("serve.py", "--config", str(cfg),
             "--content", str(data / "content"),
             "--style", str(data / "style" / "00.png"),
             "--out", str(dst), "--mode", "q8", "--batch", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "falling back to standard" not in r.stderr + r.stdout
    outs = list(dst.glob("*.png"))
    assert len(outs) == 2, outs


def test_serve_cli_auto_mode(trained, tmp_path):
    """--mode auto resolves to the fastest supported path: the tiny h8
    train config is too narrow for the 128-lane int8 kernels (q8_infer
    gates on 4*hidden_dim alignment) but folds fine -> folded."""
    cfg, out = trained
    dst = tmp_path / "served_auto"
    data_dir = Path(str(cfg)).parent / "data"
    r = _run("serve.py", "--config", str(cfg),
             "--content", str(data_dir / "content"),
             "--style", str(data_dir / "style" / "00.png"),
             "--out", str(dst), "--mode", "auto", "--batch", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "--mode auto resolved to folded" in r.stderr + r.stdout
    assert len(list(dst.glob("*.png"))) >= 2


def test_train_profile_trace(tmp_path):
    """profile_iter captures a jax.profiler device trace under
    <output>/logs/trace (SURVEY §5 observability — the reference only
    prints wall-clock)."""
    data, out, cfg = tmp_path / "data", tmp_path / "out", tmp_path / "c.yaml"
    _make_data(data)
    _write_cfg(cfg, data, out, max_iter=4, test_iter=100,
               snapshot_save_iter=100, profile_iter=1, profile_steps=1)
    r = _run("train.py", "--config", str(cfg))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Wrote device trace" in r.stderr + r.stdout
    trace_files = list((out / "logs" / "trace").rglob("*"))
    assert any(f.is_file() for f in trace_files), trace_files
