"""Mesh-aware engine gating (``rpst.ops.engine``).

Mosaic (Pallas) custom calls carry no SPMD partitioning rule; every gate
that can auto-select a Pallas kernel must refuse inside a >1-device
GSPMD trace (round-4 VERDICT item 2 / ADVICE item 1).  On the CPU test
backend ``mosaic_ok()`` is always False, so these tests pin the CONTEXT
mechanics (the part that is unverifiable on single-chip TPU hardware)
plus the sharded-step integration: a sanet/dynamic_sanet train step
under a {data:2} mesh must compile and run — on a real TPU mesh the
flash-attention gate (models/sanet.py) would otherwise have put a
Mosaic call inside the GSPMD program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpst.ops import engine


def test_gspmd_trace_nesting_and_restore():
    assert engine.gspmd_devices() == 1
    with engine.gspmd_trace(8):
        assert engine.gspmd_devices() == 8
        with engine.gspmd_trace(2):
            assert engine.gspmd_devices() == 2
        assert engine.gspmd_devices() == 8
    assert engine.gspmd_devices() == 1


def test_gspmd_trace_restores_on_exception():
    try:
        with engine.gspmd_trace(4):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert engine.gspmd_devices() == 1


def test_mosaic_ok_denies_gspmd(monkeypatch):
    # simulate the TPU backend so only the mesh dimension varies
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert engine.mosaic_ok()
    with engine.gspmd_trace(2):
        assert not engine.mosaic_ok()
    assert engine.mosaic_ok()


def test_mosaic_ok_false_on_cpu():
    assert jax.default_backend() == "cpu"
    assert not engine.mosaic_ok()


def test_folded_auto_respects_gspmd(monkeypatch):
    """fast_path._conv_lrelu 'auto' must not pick Pallas inside a GSPMD
    trace even where the single-device policy would (batch <= 4)."""
    calls = []
    from rpst.models import fast_path
    from rpst.ops.pallas import folded_conv as fc

    def fake_pallas(x, k, b):
        calls.append("pallas")
        return fast_path._lrelu(fast_path.folded_conv(x, k, b))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(fast_path, "folded_conv_lrelu", fake_pallas,
                        raising=False)
    # folded_conv_lrelu is imported at fast_path module top level
    import rpst.models.fast_path as fp
    monkeypatch.setattr(fp, "folded_conv_lrelu", fake_pallas)

    x = jnp.zeros((1, 8, 8, 128))
    k = jnp.zeros((3, 3, 128, 128))
    b = jnp.zeros((128,))
    fp._conv_lrelu(x, k, b, use_pallas="auto")
    assert calls == ["pallas"]  # single device, b1: Pallas picked
    calls.clear()
    with engine.gspmd_trace(2):
        fp._conv_lrelu(x, k, b, use_pallas="auto")
    assert calls == []  # GSPMD trace: XLA path
    # explicit True (shard_map per-shard callers) is NOT overridden
    with engine.gspmd_trace(2):
        fp._conv_lrelu(x, k, b, use_pallas=True)
    assert calls == ["pallas"]


@pytest.mark.parametrize("network", ["sanet", "dynamic_sanet"])
def test_attention_family_sharded_step_runs(network, tiny_vgg_weights=None):
    """A sanet-family train step under a {data:2} mesh compiles and runs
    (the hazard fixed by the mesh-aware flash-attention gate)."""
    from rpst.config import load_config
    from rpst.dist import make_mesh, make_sharded_train_step, replicate, \
        shard_batch
    from rpst.models import build_model
    from rpst.nn.vgg import init_vgg_params
    from rpst.train import create_train_state

    cfg = load_config(dict(network=network, img_size=32, batch_size=2,
                           rp_blocks=3, hidden_dim=8))
    bundle = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    _, vgg_vars = init_vgg_params(jax.random.PRNGKey(1),
                                  num_stages=bundle.vgg_stages)
    c = jnp.asarray(np.random.default_rng(0).uniform(
        size=(2, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(np.random.default_rng(1).uniform(
        size=(2, 32, 32, 3)).astype(np.float32))
    state, tx = create_train_state(bundle, rng, c, s, vgg_vars)
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    state = replicate(state, mesh)
    vgg_r = replicate(vgg_vars, mesh)
    step = make_sharded_train_step(bundle, tx, mesh)
    new_state, parts = step(state, vgg_r,
                            shard_batch(c, mesh), shard_batch(s, mesh))
    assert np.isfinite(float(parts["total_loss"]))
