"""End-to-end segmentation-supervised training (network=seg_adain).

The reference wrote this path but left it unreachable: the seg head +
class-weighted CE exist (seg_adain_rp.py:6-35) yet the class crashes on
construction (commented-out class_weights, seg_adain_rp.py:87-96) and no
driver branch feeds labels.  Here it runs end-to-end: a Cityscapes
side-by-side dir yields (content, label), train.py passes content_label
into the loss, and the loss dict carries a nonzero seg_loss.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from rpst.config import load_config
from rpst.models import build_model
from rpst.models.seg_adain import (CITYSCAPES_CLASS_WEIGHTS, SegRPNet,
                                   cross_entropy_loss)
from rpst.nn.vgg import init_vgg_params

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# unit: cross_entropy_loss vs torch CrossEntropyLoss (the reference's
# CrossEntropy module, seg_adain_rp.py:6-22)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("weighted", [False, True])
def test_cross_entropy_vs_torch(rng, weighted):
    n, h, w, c = 2, 8, 8, 5
    logits = rng.normal(size=(n, h, w, c)).astype(np.float32)
    target = rng.integers(-1, c, size=(n, h, w)).astype(np.int32)
    weight = (np.asarray(CITYSCAPES_CLASS_WEIGHTS[:c], np.float32)
              if weighted else None)
    got = float(cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(target),
        jnp.asarray(weight) if weighted else None))
    tl = torch.nn.CrossEntropyLoss(
        weight=torch.from_numpy(weight) if weighted else None,
        ignore_index=-1)
    expected = float(tl(
        torch.from_numpy(logits.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(target.astype(np.int64))))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cross_entropy_upsamples_logits(rng):
    """Logits at feature res are bilinearly resized to the label res
    (seg_adain_rp.py:14-18)."""
    logits = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    target = rng.integers(0, 3, size=(1, 8, 8)).astype(np.int32)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    up = torch.nn.functional.interpolate(
        torch.from_numpy(logits.transpose(0, 3, 1, 2).copy()), size=(8, 8),
        mode="bilinear", align_corners=False)
    expected = float(torch.nn.CrossEntropyLoss(ignore_index=-1)(
        up, torch.from_numpy(target.astype(np.int64))))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_cross_entropy_all_ignored():
    logits = jnp.zeros((1, 4, 4, 3))
    target = jnp.full((1, 4, 4), -1, jnp.int32)
    assert float(cross_entropy_loss(logits, target)) == 0.0


def test_seg_head_shapes(rng):
    head = SegRPNet(rp_blocks=3, seg_hidden_dim=8, class_num=19)
    x = jnp.asarray(rng.random((2, 8, 8, 16), dtype=np.float32))
    variables = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(variables, x)
    assert out.shape == (2, 8, 8, 19)


# ---------------------------------------------------------------------------
# bundle-level: loss dict carries a nonzero, differentiable seg_loss
# ---------------------------------------------------------------------------

def test_seg_adain_loss_with_labels(rng):
    cfg = load_config(dict(network="seg_adain", rp_blocks=3, hidden_dim=4,
                           seg_hidden_dim=4, class_num=5, img_size=16,
                           seg_loss_weight=0.7))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    content = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    style = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    label = jnp.asarray(rng.integers(-1, 5, size=(2, 16, 16)).astype(np.int32))
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, content, style, vgg_vars)
    assert "seg_head" in variables["params"], "seg head params not created"

    total, (parts, _) = bundle.loss(variables, vgg_vars, content, style,
                                    content_label=label)
    assert "seg_loss" in parts and float(parts["seg_loss"]) > 0
    # weighted mixing: total includes seg_loss_weight * seg_loss
    expected = (float(parts["content_loss"]) + float(parts["style_loss"])
                + 0.7 * float(parts["seg_loss"]))
    np.testing.assert_allclose(float(total), expected, rtol=1e-5)

    # gradients reach the seg head
    def seg_part(params):
        _, (p, _) = bundle.loss({"params": params}, vgg_vars, content, style,
                                content_label=label)
        return p["seg_loss"]
    g = jax.grad(seg_part)(variables["params"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), g["seg_head"], 0.0)
    assert gnorm > 0

    # without labels the loss dict simply has no seg term
    _, (parts2, _) = bundle.loss(variables, vgg_vars, content, style)
    assert "seg_loss" not in parts2


# ---------------------------------------------------------------------------
# driver-level: train.py --config <seg yaml> takes steps with seg_loss
# ---------------------------------------------------------------------------

def _make_cityscapes_dir(root: Path, n: int = 2, size: int = 32):
    """Side-by-side (content | labelIds) pix2pix layout
    (reference utils/prepare_cityscapes_dataset.py:28-66)."""
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        photo = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        ids = rng.integers(0, 34, (size, size), dtype=np.uint8)
        label_rgb = np.repeat(ids[..., None], 3, axis=-1)
        Image.fromarray(np.concatenate([photo, label_rgb], axis=1),
                        "RGB").save(root / f"{i:02d}.png")


@pytest.mark.slow
def test_train_cli_seg(tmp_path):
    import yaml
    data = tmp_path / "data"
    _make_cityscapes_dir(data / "cityscapes")
    (data / "style").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8),
                        "RGB").save(data / "style" / f"{i:02d}.png")
    out = tmp_path / "out"
    cfg = dict(network="seg_adain", rp_blocks=2, hidden_dim=4,
               seg_hidden_dim=4, class_num=19, img_size=32, batch_size=2,
               max_iter=3, test_iter=100, snapshot_save_iter=2, log_iter=1,
               num_workers=0, lr=1e-4, seg_loss_weight=1.0,
               seg_dir=str(data / "cityscapes"),
               style_dir=str(data / "style"), output=str(out), vgg="")
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, str(REPO / "train.py"), "--config", str(cfg_path)],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]

    metrics = list((out / "logs").rglob("*.jsonl"))
    assert metrics
    rows = [json.loads(l) for l in metrics[0].read_text().splitlines() if l]
    seg_vals = [r["seg_loss"] for r in rows if "seg_loss" in r]
    assert seg_vals and all(v > 0 for v in seg_vals), rows
