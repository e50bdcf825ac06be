#!/usr/bin/env python
"""One-command golden parity vs REAL reference weights.

The environment this repo is built in ships no ``vgg_normalised.pth`` and
no trained reference decoders, so the acceptance item "golden-image parity
vs the PyTorch reference with real weights" (BASELINE.md target: <1e-2
mean abs pixel error) cannot fire until a user supplies them.  This tool
is that trigger: point it at a directory of reference weights and it runs
the full comparison and appends the results to BASELINE.md.

    python tools/golden_parity.py --weights-dir models/ [--img-size 64]
        [--append-baseline]

Expected directory contents (all optional except the VGG):
  * ``vgg_normalised.pth``   — the frozen perceptual encoder
    (reference train.py:91); per-stage feature parity is checked first;
  * any ``*.pth`` reference checkpoints.  Formats auto-detected
    (tools/import_reference_checkpoint.convert_tree):
      {'encoder','decoder'} Sequential      -> adain / wct (by filename)
      {'encoder','decoder'} Conv2dBlock     -> multi_adain family
      {'decoder','transform'}               -> sanet / dynamic_sanet
    Architecture hyperparameters (rp_blocks, hidden_dim, stack way,
    inception, SE) are inferred from the tensors themselves.

Exits 0 with a SKIP message when no weights are present, so it is safe in
CI.  Everything runs on the CPU backend for determinism against the
CPU-only torch oracle; comparison inputs are fixed synthetic images.
"""

import argparse
import datetime
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np


def _mae(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).mean())


def _infer_rpseq_cfg(tree, name):
    enc = tree["params"]["encoder"]
    n = len(enc)
    hidden = enc["conv_0"]["Conv_0"]["kernel"].shape[-1]
    net = "wct" if "wct" in name.lower() else "adain"
    return dict(network=net, rp_blocks=n, hidden_dim=hidden)


def _infer_rpstack_cfg(tree, name):
    enc = tree["params"]["rp_shared_encoder"]
    n = len(enc)
    outs = [enc[f"block_{i}"]["PadConv_0"]["Conv_0"]["kernel"].shape[-1]
            for i in range(n)]
    way = "constant" if len(set(outs)) == 1 else "deeper"
    inception = sum(1 for k in enc["block_0"] if k.startswith("inception_"))
    att = "se" if "SEBottleneck_0" in enc["block_0"] else "none"
    # NB: ccam/mst checkpoints carry only encoder/decoder (the reference
    # never registers/saves the CCAM params — SURVEY §2.3), so every
    # rpstack checkpoint compares through the multi_adain decode path
    return dict(network="multi_adain", rp_blocks=n, hidden_dim=outs[0],
                enc_stack_way=way, inception_num=inception, attention=att,
                shuffle=False, sort=False)


def _infer_sanet_cfg(tree, name, img_size):
    adaptive = "aea" in tree["params"]["transform"]["sanet4_1"]
    return dict(network="dynamic_sanet" if adaptive else "sanet",
                img_size=img_size)


def _merge(dst, src):
    """Recursively overwrite dst's subtrees with src's (src ⊆ dst)."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def run(weights_dir: Path, img_size: int, append: bool) -> int:
    vgg_path = weights_dir / "vgg_normalised.pth"
    if not vgg_path.exists():
        print(f"SKIP: no vgg_normalised.pth under {weights_dir} — supply "
              "reference weights to run golden parity (see tool docstring)")
        return 0

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    import reference_oracle as ro
    from import_reference_checkpoint import convert_tree
    from rpst.config import load_config
    from rpst.models import build_model
    from rpst.nn.vgg import load_vgg_params

    rng = np.random.default_rng(0)
    content = rng.random((1, img_size, img_size, 3)).astype(np.float32)
    style = rng.random((1, img_size, img_size, 3)).astype(np.float32)
    rows = []

    # --- 1. VGG per-stage feature parity ---------------------------------
    vgg_mod, vgg_vars = load_vgg_params(str(vgg_path), num_stages=5)
    feats = jax.jit(lambda x: vgg_mod.apply(vgg_vars, x))(
        jnp.asarray(content))
    tvgg = ro.fresh_vgg()
    tvgg.load_state_dict(torch.load(str(vgg_path), map_location="cpu"))
    slices = [(0, 4), (4, 11), (11, 18), (18, 31), (31, 44)]
    x = ro.to_torch(content)
    with torch.no_grad():
        for stage, (a, b) in enumerate(slices):
            x = tvgg[a:b](x)
            mae = _mae(feats[stage], ro.to_nhwc(x))
            rows.append((f"vgg relu{stage + 1}_1", mae, mae < 1e-2))

    # --- 2. per-checkpoint end-to-end stylize parity ---------------------
    network = ro.load_reference()
    for ckpt_path in sorted(weights_dir.glob("*.pth")):
        if ckpt_path.name == "vgg_normalised.pth":
            continue
        name = ckpt_path.stem
        try:
            ckpt = torch.load(str(ckpt_path), map_location="cpu")
            tree = convert_tree(ckpt)
        except Exception as e:  # noqa: BLE001 — report, keep scanning
            rows.append((f"{name} [{type(e).__name__}: {e}]", float("nan"),
                         False))
            continue

        kind = tree["kind"]
        if kind == "rpseq":
            cfg_d = _infer_rpseq_cfg(tree, name)
        elif kind == "rpstack":
            cfg_d = _infer_rpstack_cfg(tree, name)
        else:
            cfg_d = _infer_sanet_cfg(tree, name, img_size)
        cfg_d.update(img_size=img_size, use_mask=False)
        cfg = load_config(cfg_d)
        bundle = build_model(cfg)
        variables = bundle.init(jax.random.PRNGKey(0), jnp.asarray(content),
                                jnp.asarray(style), vgg_vars)
        variables = dict(variables)
        variables["params"] = _merge(variables["params"], tree["params"])
        if tree["batch_stats"]:
            variables["batch_stats"] = _merge(
                variables.get("batch_stats", {}), tree["batch_stats"])
        got = np.asarray(jax.jit(
            lambda v, c, s: bundle.stylize(v, vgg_vars, c, s))(
                variables, jnp.asarray(content), jnp.asarray(style)))

        # torch side: real weights into the published reference classes
        import tempfile
        opt = dict(rp_blocks=cfg.rp_blocks, hidden_dim=cfg.hidden_dim,
                   shuffle=False, shuffle_layers=1, sort=False,
                   stylized_layers=cfg.rp_blocks,
                   enc_stack_way=cfg_d.get("enc_stack_way", "constant"),
                   inception_num=cfg_d.get("inception_num") or None,
                   attention=cfg_d.get("attention", "none"), resume=False,
                   use_mask=False, content_weight=1.0, style_weight=1.0,
                   l_identity1_weight=50.0, l_identity2_weight=1.0,
                   ada_module="aea", output=tempfile.mkdtemp())
        if kind == "rpseq" and cfg.network == "adain":
            tnet = network.AdaINRPNet(opt, ro.fresh_vgg())
        elif kind == "rpseq":
            tnet = network.WCTRPNet(opt, ro.fresh_vgg())
        elif kind == "rpstack":
            tnet = network.MultiScaleAdaINRPNet(opt, ro.fresh_vgg())
        elif cfg.network == "sanet":
            tnet = network.SAModel(opt, ro.fresh_vgg(), 0, img_size)
        else:
            tnet = network.AdaptiveSAModel(opt, ro.fresh_vgg(), 0, img_size)
        if kind in ("rpseq", "rpstack"):
            tnet.rp_shared_encoder.load_state_dict(ckpt["encoder"])
            tnet.rp_decoder.load_state_dict(ckpt["decoder"])
        else:
            tnet.decoder.load_state_dict(ckpt["decoder"])
            tnet.transform.load_state_dict(ckpt["transform"])
        with torch.no_grad():
            expected = tnet.test(ro.to_torch(content), ro.to_torch(style))
        mae = _mae(got, ro.to_nhwc(expected))
        rows.append((f"{name} ({cfg.network})", mae, mae < 1e-2))

    # --- report ----------------------------------------------------------
    print(f"{'case':48s} {'MAE':>12s}  pass(<1e-2)")
    for label, mae, ok in rows:
        print(f"{label:48s} {mae:12.3e}  {'PASS' if ok else 'FAIL'}")
    n_pass = sum(ok for _, _, ok in rows)
    print(f"{n_pass}/{len(rows)} passed")

    if append:
        date = datetime.date.today().isoformat()
        with open(REPO / "BASELINE.md", "a") as f:
            f.write(f"\n## Golden parity vs real reference weights "
                    f"({date}, tools/golden_parity.py)\n\n")
            f.write("| case | mean abs pixel/feature error | pass(<1e-2) |\n"
                    "|---|---|---|\n")
            for label, mae, ok in rows:
                f.write(f"| {label} | {mae:.3e} | "
                        f"{'yes' if ok else 'NO'} |\n")
        print("appended results to BASELINE.md")
    return 0 if n_pass == len(rows) else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights-dir", type=Path, default=REPO / "models")
    ap.add_argument("--img-size", type=int, default=64)
    ap.add_argument("--append-baseline", action="store_true")
    a = ap.parse_args()
    raise SystemExit(run(a.weights_dir, a.img_size, a.append_baseline))
