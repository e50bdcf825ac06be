"""End-to-end model parity vs torch oracles built from the published
architecture, with IDENTICAL weights injected from the flax params.

This is the strongest form of the <1e-2 mean-abs-pixel-error target
(BASELINE.md): same inputs + same weights ⇒ near-identical stylized
pixels across frameworks."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from rpst.config import load_config
from rpst.models import build_model
from rpst.nn.vgg import init_vgg_params


def _inject_conv(conv, params):
    with torch.no_grad():
        k = np.asarray(params["kernel"])
        conv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy()))
        conv.bias.copy_(torch.from_numpy(np.asarray(params["bias"]).copy()))


class TorchRPSeq(tnn.Module):
    """torch oracle of RPSequence: zero-padded Conv2d + ReLU stacks
    (the published build_increase/decrease_depth architecture)."""

    def __init__(self, dims, flax_params):
        super().__init__()
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(i, o, 3, padding=1) for i, o in dims])
        for idx, conv in enumerate(self.convs):
            _inject_conv(conv, flax_params[f"conv_{idx}"]["Conv_0"])

    def forward(self, x):
        for conv in self.convs:
            x = torch.relu(conv(x))
        return x


def _torch_adain(c, s, eps=1e-5):
    def stats(x):
        n, ch = x.shape[:2]
        v = x.reshape(n, ch, -1).var(dim=2) + eps
        return (x.reshape(n, ch, -1).mean(dim=2).reshape(n, ch, 1, 1),
                v.sqrt().reshape(n, ch, 1, 1))
    cm, cs = stats(c)
    sm, ss = stats(s)
    return (c - cm) / cs * ss + sm


def test_adain_rp_full_model_parity(rng):
    """AdaINRP stylize == torch(enc→AdaIN→dec) with identical weights."""
    from rpst.nn.blocks import rp_decrease_dims, rp_increase_dims
    cfg = load_config(dict(network="adain", rp_blocks=4, hidden_dim=8,
                           img_size=32))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(7)
    content = rng.random((1, 32, 32, 3)).astype(np.float32)
    style = rng.random((1, 32, 32, 3)).astype(np.float32)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, jnp.asarray(content), jnp.asarray(style),
                            vgg_vars)
    got = np.asarray(bundle.stylize(variables, vgg_vars,
                                    jnp.asarray(content), jnp.asarray(style)))

    enc_out = 8 * 2 ** 3
    enc = TorchRPSeq(rp_increase_dims(4, 3, 8, enc_out),
                     variables["params"]["encoder"])
    dec = TorchRPSeq(rp_decrease_dims(4, enc_out, enc_out // 2, 3),
                     variables["params"]["decoder"])
    tc = torch.from_numpy(np.transpose(content, (0, 3, 1, 2)).copy())
    ts = torch.from_numpy(np.transpose(style, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        fused = _torch_adain(enc(tc), enc(ts))
        expected = dec(fused).numpy()

    mae = np.abs(got - np.transpose(expected, (0, 2, 3, 1))).mean()
    assert mae < 1e-2, f"mean abs pixel error {mae}"
    np.testing.assert_allclose(got, np.transpose(expected, (0, 2, 3, 1)),
                               rtol=1e-2, atol=1e-3)


def test_wct_rp_full_model_parity(rng):
    """WCTRP stylize vs torch oracle (f64 SVD whiten/color)."""
    from rpst.nn.blocks import rp_decrease_dims, rp_increase_dims
    cfg = load_config(dict(network="wct", rp_blocks=3, hidden_dim=4,
                           img_size=16))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(3)
    content = rng.random((1, 16, 16, 3)).astype(np.float32)
    style = rng.random((1, 16, 16, 3)).astype(np.float32)
    _, vgg_vars = init_vgg_params(key, num_stages=4)
    variables = bundle.init(key, jnp.asarray(content), jnp.asarray(style),
                            vgg_vars)
    got = np.asarray(bundle.stylize(variables, vgg_vars,
                                    jnp.asarray(content), jnp.asarray(style)))

    from tests.test_ops_wct import _torch_wct
    enc_out = 4 * 2 ** 2
    enc = TorchRPSeq(rp_increase_dims(3, 3, 4, enc_out),
                     variables["params"]["encoder"])
    dec = TorchRPSeq(rp_decrease_dims(3, enc_out, enc_out // 2, 3),
                     variables["params"]["decoder"])
    tc = torch.from_numpy(np.transpose(content, (0, 3, 1, 2)).copy())
    ts = torch.from_numpy(np.transpose(style, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        cf = enc(tc)[0].reshape(enc_out, -1)
        sf = enc(ts)[0].reshape(enc_out, -1)
        fused = torch.from_numpy(
            _torch_wct(cf, sf, "closed-form")).float().reshape(
                1, enc_out, 16, 16)
        expected = dec(fused).numpy()

    mae = np.abs(got - np.transpose(expected, (0, 2, 3, 1))).mean()
    assert mae < 1e-2, f"mean abs pixel error {mae}"


def test_sanet_attention_parity(rng):
    """SANetAttention (dense CPU path) vs torch oracle of sanet.py:73-99."""
    from rpst.models.sanet import SANetAttention
    key = jax.random.PRNGKey(5)
    C = 16
    content = rng.normal(size=(1, 8, 8, C)).astype(np.float32)
    style = rng.normal(size=(1, 8, 8, C)).astype(np.float32)
    mod = SANetAttention(in_planes=C)
    variables = mod.init(key, jnp.asarray(content), jnp.asarray(style))
    got = np.asarray(mod.apply(variables, jnp.asarray(content),
                               jnp.asarray(style)))

    p = variables["params"]
    f = tnn.Conv2d(C, C, 1); _inject_conv(f, p["f"])
    g = tnn.Conv2d(C, C, 1); _inject_conv(g, p["g"])
    h = tnn.Conv2d(C, C, 1); _inject_conv(h, p["h"])
    oc = tnn.Conv2d(C, C, 1); _inject_conv(oc, p["out_conv"])
    tc = torch.from_numpy(np.transpose(content, (0, 3, 1, 2)).copy())
    ts = torch.from_numpy(np.transpose(style, (0, 3, 1, 2)).copy())

    def mvn(x, eps=1e-5):
        n, ch = x.shape[:2]
        v = x.reshape(n, ch, -1).var(dim=2) + eps
        m = x.reshape(n, ch, -1).mean(dim=2).reshape(n, ch, 1, 1)
        return (x - m) / v.sqrt().reshape(n, ch, 1, 1)

    with torch.no_grad():
        F = f(mvn(tc)).reshape(1, C, -1).permute(0, 2, 1)
        G = g(mvn(ts)).reshape(1, C, -1)
        H = h(ts).reshape(1, C, -1)
        S = torch.softmax(torch.bmm(F, G), dim=-1)
        O = torch.bmm(H, S.permute(0, 2, 1)).reshape(1, C, 8, 8)
        expected = (oc(O) + tc).numpy()

    np.testing.assert_allclose(got, np.transpose(expected, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-4)


def test_reference_checkpoint_import_roundtrip(rng, tmp_path):
    """tools/import_reference_checkpoint: a torch {'encoder','decoder'}
    checkpoint (AdaINRPNet format, adain_rp.py:103-108) imports into an
    rpst params tree that reproduces the torch modules' outputs."""
    import importlib.util
    import pickle

    spec = importlib.util.spec_from_file_location(
        "import_ref", "tools/import_reference_checkpoint.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    enc = tnn.Sequential(tnn.Conv2d(3, 4, 3, padding=1), tnn.ReLU(),
                         tnn.Conv2d(4, 8, 3, padding=1), tnn.ReLU())
    dec = tnn.Sequential(tnn.Conv2d(8, 4, 3, padding=1), tnn.ReLU(),
                         tnn.Conv2d(4, 3, 3, padding=1), tnn.ReLU())
    src = tmp_path / "ckpt.pth"
    dst = tmp_path / "params.pkl"
    torch.save({"encoder": enc.state_dict(), "decoder": dec.state_dict()},
               str(src))
    mod.convert(str(src), str(dst))
    with open(dst, "rb") as f:
        tree = pickle.load(f)
    assert tree["kind"] == "rpseq"
    params = tree["params"]

    from rpst.nn.blocks import RPSequence
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    seq = RPSequence(dims=((3, 4), (4, 8)))
    got = np.asarray(seq.apply({"params": params["encoder"]},
                               jnp.asarray(x), train=False))
    with torch.no_grad():
        expected = enc(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    np.testing.assert_allclose(got, np.transpose(expected, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def _load_tool(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, f"tools/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tree_allclose(a, b, path=""):
    assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_allclose(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(np.asarray(a[k], np.float32),
                                       np.asarray(b[k], np.float32),
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=f"{path}/{k}")


def test_reference_checkpoint_export_roundtrip(rng):
    """tools/export_reference_checkpoint inverts the import tool on REAL
    rpst param trees: export -> reference-format keys -> import -> the
    original tree, for all three formats (rpseq, rpstack incl. SE
    bottleneck batch stats + inception, sanet/AEA)."""
    exp = _load_tool("export_reference_checkpoint")
    imp = _load_tool("import_reference_checkpoint")

    cases = [
        (dict(network="adain", rp_blocks=3, hidden_dim=8, img_size=16),
         "rpseq"),
        (dict(network="multi_adain", enc_stack_way="constant", rp_blocks=3,
              hidden_dim=8, inception_num=1, attention="se", img_size=16),
         "rpstack"),
        (dict(network="dynamic_sanet", ada_module="aea", img_size=32),
         "sanet"),
    ]
    for over, kind in cases:
        cfg = load_config(over)
        bundle = build_model(cfg)
        key = jax.random.PRNGKey(0)
        c = jnp.asarray(rng.random((1, cfg.img_size, cfg.img_size, 3),
                                   np.float32))
        _, vgg_vars = init_vgg_params(key, num_stages=bundle.vgg_stages)
        variables = bundle.init(key, c, c, vgg_vars)
        params = jax.device_get(variables["params"])
        stats = jax.device_get(variables.get("batch_stats", {}))

        sd = exp.export_tree(params, stats)
        # reference-format key spot checks (what torch.load must see)
        if kind == "rpseq":
            assert "0.weight" in sd["encoder"] and "2.weight" in sd["encoder"]
        elif kind == "rpstack":
            assert "0.conv.weight" in sd["encoder"]
            assert "0.inception.0.0.weight" in sd["encoder"]
            assert "0.attention_block.conv1.weight" in sd["encoder"]
            assert "0.attention_block.bn1.running_mean" in sd["encoder"]
        else:
            assert "1.weight" in sd["decoder"] and "28.weight" in sd["decoder"]
            assert "sanet4_1.f.weight" in sd["transform"]
            assert "sanet4_1.attention_layer.f_psi.0.weight" in sd["transform"]

        back = imp.convert_tree(sd)
        assert back["kind"] == kind
        want = {k: params[k] for k in back["params"]}
        _tree_allclose(back["params"], want, kind)
        if back["batch_stats"]:
            want_bs = {k: stats[k] for k in back["batch_stats"]}
            _tree_allclose(back["batch_stats"], want_bs, f"{kind}-bs")


def test_export_se_requires_batch_stats(rng):
    """export_tree without batch_stats on an SE model raises a clear
    error (the reference checkpoint carries BN running stats) instead of
    a bare KeyError."""
    import pytest
    exp = _load_tool("export_reference_checkpoint")
    cfg = load_config(dict(network="multi_adain", enc_stack_way="constant",
                           rp_blocks=3, hidden_dim=8, attention="se",
                           img_size=16))
    bundle = build_model(cfg)
    key = jax.random.PRNGKey(0)
    c = jnp.zeros((1, 16, 16, 3))
    _, vgg_vars = init_vgg_params(key, num_stages=bundle.vgg_stages)
    variables = bundle.init(key, c, c, vgg_vars)
    with pytest.raises(ValueError, match="batch_stats required"):
        exp.export_tree(jax.device_get(variables["params"]))
