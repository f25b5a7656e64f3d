"""Losses, metrics, VGG/LPIPS fallbacks, checkpoints."""
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from guassianhand_tpu.train.losses import (LossWeights, compute_error,
                                           identity_regularizers, pix_loss)
from guassianhand_tpu.train.metrics import psnr, ssim, mse, bbox_crop
from guassianhand_tpu.train.vgg import VGGLoss
from guassianhand_tpu.train.lpips import LPIPS, lpips_from_01
from guassianhand_tpu.train import checkpoints as ck


def test_pix_loss_values():
    src = jnp.ones((1, 3, 8, 8)) * 0.5
    tar = jnp.zeros((1, 3, 8, 8))
    out = pix_loss(src, tar, {"l1": 10.0, "l2": 1.0})
    np.testing.assert_allclose(float(out["l1"]), 5.0, atol=1e-6)
    np.testing.assert_allclose(float(out["l2"]), 0.25, atol=1e-6)


def test_compute_error_and_regs():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
    pm = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)), jnp.float32)
    tm = jnp.asarray(rng.uniform(0, 1, (1, 16, 16)), jnp.float32)
    total, err = compute_error(pred, tgt, pm, tm, None, LossWeights(vgg=0.0))
    assert float(total) > 0 and np.isfinite(float(total))
    assert "e_pix_l1" in err and "mask_loss" in err

    params = {"color_b": jnp.full((4, 4), 0.01),
              "opacity_b": jnp.full((2, 2), 0.1),
              "map_bias": jnp.full((2, 2), 1.0)}
    reg = identity_regularizers(params)
    # 100*0.01 + 0.01 + 0.01*1 = 1.02
    np.testing.assert_allclose(float(reg), 1.02, atol=1e-5)


def test_psnr_ssim_sanity():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    assert float(psnr(img, img)) > 60
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    noisy = jnp.clip(img + 0.2 * rng.normal(size=img.shape).astype(np.float32),
                     0, 1)
    assert float(ssim(img, noisy)) < 0.9
    assert 5 < float(psnr(img, noisy)) < 25


def test_ssim_matches_skimage():
    import pytest

    skimage = pytest.importorskip("skimage")
    from skimage.metrics import structural_similarity

    rng = np.random.RandomState(3)
    a = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = structural_similarity(a, b, channel_axis=2, data_range=1.0)
    assert abs(ours - ref) < 0.02, (ours, ref)


def test_bbox_crop():
    img = np.arange(64).reshape(8, 8).astype(np.float32)[..., None]
    mask = np.zeros((8, 8), bool)
    mask[2:5, 3:7] = True
    crop = bbox_crop(img, mask)
    assert crop.shape == (3, 4, 1)


def test_vgg_and_lpips_fallbacks_run():
    vgg = VGGLoss()
    x = jnp.asarray(np.random.RandomState(0).uniform(0, 1, (1, 3, 64, 64)),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).uniform(0, 1, (1, 3, 64, 64)),
                    jnp.float32)
    l_same = float(vgg(x, x))
    l_diff = float(vgg(x, y))
    assert l_same < 1e-6 and l_diff > l_same

    lp = LPIPS()
    d_same = float(lpips_from_01(lp, np.asarray(x).transpose(0, 2, 3, 1),
                                 np.asarray(x).transpose(0, 2, 3, 1))[0])
    d_diff = float(lpips_from_01(lp, np.asarray(x).transpose(0, 2, 3, 1),
                                 np.asarray(y).transpose(0, 2, 3, 1))[0])
    assert d_same < 1e-6 and d_diff > 1e-4


def test_checkpoint_roundtrip_and_partial():
    params = {"a": jnp.ones((3,)), "nested": {"b": jnp.zeros((2, 2))}}
    opt_state = {"count": jnp.asarray(5)}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.ckpt")
        ck.save_checkpoint(path, params, opt_state, step=7)
        assert os.path.exists(os.path.join(d, "last.ckpt"))
        restored = ck.load_checkpoint(
            path, {"params": params, "opt_state": opt_state, "step": 0})
        assert int(restored["step"]) == 7
        np.testing.assert_array_equal(np.asarray(restored["params"]["a"]),
                                      np.ones(3))
        # partial restore into a template with an extra key
        template = {"a": jnp.zeros((3,)), "nested": {"b": jnp.ones((2, 2))},
                    "extra": jnp.full((4,), 9.0)}
        part = ck.load_params_partial(path, template)
        np.testing.assert_array_equal(np.asarray(part["a"]), np.ones(3))
        np.testing.assert_array_equal(np.asarray(part["extra"]),
                                      np.full((4,), 9.0))
        assert ck.latest_checkpoint(d) is not None


def test_accumulate_grad_batches():
    """MultiSteps wrapping: params move only every k-th micro-batch, by the
    averaged gradient (Trainer(accumulate_grad_batches) equivalent,
    ref infer_one_shot.py:636)."""
    import optax
    from guassianhand_tpu.train.fit import FitConfig, make_optimizer

    params = {"color_b": jnp.ones((3,)), "frozen_thing": jnp.ones((2,))}
    cfg = FitConfig(lr=0.1, accumulate_grad_batches=2, milestones=())
    tx = make_optimizer(params, cfg)
    state = tx.init(params)

    g1 = {"color_b": jnp.full((3,), 1.0), "frozen_thing": jnp.ones((2,))}
    g2 = {"color_b": jnp.full((3,), 3.0), "frozen_thing": jnp.ones((2,))}

    up1, state = tx.update(g1, state, params)
    p_mid = optax.apply_updates(params, up1)
    np.testing.assert_array_equal(np.asarray(p_mid["color_b"]),
                                  np.ones(3))  # no update yet
    up2, state = tx.update(g2, state, p_mid)
    p_end = optax.apply_updates(p_mid, up2)
    # adam on the mean grad (2.0): first step = -lr * sign-ish update
    assert np.all(np.asarray(p_end["color_b"]) < 1.0)
    np.testing.assert_array_equal(np.asarray(p_end["frozen_thing"]),
                                  np.ones(2))  # frozen leaves never move


def test_save_video_fallback(tmp_path):
    from guassianhand_tpu.utils.saving import save_video

    frames = [np.full((8, 8, 3), v, np.float32) for v in (0.0, 0.5, 1.0)]
    out = save_video(str(tmp_path / "turntable.mp4"), frames, fps=10)
    assert os.path.exists(out)
    assert out.endswith((".mp4", ".gif"))


def test_checkpoint_transformer_layout_adaptation(tmp_path):
    """A checkpoint saved from an UNROLLED transformer restores into a
    scan-layout template (and vice versa) — the layouts are reconciled
    instead of silently keeping template values."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from guassianhand_tpu.nn.transformer import Transformer1D
    from guassianhand_tpu.train import checkpoints as ck

    tokens = jnp.ones((1, 24, 16))
    unrolled = Transformer1D(num_layers=2, heads=2, head_dim=8, norm_groups=4)
    scanned = Transformer1D(num_layers=2, heads=2, head_dim=8, norm_groups=4,
                            scan=True)
    p_u = unrolled.init(jax.random.PRNGKey(0), tokens)
    p_s = scanned.init(jax.random.PRNGKey(1), tokens)

    # unrolled ckpt -> scan template
    path = str(tmp_path / "u.ckpt")
    ck.save_checkpoint(path, p_u)
    restored = ck.load_params_partial(path, p_s)
    got = np.asarray(restored["params"]["blocks"]["attn1"]["Dense_0"]["kernel"])
    want0 = np.asarray(p_u["params"]["block_0"]["attn1"]["Dense_0"]["kernel"])
    want1 = np.asarray(p_u["params"]["block_1"]["attn1"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(got[0], want0)
    np.testing.assert_array_equal(got[1], want1)
    # the two models now compute the same function
    np.testing.assert_allclose(
        np.asarray(scanned.apply(restored, tokens)),
        np.asarray(unrolled.apply(p_u, tokens)), atol=2e-5, rtol=1e-5)

    # scan ckpt -> unrolled template
    path2 = str(tmp_path / "s.ckpt")
    ck.save_checkpoint(path2, p_s)
    restored2 = ck.load_params_partial(path2, p_u)
    got2 = np.asarray(
        restored2["params"]["block_1"]["attn1"]["Dense_0"]["kernel"])
    np.testing.assert_array_equal(
        got2,
        np.asarray(p_s["params"]["blocks"]["attn1"]["Dense_0"]["kernel"])[1])


def test_ssim_matches_independent_numpy_reference():
    """Cross-check our JAX SSIM against an independently-written numpy
    implementation of the published formula (Wang et al.; skimage protocol:
    uniform 7x7 window, reflect padding, sample-covariance normalization,
    edge crop) — runs in environments without skimage."""
    import numpy as np

    def box(img, size):
        pad = size // 2
        x = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="symmetric")
        c = np.cumsum(np.cumsum(x, axis=0, dtype=np.float64), axis=1)
        c = np.pad(c, ((1, 0), (1, 0), (0, 0)))
        h, w = img.shape[:2]
        s = (c[size:size + h, size:size + w] - c[0:h, size:size + w]
             - c[size:size + h, 0:w] + c[0:h, 0:w])
        return s / size ** 2

    def ref_ssim(a, b, data_range=1.0, size=7):
        a = a.astype(np.float64)
        b = b.astype(np.float64)
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        npx = size ** 2
        cov_norm = npx / (npx - 1.0)
        ux, uy = box(a, size), box(b, size)
        vx = cov_norm * (box(a * a, size) - ux * ux)
        vy = cov_norm * (box(b * b, size) - uy * uy)
        vxy = cov_norm * (box(a * b, size) - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
        pad = (size - 1) // 2
        return s[pad:-pad, pad:-pad].mean()

    rng = np.random.RandomState(3)
    a = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(ref_ssim(a, b))
    assert abs(ours - ref) < 2e-3, (ours, ref)

    # identical images -> exactly 1
    np.testing.assert_allclose(float(ssim(jnp.asarray(a), jnp.asarray(a))),
                               1.0, atol=1e-6)


def test_vgg_matches_torch_forward(tmp_path):
    """Numeric cross-check of the VGG19 port path: a torch-built
    vgg19.features stack (torchvision layout/keys, random weights) saved as a
    state_dict, loaded through VGGLoss's weight loader, must produce the same
    four slice activations as the torch forward — validates conv layout
    transposes, SAME padding, pool placement, and ImageNet normalization."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)
    seq = []
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512]
    in_ch = 3
    for v in cfg:
        if v == "M":
            seq.append(tnn.MaxPool2d(2, 2))
        else:
            seq.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            seq.append(tnn.ReLU(inplace=False))
            in_ch = v

    class Wrap(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*seq)

    net = Wrap().eval()
    path = str(tmp_path / "vgg19_rand.pth")
    torch.save(net.state_dict(), path)

    from guassianhand_tpu.train.vgg import (IMAGENET_MEAN, IMAGENET_STD,
                                            VGGLoss)
    vl = VGGLoss(weights_path=path)
    assert vl.pretrained

    rng = np.random.RandomState(1)
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        h = (torch.from_numpy(img)
             - torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)) \
            / torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        torch_slices = []
        for i, layer in enumerate(net.features):
            h = layer(h)
            if i in (1, 6, 11, 20):   # relu1_1, relu2_1, relu3_1, relu4_1
                torch_slices.append(h.numpy())

    jax_slices = vl.features(jnp.asarray(img))
    assert len(jax_slices) == 4
    for ts_, js in zip(torch_slices, jax_slices):
        np.testing.assert_allclose(np.asarray(js).transpose(0, 3, 1, 2), ts_,
                                   atol=2e-4, rtol=1e-3)


def test_lpips_matches_torch_forward(tmp_path):
    """Numeric proof of the LPIPS port path: a torch replica of
    lpips.LPIPS(net='alex') (torchvision AlexNet features, input
    shift/scale, unit-normalized channel diffs, 1x1 lin calibration, spatial
    mean) with random weights saved in the lpips state_dict key layout
    (features.N.*, linK.1.weight) must match our JAX LPIPS when loaded
    through its weight loader."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F
    from guassianhand_tpu.train.lpips import LPIPS, _SHIFT, _SCALE

    plan = [(64, 11, 4, 2, False), (192, 5, 1, 2, True),
            (384, 3, 1, 1, True), (256, 3, 1, 1, False),
            (256, 3, 1, 1, False)]
    idxs = [0, 3, 6, 8, 10]
    torch.manual_seed(0)
    convs = []
    in_ch = 3
    sd = {}
    for (out_ch, k, s, p, pool), idx in zip(plan, idxs):
        c = tnn.Conv2d(in_ch, out_ch, k, stride=s, padding=p)
        convs.append(c)
        sd[f"features.{idx}.weight"] = c.weight.detach().clone()
        sd[f"features.{idx}.bias"] = c.bias.detach().clone()
        lin = torch.rand(out_ch) * 0.1
        sd[f"lin{len(convs)-1}.1.weight"] = lin.reshape(out_ch, 1, 1, 1)
        in_ch = out_ch
    path = str(tmp_path / "lpips_rand.pth")
    torch.save(sd, path)

    def torch_feats(x):
        h = (x - torch.tensor(_SHIFT).view(1, 3, 1, 1)) \
            / torch.tensor(_SCALE).view(1, 3, 1, 1)
        outs = []
        for conv, (_, _, _, _, pool) in zip(convs, plan):
            if pool:
                h = F.max_pool2d(h, 3, 2)
            h = F.relu(conv(h))
            outs.append(h)
        return outs

    rng = np.random.RandomState(0)
    x = (rng.uniform(0, 1, (2, 3, 64, 64)) * 2 - 1).astype(np.float32)
    y = np.clip(x + 0.2 * rng.normal(size=x.shape), -1, 1).astype(np.float32)

    with torch.no_grad():
        fx = torch_feats(torch.from_numpy(x))
        fy = torch_feats(torch.from_numpy(y))
        want = torch.zeros(2)
        for i, (a, b) in enumerate(zip(fx, fy)):
            an = a / a.norm(dim=1, keepdim=True).clamp(min=1e-10)
            bn = b / b.norm(dim=1, keepdim=True).clamp(min=1e-10)
            d = (an - bn) ** 2
            lin = sd[f"lin{i}.1.weight"].view(1, -1, 1, 1)
            want = want + (d * lin).sum(1).mean((1, 2))

    metric = LPIPS(weights_path=path)
    assert metric.pretrained
    got = metric(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4,
                               rtol=1e-3)
