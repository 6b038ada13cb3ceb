"""Device-preprocess input path: uint8 host tier + fused on-device RRC/normalize
(BASELINE north star; reference host pipeline transform.py:367-518 is the semantic
spec, re-partitioned host/device for TPU)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from open_clip_tpu.transform import (
    AugmentationCfg,
    PreprocessCfg,
    default_canvas_size,
    image_transform_v2,
    make_device_preprocess,
    make_device_train_preprocess,
    uint8_image_transform_v2,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("resize_mode", ["shortest", "squash"])
def test_uint8_val_tier_matches_host_float(rng, resize_mode):
    """uint8 host geometry + device normalize == full host float tier, exactly:
    the same PIL ops run on the same pixels; only the normalize moves on device."""
    cfg = PreprocessCfg(size=32, resize_mode=resize_mode)
    host = image_transform_v2(cfg, is_train=False)
    u8 = uint8_image_transform_v2(cfg, is_train=False)
    dev = make_device_preprocess(cfg)
    for shape in ((48, 64, 3), (32, 32, 3), (100, 31, 3)):
        img = Image.fromarray(rng.integers(0, 255, shape, np.uint8))
        h = host(img)
        d = np.asarray(dev(jnp.asarray(u8(img))[None]))[0]
        np.testing.assert_allclose(d, h, atol=1e-5)


def test_uint8_tier_accepts_bytes(rng):
    cfg = PreprocessCfg(size=32)
    u8 = uint8_image_transform_v2(cfg, is_train=False)
    img = Image.fromarray(rng.integers(0, 255, (300, 400, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=95)
    out = u8(buf.getvalue())
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8
    # and the PIL path agrees with the bytes path up to JPEG loss
    out2 = u8(Image.open(io.BytesIO(buf.getvalue())))
    assert np.abs(out.astype(int) - out2.astype(int)).mean() < 8


def test_uint8_train_canvas_shape(rng):
    cfg = PreprocessCfg(size=32)
    canvas = default_canvas_size(cfg)
    t = uint8_image_transform_v2(cfg, is_train=True)
    img = Image.fromarray(rng.integers(0, 255, (77, 160, 3), np.uint8))
    out = t(img)
    assert out.shape == (canvas, canvas, 3) and out.dtype == np.uint8


def test_device_rrc_full_canvas_matches_bilinear_resize(rng):
    """With scale=(1,1) ratio=(1,1) the RRC degenerates to a plain resize of the
    whole canvas; with antialias off, compare against torch's non-antialiased
    bilinear (the same half-pixel-centered 2-tap convention)."""
    import torch
    import torch.nn.functional as F

    cfg = PreprocessCfg(size=24, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                        interpolation="bilinear")
    devpp = make_device_train_preprocess(
        cfg, AugmentationCfg(scale=(1.0, 1.0), ratio=(1.0, 1.0)), antialias=False)
    arr = rng.integers(0, 255, (32, 32, 3), np.uint8)
    out = np.asarray(devpp(jax.random.PRNGKey(0), jnp.asarray(arr)[None]))[0]
    t = torch.from_numpy(arr.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(24, 24), mode="bilinear", align_corners=False,
                        antialias=False)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
def test_device_rrc_full_canvas_matches_antialiased_resize(rng, mode):
    """Default tier (antialias on, kernel from cfg.interpolation) against torch's
    ``antialias=True`` resize — the construction torch implemented to match PIL,
    which is what the host PIL train tier uses (reference transform.py:418-447)."""
    import torch
    import torch.nn.functional as F

    cfg = PreprocessCfg(size=24, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                        interpolation=mode)
    devpp = make_device_train_preprocess(
        cfg, AugmentationCfg(scale=(1.0, 1.0), ratio=(1.0, 1.0)))
    arr = rng.integers(0, 255, (32, 32, 3), np.uint8)
    out = np.asarray(devpp(jax.random.PRNGKey(0), jnp.asarray(arr)[None]))[0]
    t = torch.from_numpy(arr.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
    ref = F.interpolate(t, size=(24, 24), mode=mode, align_corners=False,
                        antialias=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_crop_resample_integer_box_matches_pil(rng):
    """Driving the resampler with an exact integer box must equal numpy-crop +
    PIL bicubic resize (the host tier's RandomResizedCrop inner op). Float-mode
    PIL sidesteps its uint8 fixed-point quantization; a 3-px output margin
    excludes the box boundary, where the device tier deliberately differs (its
    filter taps read the surrounding canvas instead of clamping at the box)."""
    from open_clip_tpu.transform import make_crop_resample

    arr = rng.integers(0, 255, (48, 48, 3), np.uint8)
    top, left, ch, cw = 5, 9, 37, 29
    fn = make_crop_resample(48, 24, 24, kind="cubic", antialias=True)
    out = np.asarray(fn(
        jnp.asarray(arr, jnp.float32)[None] / 255.0,
        jnp.asarray([float(top)]), jnp.asarray([float(left)]),
        jnp.asarray([float(ch)]), jnp.asarray([float(cw)])))[0]
    ref = np.stack([
        np.asarray(Image.fromarray(
            arr[top:top + ch, left:left + cw, c].astype(np.float32) / 255.0,
            mode="F").resize((24, 24), Image.BICUBIC))
        for c in range(3)], axis=-1)
    assert np.abs(out - ref)[3:-3, 3:-3].max() < 1e-5


def test_crop_param_sampler_matches_host_distribution():
    """The device crop-param sampler must reproduce torchvision get_params
    semantics INCLUDING the 10-attempt rejection loop: with the reference default
    scale=(0.9, 1.0) most aspect draws don't fit and the full-square fallback
    dominates. The pre-round-4 clipping sampler accepted every draw as a stretched
    crop — a distribution shift the A/B (docs/ab_device_rrc.json) measured at ~2x
    held-out retrieval. Compare fallback rate, area and aspect moments against the
    host-tier sampler on a square source."""
    from open_clip_tpu.transform import _TrainTransform, make_crop_param_sampler

    s, n = 256, 4096
    host_t = _TrainTransform(PreprocessCfg(size=224), AugmentationCfg())
    import random as pyrandom

    pyrandom.seed(3)
    host = np.array([host_t._get_crop(s, s) for _ in range(n)], dtype=np.float64)
    h_left, h_top, h_cw, h_ch = host.T

    dev_fn = make_crop_param_sampler(s, (0.9, 1.0), (3.0 / 4.0, 4.0 / 3.0))
    d_top, d_left, d_ch, d_cw = (np.asarray(a, np.float64)
                                 for a in dev_fn(jax.random.PRNGKey(5), n))

    # every crop fits — no clipped/stretched boxes
    assert (d_cw <= s).all() and (d_ch <= s).all() and (d_cw > 0).all()
    assert (d_top >= 0).all() and (d_top + d_ch <= s).all()
    assert (d_left >= 0).all() and (d_left + d_cw <= s).all()
    # integer-valued params like the host tier
    np.testing.assert_array_equal(d_cw, np.round(d_cw))
    np.testing.assert_array_equal(d_top, np.round(d_top))

    # fallback (full-square) rate matches: analytically ~86% at scale=(0.9, 1.0)
    h_fb = ((h_cw == s) & (h_ch == s)).mean()
    d_fb = ((d_cw == s) & (d_ch == s)).mean()
    assert abs(h_fb - d_fb) < 0.03, (h_fb, d_fb)
    # area and aspect moments of the NON-fallback (accepted-draw) crops match
    h_acc = host[(h_cw < s) | (h_ch < s)]
    d_acc = np.stack([d_left, d_top, d_cw, d_ch], 1)[(d_cw < s) | (d_ch < s)]
    for col, tol in ((2, 0.02), (3, 0.02)):  # cw, ch relative mean tolerance
        hm, dm = h_acc[:, col].mean(), d_acc[:, col].mean()
        assert abs(hm - dm) / hm < tol, (col, hm, dm)
    h_aspect = h_acc[:, 2] / h_acc[:, 3]
    d_aspect = d_acc[:, 2] / d_acc[:, 3]
    assert abs(h_aspect.mean() - d_aspect.mean()) < 0.02
    assert abs(h_aspect.std() - d_aspect.std()) < 0.02


def test_device_rrc_randomness_and_range(rng):
    cfg = PreprocessCfg(size=16)
    devpp = make_device_train_preprocess(cfg)
    x = jnp.asarray(rng.integers(0, 255, (4, 24, 24, 3), np.uint8))
    a = np.asarray(devpp(jax.random.PRNGKey(0), x))
    b = np.asarray(devpp(jax.random.PRNGKey(1), x))
    assert a.shape == (4, 16, 16, 3)
    assert not np.allclose(a, b)
    # per-sample independence: different samples get different crops
    same = jnp.asarray(np.repeat(x[:1], 4, axis=0))
    c = np.asarray(devpp(jax.random.PRNGKey(2), same))
    assert not np.allclose(c[0], c[1])
    # normalized output stays in a sane range
    assert np.isfinite(a).all() and np.abs(a).max() < 10


def test_device_rrc_weights_are_row_stochastic():
    """A constant image must stay constant under any crop (interp weights sum to 1)."""
    cfg = PreprocessCfg(size=16, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
    devpp = make_device_train_preprocess(cfg)
    x = jnp.full((2, 24, 24, 3), 128, jnp.uint8)
    out = np.asarray(devpp(jax.random.PRNGKey(0), x))
    np.testing.assert_allclose(out, 128 / 255.0, atol=1e-5)


@pytest.mark.slow  # ~75 s on a 1-core box — excluded from the quick tier
def test_train_step_with_device_preprocess(rng):
    """uint8 batches through the fused step: loss decreases, dtype stays uint8 on host."""
    import optax

    import open_clip_tpu as oct
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.train_step import create_train_state, make_train_step

    cfg = oct.config.CLIPModelCfg.from_dict({
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16,
                       "head_width": 16},
        "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 2,
                     "layers": 2},
    })
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(1e-3)
    pcfg = PreprocessCfg(size=32)
    devpp = make_device_train_preprocess(pcfg)
    step = make_train_step(cfg, opt, compute_dtype=jnp.float32, device_preprocess=devpp)
    state = create_train_state(params, opt)
    canvas = default_canvas_size(pcfg)
    batch = {
        "image": rng.integers(0, 255, (8, canvas, canvas, 3), np.uint8),
        "text": rng.integers(1, 512, (8, 16)).astype(np.int32),
    }
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
