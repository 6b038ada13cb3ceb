"""Behavior tests: patch dropout, device-side preprocessing vs host transform,
const-cooldown schedule."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

import open_clip_tpu as oct
from open_clip_tpu.models.vit import patch_dropout, patchify
from open_clip_tpu.train.scheduler import const_lr_cooldown
from open_clip_tpu.transform import PreprocessCfg, image_transform_v2, make_device_preprocess


def test_patch_dropout_keeps_prefix_and_count(rng):
    x = jnp.asarray(rng.standard_normal((4, 17, 8)).astype(np.float32))  # 1 cls + 16 patches
    out = patch_dropout(jax.random.PRNGKey(0), x, prob=0.5, num_prefix=1)
    assert out.shape == (4, 1 + 8, 8)  # keeps ceil/floor(16 * 0.5)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))  # cls kept
    # kept rows are a subset of the original patch rows
    orig = np.asarray(x[0, 1:])
    kept = np.asarray(out[0, 1:])
    for row in kept:
        assert any(np.allclose(row, o) for o in orig)
    # different rng -> different subset
    out2 = patch_dropout(jax.random.PRNGKey(1), x, prob=0.5, num_prefix=1)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_device_preprocess_matches_host_squash():
    """uint8 device path == host PIL path for the squash mode at the native size
    (no resize: purely normalize), and stays close under bicubic resize."""
    cfg = PreprocessCfg(size=32, resize_mode="squash")
    host = image_transform_v2(cfg, is_train=False)
    dev = make_device_preprocess(cfg)

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    h = host(img)
    d = np.asarray(dev(jnp.asarray(arr[None])))[0]
    np.testing.assert_allclose(d, h, atol=1e-5)

    big = rng.integers(0, 255, size=(64, 48, 3), dtype=np.uint8)
    h2 = host(Image.fromarray(big))
    d2 = np.asarray(dev(jnp.asarray(big[None])))[0]
    # PIL and jax.image bicubic kernels differ slightly; values must be close
    assert np.abs(d2 - h2).mean() < 0.1


def test_const_cooldown_schedule():
    sched = const_lr_cooldown(1.0, warmup_length=5, steps=100, cooldown_steps=20,
                              cooldown_power=1.0, cooldown_end_lr=0.1)
    assert float(sched(0)) == pytest.approx(0.2)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(79)) == pytest.approx(1.0)
    assert float(sched(90)) == pytest.approx(0.55, abs=1e-6)  # halfway through cooldown
    assert float(sched(100)) == pytest.approx(0.1)


def test_patchify_layout(rng):
    """patchify flatten order must equal the conv-kernel flatten order used by the
    converter (ph, pw, c)."""
    img = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    p = np.asarray(patchify(jnp.asarray(img), 2))
    # patch (0,0) covers rows 0-1, cols 0-1; flattened as (ph, pw, c)
    expected = img[0, 0:2, 0:2, :].reshape(-1)
    np.testing.assert_allclose(p[0, 0], expected)
    # patch (0,1) covers rows 0-1, cols 2-3
    np.testing.assert_allclose(p[0, 1], img[0, 0:2, 2:4, :].reshape(-1))


def test_merge_params_unexpected_keys_strict():
    from open_clip_tpu.checkpoint import merge_params

    params = {"a": {"kernel": jnp.zeros((2, 2))}, "logit_scale": jnp.zeros(())}
    loaded = {"a": {"kernel": np.ones((2, 2)), "stray": np.ones((3,))},
              "logit_scale": np.ones(())}
    with pytest.raises(KeyError):
        merge_params(params, loaded, strict=True)
    merged = merge_params(params, loaded, strict=False)
    # unexpected keys are dropped, never grow the tree
    assert set(merged["a"]) == {"kernel"}
    np.testing.assert_array_equal(np.asarray(merged["a"]["kernel"]), np.ones((2, 2)))


def test_preprocess_override_flags_reach_transforms():
    """--image-mean/--image-std/--image-interpolation/--image-resize-mode
    (reference params.py:444-458) flow through create_model_and_transforms."""
    import open_clip_tpu as oct

    if "tiny-ppov-vit" not in oct.list_models():
        oct.add_model_config({
            "embed_dim": 16,
            "vision_cfg": {"image_size": 32, "layers": 1, "width": 32, "patch_size": 16,
                           "head_width": 16},
            "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 16, "heads": 2,
                         "layers": 1},
        }, name="tiny-ppov-vit")
    _, _, tv = oct.create_model_and_transforms(
        "tiny-ppov-vit", load_weights=False,
        image_mean=(0.5, 0.5, 0.5), image_std=(0.25, 0.25, 0.25),
        image_interpolation="bilinear", image_resize_mode="squash")
    assert tuple(tv.cfg.mean) == (0.5, 0.5, 0.5)
    assert tuple(tv.cfg.std) == (0.25, 0.25, 0.25)
    assert tv.cfg.interpolation == "bilinear"
    assert tv.cfg.resize_mode == "squash"

    from open_clip_tpu.train.params import parse_args

    args = parse_args(["--model", "tiny-ppov-vit", "--image-mean", "0.5", "0.5", "0.5",
                       "--image-std", "0.25", "0.25", "0.25",
                       "--image-interpolation", "bilinear",
                       "--image-resize-mode", "squash"])
    assert args.image_mean == [0.5, 0.5, 0.5]
    assert args.image_resize_mode == "squash"


def test_public_api_surface_covers_reference_exports():
    """Every name the reference exports from ``src/open_clip/__init__.py`` is
    available from ``open_clip_tpu`` — directly or via the documented alias.
    Parsed statically (the reference imports torch at module scope)."""
    import ast
    import os

    import open_clip_tpu as oct

    ref = "/root/reference/src/open_clip/__init__.py"
    if not os.path.exists(ref):
        import pytest

        pytest.skip("reference checkout not present")
    tree = ast.parse(open(ref).read())
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            for a in node.names:
                names.add(a.asname or a.name)
    # deliberate renames (jax-native equivalents documented in docs/COMPONENTS.md)
    aliases = {
        "CLIP": "CLIPModel",
        "CustomTextCLIP": "CLIPModel",  # one functional container serves both
        "NaFlexGenLipModel": "NaFlexGenLip",
        "NaFlexGenLapModel": "NaFlexGenLap",
        "trace_model": None,  # torch.jit tracing — jax equivalent is jax.jit/export
        "get_cast_dtype": None,  # precision handled by compute_dtype arg
        "get_input_dtype": None,
        "load_openai_model": "create_model_from_pretrained",
        "list_openai_models": "list_pretrained_models_by_tag",
        "get_model_tokenize_cfg": None,  # folded into get_tokenizer
        "get_model_preprocess_cfg": None,  # folded into create_model_and_transforms
        "set_model_preprocess_cfg": None,
    }
    missing = []
    for n in sorted(names):
        target = aliases.get(n, n)
        if target is None:
            continue
        if not hasattr(oct, target):
            missing.append(n)
    assert not missing, f"reference exports absent from open_clip_tpu: {missing}"


def test_audio_tower_facade():
    """AudioTower (reference audio/tower.py:39) facade: init + apply on a tiny
    HTSAT cfg produce a projected embedding of the requested dim."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_clip_tpu import AudioTower, CLIPAudioCfg

    cfg = CLIPAudioCfg(model_type="HTSAT", model_name="tiny", sample_rate=48000,
                       audio_length=480000)
    tower = AudioTower(cfg, embed_dim=64)
    params = tower.init(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 48000)) * 0.1,
                      jnp.float32)
    out = tower(params, {"waveform": wav})
    assert out.shape == (2, 64)
    assert np.isfinite(np.asarray(out)).all()
    # raw-array convenience route matches the dict route
    out2 = tower(params, wav)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
