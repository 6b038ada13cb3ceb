"""Every registry config builds and traces — breadth mirror of the reference's
tests/test_inference.py (which parametrizes a forward over all model configs).

Uses ``jax.eval_shape`` so even bigG/H-scale configs cost only a trace: catches
config-schema drift, tower wiring/dispatch bugs, and shape errors across the whole
181-config registry without any FLOPs. Gated towers (no native implementation or
missing optional deps) must raise their documented NotImplementedError instead of
something arbitrary.
"""

import jax
import jax.numpy as jnp
import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg

# no gated towers remain: swin_base_patch4_window7_224 and
# vit_relpos_medium_patch16_cls_224 grew native implementations in round 3
GATED = set()

ALL = sorted(oct.list_models())


def _spatial(cfg):
    size = cfg.vision_cfg.image_size
    return size if isinstance(size, int) else size[0]


@pytest.mark.parametrize("name", ALL)
def test_config_builds_and_traces(name):
    raw = oct.get_model_config(name)
    assert raw is not None

    if "genlip_cfg" in raw or "genlap_cfg" in raw:
        # generative family: abstract init-shape check (eval_shape — materializing
        # so150m-scale params costs ~10 s each on the CPU suite)
        if "genlap_cfg" in raw:
            from open_clip_tpu.models import genlap as gmod

            gcfg = gmod.GenLapModelCfg.from_dict(raw)
            params = jax.eval_shape(lambda: gmod.init_genlap(jax.random.PRNGKey(0), gcfg))
        else:
            from open_clip_tpu.models import genlip as gmod

            gcfg = gmod.GenLipModelCfg.from_dict(raw)
            params = jax.eval_shape(lambda: gmod.init_genlip(jax.random.PRNGKey(0), gcfg))
        assert params
        return

    cfg = parse_model_cfg(name)
    if (cfg.vision_cfg is not None and cfg.vision_cfg.timm_model_name
            and cfg.vision_cfg.timm_model_name in GATED):
        with pytest.raises(NotImplementedError):
            from open_clip_tpu.factory import _check_supported

            _check_supported(cfg)
        return
    if cfg.text_cfg is not None and (cfg.text_cfg.hf_model_name or cfg.text_cfg.hf_model_config):
        pytest.skip("hf text tower config download requires network")

    from open_clip_tpu.models.clip import clip_forward, init_clip

    params = jax.eval_shape(lambda: init_clip(jax.random.PRNGKey(0), cfg))

    if cfg.audio_cfg is not None:
        # audio towers: mel/waveform front-ends are exercised in the audio suites;
        # here just check the param tree materialized abstractly
        assert params
        return

    s = _spatial(cfg)
    is_naflex = bool(cfg.vision_cfg.timm_model_name
                     and cfg.vision_cfg.timm_model_name.startswith("naflexvit"))
    if is_naflex:
        from open_clip_tpu.models.naflex_vit import parse_naflex_cfg

        patch = parse_naflex_cfg(cfg.vision_cfg).patch_size
        image = {
            "patches": jax.ShapeDtypeStruct((1, 64, patch * patch * 3), jnp.float32),
            "patch_coord": jax.ShapeDtypeStruct((1, 64, 2), jnp.int32),
            "patch_valid": jax.ShapeDtypeStruct((1, 64), bool),
        }
    else:
        image = jax.ShapeDtypeStruct((1, s, s, 3), jnp.float32)
    ctx = cfg.text_cfg.context_length if cfg.text_cfg else 16
    text = jax.ShapeDtypeStruct((1, ctx), jnp.int32)

    out = jax.eval_shape(
        lambda p, i, t: clip_forward(p, cfg, i, t), params, image, text)
    assert out["image_features"].shape[-1] == cfg.embed_dim
    if "text_features" in out and out["text_features"] is not None:
        assert out["text_features"].shape[-1] == cfg.embed_dim
