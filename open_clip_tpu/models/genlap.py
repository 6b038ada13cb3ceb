"""GenLAP: generative audio-language model — TPU-native (audio sibling of GenLIP).

Functional re-design of reference ``src/open_clip/naflex_genlap_model.py``: the shared
GenLIP trunk (models/genlip.py) with a mel-spectrogram NaFlex prefix — a linear
MelPatchEmbed over ``{patches, patch_coord=(freq,time), patch_valid}`` tokens — and
geometry-dependent RoPE: 1-D time (full-height strips broadcast time to all three MRoPE
axes) vs 2-D axial ``t=0, h=freq, w=time`` (reference :42-88).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.fused_ce import fused_linear_cross_entropy
from ..ops.layers import layer_norm, linear
from . import blocks as B
from .genlip import (
    GenLipTextCfg,
    GenLipTrunkCfg,
    _norm,
    _norm_params,
    apply_trunk,
    build_image_bias,
    build_prefix_lm_bias,
    trunk_mask,
    embed_text,
    mrope_cos_sin,
)


@dataclass
class AudioNaFlexCfg:
    """reference audio/naflex_audio.py:28-100."""

    sample_rate: int = 48000
    window_size: int = 1024
    hop_size: int = 480
    fmin: int = 50
    fmax: int = 14000
    n_mels: int = 64
    patch_freq: int = 64
    patch_time: int = 4
    in_chans: int = 1
    input_norm: bool = False
    pre_norm: bool = False
    proj_bias: bool = True
    patch_pad_mode: str = "floor"

    @property
    def patch_dim(self) -> int:
        return self.in_chans * self.patch_freq * self.patch_time

    @property
    def freq_tokens(self) -> int:
        assert self.n_mels % self.patch_freq == 0
        return self.n_mels // self.patch_freq

    @property
    def is_1d_time(self) -> bool:
        return self.freq_tokens == 1


@dataclass
class GenLapModelCfg:
    embed_dim: int
    audio_cfg: AudioNaFlexCfg
    text_cfg: GenLipTextCfg
    trunk_cfg: GenLipTrunkCfg
    rope_1d: Optional[bool] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "GenLapModelCfg":
        def mk(klass, sub):
            names = {f.name for f in dataclasses.fields(klass)}
            return klass(**{k: v for k, v in (sub or {}).items() if k in names})

        return cls(
            embed_dim=d["embed_dim"],
            audio_cfg=mk(AudioNaFlexCfg, d.get("audio_naflex_cfg")),
            text_cfg=mk(GenLipTextCfg, d.get("text_cfg")),
            trunk_cfg=mk(GenLipTrunkCfg, d.get("genlap_cfg")),
        )

    @property
    def use_rope_1d(self) -> bool:
        return self.audio_cfg.is_1d_time if self.rope_1d is None else self.rope_1d


def build_audio_position_ids(
    patch_coord: jax.Array,
    patch_valid: jax.Array,
    text_valid: Optional[jax.Array] = None,
    rope_1d: bool = False,
) -> jax.Array:
    """(3, B, Ni + Lt) — reference naflex_genlap_model.py:42-88."""
    b, ni, _ = patch_coord.shape
    freq = patch_coord[..., 0].astype(jnp.int32)
    time = patch_coord[..., 1].astype(jnp.int32)
    pv = patch_valid.astype(bool)
    lt = text_valid.shape[1] if text_valid is not None else 0

    if rope_1d:
        audio_part = jnp.broadcast_to(time[None], (3, b, ni))
        max_pos = jnp.where(pv, time, 0).max(axis=1)
    else:
        zeros = jnp.zeros((b, ni), jnp.int32)
        audio_part = jnp.stack([zeros, freq, time])
        max_pos = jnp.maximum(jnp.where(pv, freq, 0).max(axis=1), jnp.where(pv, time, 0).max(axis=1))

    if lt == 0:
        return audio_part
    text_pos = (max_pos[:, None] + 1) + jnp.arange(lt)[None, :]
    txt_part = jnp.broadcast_to(text_pos[None], (3, b, lt)).astype(jnp.int32)
    return jnp.concatenate([audio_part, txt_part], axis=2)


def init_genlap(key, cfg: GenLapModelCfg) -> Dict[str, Any]:
    from .genlip import GenLipModelCfg, GenLipVisionCfg, init_genlip

    # reuse the genlip init for the shared pieces, then swap the patch embed for mel
    proxy = GenLipModelCfg(
        embed_dim=cfg.embed_dim,
        vision_cfg=GenLipVisionCfg(patch_size=4, in_chans=1),  # placeholder, replaced below
        text_cfg=cfg.text_cfg,
        trunk_cfg=cfg.trunk_cfg,
    )
    p = init_genlip(key, proxy)
    a = cfg.audio_cfg
    t = cfg.trunk_cfg
    ks = jax.random.split(jax.random.fold_in(key, 7), 2)
    pe: Dict[str, Any] = {"proj": {"kernel": B.normal_init(ks[0], (a.patch_dim, t.width), 0.02)}}
    if a.proj_bias:
        pe["proj"]["bias"] = jnp.zeros((t.width,))
    if a.input_norm:
        pe["norm_input"] = {"scale": jnp.ones((a.patch_dim,)), "bias": jnp.zeros((a.patch_dim,))}
    if a.pre_norm:
        pe["norm_pre"] = _norm_params(t.width, t.norm_type)
    p["patch_embed"] = pe  # audio_embed in the reference; same tree slot as genlip's patch_embed
    return p


def embed_audio_patches(params, cfg: GenLapModelCfg, patches, compute_dtype):
    pe = params["patch_embed"]
    x = patches.astype(compute_dtype)
    if "norm_input" in pe:
        x = layer_norm(x, pe["norm_input"]["scale"], pe["norm_input"]["bias"])
    x = linear(x, pe["proj"]["kernel"], pe["proj"].get("bias"))
    if "norm_pre" in pe:
        x = _norm(x, pe["norm_pre"], norm_type=cfg.trunk_cfg.norm_type, eps=cfg.trunk_cfg.layer_norm_eps)
    return x


def encode_audio(params, cfg: GenLapModelCfg, audio: Dict[str, jax.Array], *,
                 normalize: bool = False, compute_dtype=jnp.float32, remat: bool = False):
    """Audio-only bidirectional pass -> masked-mean pooled + proj (reference :172-184)."""
    t = cfg.trunk_cfg
    pv = audio["patch_valid"].astype(bool)
    x = embed_audio_patches(params, cfg, audio["patches"], compute_dtype)
    bias = trunk_mask(0, pv, x.shape[1], t.width // t.num_heads)
    pos = build_audio_position_ids(audio["patch_coord"], pv, rope_1d=cfg.use_rope_1d)
    cos, sin = mrope_cos_sin(pos, t.width // t.num_heads, t.mrope_section, t.rope_theta, t.mrope_interleaved)
    x = apply_trunk(params["trunk"], t, x, bias, cos, sin, remat=remat)
    w = pv.astype(jnp.float32)[..., None]
    pooled = ((x.astype(jnp.float32) * w).sum(1) / jnp.maximum(w.sum(1), 1.0)).astype(x.dtype)
    if "visual_proj" in params:  # audio_proj in the reference; shared tree slot
        pooled = linear(pooled, params["visual_proj"]["kernel"], params["visual_proj"].get("bias"))
    if normalize:
        from .clip import _l2_normalize

        pooled = _l2_normalize(pooled)
    return pooled


def genlap_forward(
    params: Dict[str, Any],
    cfg: GenLapModelCfg,
    audio: Dict[str, jax.Array],
    text: jax.Array,
    text_valid: Optional[jax.Array] = None,
    *,
    compute_loss: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """reference NaFlexGenLap.forward (:203-250)."""
    t = cfg.trunk_cfg
    if text_valid is None:
        text_valid = text != cfg.text_cfg.pad_id
    pv = audio["patch_valid"].astype(bool)

    if compute_loss and t.pack_prefix:
        from .genlip import packed_caption_loss

        loss = packed_caption_loss(
            params, cfg,
            embed_audio_patches(params, cfg, audio["patches"], compute_dtype), pv,
            build_audio_position_ids(audio["patch_coord"], pv, text_valid, rope_1d=cfg.use_rope_1d),
            text, text_valid, compute_dtype=compute_dtype, remat=remat,
        )
        return {"loss": loss}

    aud_emb = embed_audio_patches(params, cfg, audio["patches"], compute_dtype)
    txt_emb = embed_text(params, cfg, text, compute_dtype)
    h = jnp.concatenate([aud_emb, txt_emb], axis=1)
    ni = aud_emb.shape[1]

    bias = trunk_mask(ni, jnp.concatenate([pv, text_valid.astype(bool)], axis=1),
                      h.shape[1], t.width // t.num_heads)
    pos = build_audio_position_ids(audio["patch_coord"], pv, text_valid, rope_1d=cfg.use_rope_1d)
    cos, sin = mrope_cos_sin(pos, t.width // t.num_heads, t.mrope_section, t.rope_theta, t.mrope_interleaved)

    h = apply_trunk(params["trunk"], t, h, bias, cos, sin, remat=remat, train=train, rng=rng)
    if "out_proj" in params:
        h = linear(h, params["out_proj"]["kernel"], params["out_proj"].get("bias"))

    if compute_loss:
        pred = h[:, ni - 1 : -1, :]
        target = jnp.where(text_valid, text, -100)
        loss = fused_linear_cross_entropy(
            pred.reshape(-1, pred.shape[-1]),
            params["lm_head"]["kernel"].T,
            target.reshape(-1),
            ignore_index=-100,
        )
        return {"loss": loss}
    logits = jnp.dot(h, params["lm_head"]["kernel"].astype(h.dtype))
    return {"logits": logits, "audio_seq_len": ni}


def prefix_cache(params, cfg: GenLapModelCfg, audio: Dict[str, jax.Array], *,
                 compute_dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Audio-prefix KV cache for cached caption scoring (pair with
    genlip.score_captions): genlip.prefix_cache with the GenLAP position scheme
    (1-D time / 2-D freq-time RoPE) and the mel patch embed."""
    from . import genlip as genlip_mod

    pv = audio["patch_valid"].astype(bool)
    pos = build_audio_position_ids(audio["patch_coord"], pv, rope_1d=cfg.use_rope_1d)
    freq = audio["patch_coord"][..., 0].astype(jnp.int32)
    time = audio["patch_coord"][..., 1].astype(jnp.int32)
    if cfg.use_rope_1d:
        text_start = jnp.where(pv, time, 0).max(axis=1) + 1
    else:
        text_start = jnp.maximum(jnp.where(pv, freq, 0).max(axis=1),
                                 jnp.where(pv, time, 0).max(axis=1)) + 1
    return genlip_mod.prefix_cache(
        params, cfg, audio, compute_dtype=compute_dtype, pos_ids=pos,
        text_start=text_start,
        embed_fn=lambda p, c, pt, dt: embed_audio_patches(p, c, pt, dt))


def torch_genlap_to_params(sd, cfg: GenLapModelCfg) -> Dict[str, Any]:
    """Reference NaFlexGenLap state dict -> param tree (reuses the genlip converter with
    the audio_embed/audio_proj key remap)."""
    from ..convert import normalize_torch_state_dict
    from .genlip import GenLipModelCfg, GenLipVisionCfg, torch_genlip_to_params

    sd = normalize_torch_state_dict(sd)
    remapped = {}
    for k, v in sd.items():
        if k.startswith("audio_embed."):
            remapped["patch_embed." + k[len("audio_embed."):]] = v
        elif k.startswith("audio_proj."):
            remapped["visual.proj." + k[len("audio_proj."):]] = v
        else:
            remapped[k] = v
    proxy = GenLipModelCfg(
        embed_dim=cfg.embed_dim,
        vision_cfg=GenLipVisionCfg(),
        text_cfg=cfg.text_cfg,
        trunk_cfg=cfg.trunk_cfg,
    )
    return torch_genlip_to_params(remapped, proxy)


class GenLapModel:
    """Facade with the reference NaFlexGenLap surface."""

    def __init__(self, cfg: GenLapModelCfg, params: Dict[str, Any], compute_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self.pad_id = cfg.text_cfg.pad_id
        self.context_length = cfg.text_cfg.context_length

    def encode_audio(self, audio, normalize: bool = False):
        audio = {k: jnp.asarray(v) for k, v in audio.items()}
        return encode_audio(self.params, self.cfg, audio, normalize=normalize,
                            compute_dtype=self.compute_dtype)

    def __call__(self, audio, text, text_valid=None, compute_loss: bool = False):
        audio = {k: jnp.asarray(v) for k, v in audio.items()}
        return genlap_forward(self.params, self.cfg, audio, jnp.asarray(text),
                              text_valid, compute_loss=compute_loss,
                              compute_dtype=self.compute_dtype)

    def prefix_cache(self, audio):
        """Audio-prefix KV cache for score_captions (see module-level prefix_cache)."""
        audio = {k: jnp.asarray(v) for k, v in audio.items()}
        return prefix_cache(self.params, self.cfg, audio, compute_dtype=self.compute_dtype)

    def generate(self, audio, **kw):
        """Caption audio clips: KV-cached incremental decode against the audio
        prefix (superset — the reference exposes generation only for CoCa). Same
        sampler surface as genlip.generate_cached (greedy/top_k/top_p)."""
        from .genlip import generate_cached

        audio = {k: jnp.asarray(v) for k, v in audio.items()}
        cache = prefix_cache(self.params, self.cfg, audio, compute_dtype=self.compute_dtype)
        return generate_cached(self.params, self.cfg, audio,
                               compute_dtype=self.compute_dtype, cache=cache, **kw)

    def score_captions(self, cache, text, text_valid=None):
        """Length-normalized log P(caption | cached audio prefix), (B,)."""
        from .genlip import score_captions

        return score_captions(self.params, self.cfg, cache, jnp.asarray(text), text_valid,
                              compute_dtype=self.compute_dtype)
