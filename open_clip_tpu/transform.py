"""Image preprocessing.

Two tiers (per SURVEY.md §7.3):

1. **Host parity tier** — PIL/numpy pipelines byte-equivalent to the reference's
   torchvision val path (``src/open_clip/transform.py:367-518``): resize-shortest +
   center-crop + normalize with bicubic interpolation, plus 'longest' (resize+pad) and
   'squash' modes, and a RandomResizedCrop train path. Outputs float32 NHWC — the
   TPU-native layout.

2. **Device tier** — a jittable batched resize+crop+normalize (``device_preprocess``)
   that fuses into the forward XLA program for uint8 NHWC input straight from the data
   pipeline (the BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses
import random
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

from .constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


@dataclass
class PreprocessCfg:
    """Mirrors reference transform.py:17-60."""

    size: Union[int, Tuple[int, int]] = 224
    mode: str = "RGB"
    mean: Tuple[float, ...] = OPENAI_DATASET_MEAN
    std: Tuple[float, ...] = OPENAI_DATASET_STD
    interpolation: str = "bicubic"
    resize_mode: str = "shortest"
    fill_color: int = 0

    def __post_init__(self):
        if isinstance(self.size, list):
            self.size = tuple(self.size)
        if isinstance(self.mean, list):
            self.mean = tuple(self.mean)
        if isinstance(self.std, list):
            self.std = tuple(self.std)

    @property
    def size_hw(self) -> Tuple[int, int]:
        if isinstance(self.size, (tuple, list)):
            return tuple(self.size)
        return (self.size, self.size)


@dataclass
class AugmentationCfg:
    """Mirrors reference transform.py:62-74."""

    scale: Tuple[float, float] = (0.9, 1.0)
    ratio: Optional[Tuple[float, float]] = None
    color_jitter: Optional[Union[float, Tuple[float, ...]]] = None
    re_prob: Optional[float] = None
    re_count: Optional[int] = None
    use_timm: bool = False
    color_jitter_prob: Optional[float] = None
    gray_scale_prob: Optional[float] = None


def merge_preprocess_dict(base: PreprocessCfg, overlay: Optional[Dict[str, Any]]) -> PreprocessCfg:
    """Apply checkpoint-supplied preprocess overrides (reference transform.py merge logic)."""
    if not overlay:
        return base
    d = dataclasses.asdict(base)
    d.update({k: v for k, v in overlay.items() if k in d and v is not None})
    return PreprocessCfg(**d)


# per-sample C++ JPEG decode+resize in the uint8 canvas stage (DCT-scaled
# decode; ~5/255 high-frequency deviation from a full PIL decode on noisy
# JPEGs). Flip off to force the PIL decode path — scripts/ab_device_rrc.py
# uses this to isolate the decode stage from the on-device RRC.
NATIVE_DECODE = True

_PIL_INTERP = {}
if Image is not None:
    _PIL_INTERP = {
        "bicubic": Image.BICUBIC,
        "bilinear": Image.BILINEAR,
        "nearest": Image.NEAREST,
        "random": Image.BICUBIC,  # per-call random choice handled in train path
    }


def _resize_shortest(img, size: Tuple[int, int], interp):
    """torchvision Resize(int) semantics: smaller edge -> size, aspect preserved."""
    th, tw = size
    w, h = img.size
    if th == tw:
        short = min(h, w)
        if short == th:
            return img
        scale = th / short
        nw, nh = round(w * scale), round(h * scale)
    else:
        nw, nh = tw, th
    return img.resize((int(nw), int(nh)), interp)


def _resize_longest(img, size: Tuple[int, int], interp):
    th, tw = size
    w, h = img.size
    scale = min(th / h, tw / w)
    return img.resize((max(1, round(w * scale)), max(1, round(h * scale))), interp)


def _center_crop_or_pad(img, size: Tuple[int, int], fill=0):
    """torchvision-style center crop; pads symmetrically when the image is smaller
    (reference center_crop_or_pad, transform.py:211-240)."""
    th, tw = size
    w, h = img.size
    if w < tw or h < th:
        padded = Image.new(img.mode, (max(w, tw), max(h, th)), tuple([fill] * len(img.getbands())))
        padded.paste(img, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
        img = padded
        w, h = img.size
    left = int(round((w - tw) / 2.0))
    top = int(round((h - th) / 2.0))
    return img.crop((left, top, left + tw, top + th))


def _to_float_chw_free(img, mean, std) -> np.ndarray:
    """PIL -> normalized float32 HWC array (NHWC without batch)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, axis=-1)
    arr = (arr - np.asarray(mean, dtype=np.float32)) / np.asarray(std, dtype=np.float32)
    return arr


class _ValTransform:
    def __init__(self, cfg: PreprocessCfg):
        self.cfg = cfg
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC if Image else None)

    def __call__(self, img) -> np.ndarray:
        cfg = self.cfg
        size = cfg.size_hw
        if img.mode != cfg.mode:
            img = img.convert(cfg.mode)
        if cfg.resize_mode == "squash":
            img = img.resize((size[1], size[0]), self.interp)
        elif cfg.resize_mode == "longest":
            img = _resize_longest(img, size, self.interp)
            img = _center_crop_or_pad(img, size, fill=cfg.fill_color)
        else:  # shortest
            img = _resize_shortest(img, size, self.interp)
            img = _center_crop_or_pad(img, size, fill=cfg.fill_color)
        return _to_float_chw_free(img, cfg.mean, cfg.std)


class _TrainTransform:
    """RandomResizedCrop(size, scale, ratio) + normalize, matching torchvision
    RandomResizedCrop.get_params (reference train path, transform.py:418-447)."""

    def __init__(self, cfg: PreprocessCfg, aug: AugmentationCfg):
        self.cfg = cfg
        self.scale = aug.scale
        self.ratio = aug.ratio or (3.0 / 4.0, 4.0 / 3.0)
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC if Image else None)

    def _get_crop(self, w: int, h: int):
        area = w * h
        log_ratio = (np.log(self.ratio[0]), np.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * random.uniform(*self.scale)
            aspect = float(np.exp(random.uniform(*log_ratio)))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = random.randint(0, w - cw)
                top = random.randint(0, h - ch)
                return left, top, cw, ch
        # fallback: center crop at image aspect clamped to ratio range
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        return (w - cw) // 2, (h - ch) // 2, cw, ch

    def __call__(self, img) -> np.ndarray:
        cfg = self.cfg
        if img.mode != cfg.mode:
            img = img.convert(cfg.mode)
        w, h = img.size
        left, top, cw, ch = self._get_crop(w, h)
        th, tw = cfg.size_hw
        img = img.resize((tw, th), self.interp, box=(left, top, left + cw, top + ch))
        return _to_float_chw_free(img, cfg.mean, cfg.std)


def image_transform_v2(
    cfg: PreprocessCfg,
    is_train: bool,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
):
    """Build a PIL -> float32 HWC-normalized callable (reference transform.py:495-510)."""
    if is_train:
        if isinstance(aug_cfg, dict):
            aug_cfg = AugmentationCfg(**aug_cfg)
        return _TrainTransform(cfg, aug_cfg or AugmentationCfg())
    return _ValTransform(cfg)


def image_transform(
    image_size: Union[int, Tuple[int, int]],
    is_train: bool,
    mean: Optional[Tuple[float, ...]] = None,
    std: Optional[Tuple[float, ...]] = None,
    resize_mode: str = "shortest",
    interpolation: str = "bicubic",
    fill_color: int = 0,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
):
    """Legacy-signature builder (reference transform.py:367-460)."""
    cfg = PreprocessCfg(
        size=image_size,
        mean=mean or OPENAI_DATASET_MEAN,
        std=std or OPENAI_DATASET_STD,
        interpolation=interpolation,
        resize_mode=resize_mode,
        fill_color=fill_color,
    )
    return image_transform_v2(cfg, is_train, aug_cfg)


def collate_images(arrays: Sequence[np.ndarray]) -> np.ndarray:
    """Stack HWC float arrays into an NHWC batch."""
    return np.stack(arrays, axis=0)


# ---------------------------------------------------------------------------
# uint8 host tier — decode + geometry only; float conversion / normalize / crop
# augmentation run fused on device (BASELINE north star). H2D ships uint8: 4x
# fewer bytes than float32, and JPEG draft-mode decode skips most IDCT work.
# ---------------------------------------------------------------------------


def _decode_draft(data: bytes, target: Tuple[int, int]):
    """bytes -> PIL RGB, using JPEG draft mode to decode at a reduced scale when the
    image is much larger than the target (cuts decode time ~2-4x on large photos;
    draft only ever decodes at >= the requested size, so quality is preserved)."""
    import io as _io

    img = Image.open(_io.BytesIO(data))
    try:
        img.draft("RGB", (max(target), max(target)))
    except Exception:  # noqa: BLE001 — draft is JPEG-only; other codecs pass through
        pass
    img.load()
    return img.convert("RGB")


class _Uint8ValTransform:
    """Val-path geometry (resize + center crop) at uint8; pairs with
    ``make_device_preprocess`` which does the float convert + normalize on device."""

    accepts_bytes = True

    def __init__(self, cfg: PreprocessCfg):
        self.cfg = cfg
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC if Image else None)

    def __call__(self, img) -> np.ndarray:
        cfg = self.cfg
        size = cfg.size_hw
        if isinstance(img, (bytes, bytearray)):
            img = _decode_draft(bytes(img), size)
        if img.mode != cfg.mode:
            img = img.convert(cfg.mode)
        if cfg.resize_mode == "squash":
            img = img.resize((size[1], size[0]), self.interp)
        elif cfg.resize_mode == "longest":
            img = _resize_longest(img, size, self.interp)
            img = _center_crop_or_pad(img, size, fill=cfg.fill_color)
        else:
            img = _resize_shortest(img, size, self.interp)
            img = _center_crop_or_pad(img, size, fill=cfg.fill_color)
        return np.asarray(img, dtype=np.uint8)


class _Uint8CanvasTransform:
    """Train-path host stage: shortest-edge resize + center crop to a fixed square
    ``canvas`` (slightly larger than the model size) at uint8. The random resized
    crop itself runs on device (``make_device_train_preprocess``), batched and fused
    into the train step."""

    accepts_bytes = True

    def __init__(self, cfg: PreprocessCfg, canvas: int):
        self.cfg = cfg
        self.canvas = canvas
        self.interp = _PIL_INTERP.get(cfg.interpolation, Image.BICUBIC if Image else None)
        # the native (C++/libjpeg) decode stage implements exactly this geometry
        # for bicubic RGB; data/wds.py batch-decodes through it when set
        self.native_canvas = canvas if (
            NATIVE_DECODE and cfg.interpolation in ("bicubic",)
            and cfg.mode == "RGB") else None

    def __call__(self, img) -> np.ndarray:
        s = (self.canvas, self.canvas)
        if isinstance(img, (bytes, bytearray)):
            if self.native_canvas is not None:
                from .native import decode_resize_one

                out = decode_resize_one(bytes(img), self.canvas)
                if out is not None:
                    return out
            img = _decode_draft(bytes(img), s)
        if img.mode != self.cfg.mode:
            img = img.convert(self.cfg.mode)
        img = _resize_shortest(img, s, self.interp)
        img = _center_crop_or_pad(img, s, fill=self.cfg.fill_color)
        return np.asarray(img, dtype=np.uint8)


def default_canvas_size(cfg: PreprocessCfg) -> int:
    """Crop-source canvas for the device RRC: ~8/7 of the model size, rounded up to a
    multiple of 16 (224 -> 256). Large enough that scale-(0.9,1.0) crops never
    upsample, small enough to keep H2D bytes near the final size."""
    return int(np.ceil(max(cfg.size_hw) * 8 / 7 / 16) * 16)


def uint8_image_transform_v2(
    cfg: PreprocessCfg,
    is_train: bool,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
    canvas: Optional[int] = None,
):
    """Host stage of the device-preprocess path: PIL/bytes -> uint8 HWC at a fixed
    shape. Use with ``make_device_preprocess`` (val) / ``make_device_train_preprocess``
    (train) for the on-device half."""
    if is_train:
        return _Uint8CanvasTransform(cfg, canvas or default_canvas_size(cfg))
    return _Uint8ValTransform(cfg)


def _resample_kernel(u, kind: str):
    """Interpolation filter evaluated at (scaled) distance ``u`` from the source
    center. ``cubic`` is the Keys kernel with a=-0.5 — the convention PIL and
    torch's ``antialias=True`` resize use — so the device tier's resample quality
    matches the host PIL tier, not torch's non-AA a=-0.75 variant."""
    import jax.numpy as jnp

    au = jnp.abs(u)
    if kind == "linear":
        return jnp.maximum(0.0, 1.0 - au)
    if kind != "cubic":
        raise ValueError(f"unknown resample kernel {kind!r}")
    a = -0.5
    au2 = au * au
    return jnp.where(
        au <= 1.0,
        ((a + 2.0) * au - (a + 3.0)) * au2 + 1.0,
        jnp.where(au < 2.0, a * (((au - 5.0) * au + 8.0) * au - 4.0), 0.0),
    )


def make_crop_resample(s: int, th: int, tw: int, kind: str = "cubic",
                       antialias: bool = True):
    """Batched fractional crop-and-resize as two dense matmul contractions.

    Returns ``fn(x, top, left, ch, cw) -> (B, th, tw, C)`` resampling the per-sample
    box ``(top, left, ch, cw)`` (float, source pixels) of ``x: (B, s, s, C)`` to the
    target size. Random gathers are TPU-hostile, but a separable resample along an
    axis is a sparse row-stochastic matrix — materialize it dense per sample and
    contract on the MXU (two einsums, microseconds of MXU time at B=256/S=256/224px
    vs ~1 s for the equivalent general gather).

    With ``antialias`` the filter support is widened by the per-sample downscale
    factor and weights are renormalized over the in-bounds window — the same
    construction PIL's resize and torch's ``antialias=True`` use, so this matches
    the host tier's resample quality (PIL bicubic). Without it, ``linear``
    reproduces torch's non-AA half-pixel-centered 2-tap bilinear."""
    import jax.numpy as jnp

    def weights(start, extent, t_out):
        step = extent[:, None] / t_out                       # (B, 1)
        src = start[:, None] + (jnp.arange(t_out)[None, :] + 0.5) * step - 0.5
        ss = jnp.maximum(step, 1.0) if antialias else jnp.ones_like(step)
        grid = jnp.arange(s)[None, None, :]
        u = (grid - src[:, :, None]) / ss[:, :, None]        # (B, t_out, S)
        w = _resample_kernel(u, kind)
        return (w / jnp.sum(w, axis=-1, keepdims=True)).astype(jnp.float32)

    def fn(x, top, left, ch, cw):
        wy = weights(top, ch, th)
        wx = weights(left, cw, tw)
        rows = jnp.einsum("bhs,bswc->bhwc", wy, x)
        return jnp.einsum("bws,bhsc->bhwc", wx, rows)

    return fn


def make_crop_param_sampler(s: int, scale_rng: Tuple[float, float],
                            ratio_rng: Tuple[float, float], attempts: int = 10):
    """Jittable torchvision ``RandomResizedCrop.get_params`` for a square source.

    Returns ``fn(rng, b) -> (top, left, ch, cw)`` float arrays of shape (B,) with
    *integer values*, distributed exactly like the host tier's ``_get_crop``
    (reference transform.py:418-447 semantics): ``attempts`` independent
    (area, log-aspect) draws per sample, take the FIRST whose rounded crop fits
    inside the s x s source, else fall back to the ratio-clamped center crop.

    The rejection step matters: with the reference's default scale=(0.9, 1.0) the
    valid aspect window is narrow, so most draws fail and the fallback (full
    square) dominates. Clipping each axis to the source instead — the pre-round-4
    behavior — silently accepts every draw as an anisotropically *stretched* crop;
    an A/B (scripts/ab_device_rrc.py, docs/ab_device_rrc.json) measured that shift
    costing ~2x held-out retrieval at equal train loss."""
    import jax
    import jax.numpy as jnp

    log_ratio = (float(np.log(ratio_rng[0])), float(np.log(ratio_rng[1])))
    # static fallback (host _get_crop fallback for a square source): clamp the
    # source aspect (1.0) into the ratio range, center the crop
    if 1.0 < ratio_rng[0]:
        fb_cw, fb_ch = s, int(round(s / ratio_rng[0]))
    elif 1.0 > ratio_rng[1]:
        fb_cw, fb_ch = int(round(s * ratio_rng[1])), s
    else:
        fb_cw = fb_ch = s
    fb_left, fb_top = (s - fb_cw) // 2, (s - fb_ch) // 2

    def fn(rng: "jax.Array", b: int):
        k1, k2, k3 = jax.random.split(rng, 3)
        area = jax.random.uniform(k1, (b, attempts), minval=scale_rng[0],
                                  maxval=scale_rng[1]) * (s * s)
        aspect = jnp.exp(jax.random.uniform(k2, (b, attempts), minval=log_ratio[0],
                                            maxval=log_ratio[1]))
        cw = jnp.round(jnp.sqrt(area * aspect))
        ch = jnp.round(jnp.sqrt(area / aspect))
        ok = (cw > 0) & (cw <= s) & (ch > 0) & (ch <= s)
        first = jnp.argmax(ok, axis=1)  # index of the first accepted draw
        any_ok = jnp.any(ok, axis=1)
        pick = lambda a: jnp.take_along_axis(a, first[:, None], axis=1)[:, 0]
        cw_s = jnp.where(any_ok, pick(cw), float(fb_cw))
        ch_s = jnp.where(any_ok, pick(ch), float(fb_ch))
        # integer offsets, randint(0, s - c) inclusive like the host tier
        off = jax.random.uniform(k3, (b, 2))
        top = jnp.where(any_ok, jnp.floor(off[:, 0] * (s - ch_s + 1.0)), float(fb_top))
        left = jnp.where(any_ok, jnp.floor(off[:, 1] * (s - cw_s + 1.0)), float(fb_left))
        return top, left, ch_s, cw_s

    return fn


def make_device_train_preprocess(
    cfg: PreprocessCfg,
    aug_cfg: Optional[Union[Dict[str, Any], AugmentationCfg]] = None,
    antialias: bool = True,
):
    """Jittable fused train preprocess: (rng, uint8 (B, S, S, 3)) -> (B, th, tw, 3).

    Per-sample RandomResizedCrop with torchvision ``get_params`` semantics —
    including the 10-attempt rejection loop (``make_crop_param_sampler``; reference
    transform.py:418-447) — implemented as a batched separable resample
    (``make_crop_resample``): one XLA program that fuses with the normalize and the
    model's patchify matmul. The crop source is the host-stage canvas rather than
    the original photo (documented distribution shift traded for an entirely
    device-resident augmentation). The A/B (scripts/ab_device_rrc.py,
    docs/ab_device_rrc.json) pinned the round-3 tier's ~2x held-out retrieval
    deficit on crop-draw CLIPPING (stretched crops the host tier would reject);
    with rejection sampling the device tier matches the host tier. The filter
    matches the host tier's PIL resample semantics (bicubic Keys a=-0.5,
    antialiased) — the A/B measured that choice alone as neutral at this scale."""
    import jax
    import jax.numpy as jnp

    if isinstance(aug_cfg, dict):
        aug_cfg = AugmentationCfg(**aug_cfg)
    aug = aug_cfg or AugmentationCfg()
    # only scale/ratio are implemented on-device; erroring beats silently
    # training with a different augmentation recipe than the host tier would use
    unsupported = {f: getattr(aug, f) for f in
                   ("color_jitter", "color_jitter_prob", "gray_scale_prob",
                    "re_prob", "re_count", "use_timm")
                   if getattr(aug, f, None) not in (None, False, 0, 0.0)}
    if unsupported:
        raise ValueError(
            f"--device-preprocess implements only scale/ratio (RandomResizedCrop); "
            f"unsupported aug_cfg fields set: {unsupported} — drop them or disable "
            f"--device-preprocess to use the host PIL augmentation tier")
    scale_rng = aug.scale
    ratio_rng = aug.ratio or (3.0 / 4.0, 4.0 / 3.0)
    th, tw = cfg.size_hw
    mean = jnp.asarray(cfg.mean, dtype=jnp.float32)
    std = jnp.asarray(cfg.std, dtype=jnp.float32)
    kind = "linear" if cfg.interpolation == "bilinear" else "cubic"

    def fn(rng: "jax.Array", images: "jax.Array") -> "jax.Array":
        x = images.astype(jnp.float32) / 255.0
        b, s = x.shape[0], x.shape[1]
        sample_params = make_crop_param_sampler(s, scale_rng, ratio_rng)
        top, left, ch, cw = sample_params(rng, b)

        resample = make_crop_resample(s, th, tw, kind=kind, antialias=antialias)
        out = resample(x, top, left, ch, cw)
        return (out - mean) / std

    return fn


# ---------------------------------------------------------------------------
# device tier — fused on-TPU preprocessing
# ---------------------------------------------------------------------------

def make_device_preprocess(cfg: PreprocessCfg):
    """Return a jittable fn: uint8 (B, H, W, 3) -> normalized float (B, th, tw, 3).

    Resize (bicubic, antialiased when downsampling via jax.image.resize) + center crop +
    normalize run inside XLA, fusing with the model's patchify matmul — no host-side
    float conversion or normalization, 4x less H2D traffic (uint8 vs float32).
    """
    import jax
    import jax.numpy as jnp

    th, tw = cfg.size_hw
    mean = jnp.asarray(cfg.mean, dtype=jnp.float32)
    std = jnp.asarray(cfg.std, dtype=jnp.float32)
    method = {"bicubic": "cubic", "bilinear": "linear", "nearest": "nearest"}.get(
        cfg.interpolation, "cubic"
    )

    def fn(images: "jax.Array") -> "jax.Array":
        x = images.astype(jnp.float32) / 255.0
        b, h, w, c = x.shape
        if (h, w) != (th, tw):
            if cfg.resize_mode == "squash":
                x = jax.image.resize(x, (b, th, tw, c), method=method, antialias=True)
            else:
                # shortest-edge resize then center crop (static shapes: computed at trace time)
                scale = max(th / h, tw / w)
                nh, nw = round(h * scale), round(w * scale)
                x = jax.image.resize(x, (b, nh, nw, c), method=method, antialias=True)
                top, left = (nh - th) // 2, (nw - tw) // 2
                x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, th, tw, c))
        return (x - mean) / std

    return fn
