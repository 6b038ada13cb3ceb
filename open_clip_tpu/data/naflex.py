"""NaFlex token-budget batching + patchify transforms.

Equivalents of reference ``src/open_clip/naflex_config.py`` (resolved data config) and
``src/open_clip_train/naflex_data.py`` (deterministic rank-synced (seq_len, batch_size)
schedules, patch-dict collation). The key property carries over unchanged — every
(seq_len, patch_size) bucket is one static shape, which is exactly what XLA wants:
the whole variable-resolution pipeline compiles to a small closed set of programs.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class NaFlexDataConfig:
    """Mirrors reference NaFlexDataConfig (naflex_config.py:17-119)."""

    patch_sizes: Tuple[int, ...] = (16,)
    patch_size_probs: Optional[Tuple[float, ...]] = None
    seq_lens: Tuple[int, ...] = (128, 256, 576, 784, 1024)
    seq_len_probs: Optional[Tuple[float, ...]] = None
    max_tokens_per_batch: int = 16384
    batch_divisor: int = 8
    pad_multiple: Optional[int] = None
    eval_seq_len: int = 576
    eval_patch_size: Optional[int] = None
    seed: int = 0

    def resolve(self) -> "NaFlexDataConfig":
        ps = tuple(self.patch_sizes)
        psp = self.patch_size_probs or tuple(1.0 / len(ps) for _ in ps)
        sl = tuple(self.seq_lens)
        slp = self.seq_len_probs or tuple(1.0 / len(sl) for _ in sl)
        assert abs(sum(psp) - 1.0) < 1e-6 and abs(sum(slp) - 1.0) < 1e-6
        return NaFlexDataConfig(
            patch_sizes=ps, patch_size_probs=psp, seq_lens=sl, seq_len_probs=slp,
            max_tokens_per_batch=self.max_tokens_per_batch, batch_divisor=self.batch_divisor,
            pad_multiple=self.pad_multiple, eval_seq_len=self.eval_seq_len,
            eval_patch_size=self.eval_patch_size or ps[0], seed=self.seed,
        )


def calculate_batch_size(
    seq_len: int, max_tokens: int, divisor: int = 8, min_batch: int = 1
) -> int:
    """Batch size inversely proportional to seq_len, divisor-rounded
    (reference naflex_data.py:582-627)."""
    raw = max_tokens / seq_len
    rounded = int(raw // divisor) * divisor
    return max(rounded, min_batch)


class NaFlexBatchScheduler:
    """Deterministic per-epoch schedule of (patch_size, seq_len, batch_size) tuples
    (reference NaFlexBatchScheduler, naflex_data.py:446-580): every rank derives the
    same schedule from (seed, epoch), so static shapes line up across the mesh."""

    def __init__(self, cfg: NaFlexDataConfig, num_batches: int):
        self.cfg = cfg.resolve()
        self.num_batches = num_batches

    def schedule(self, epoch: int) -> List[Tuple[int, int, int]]:
        rng = random.Random(self.cfg.seed * 100003 + epoch)
        out = []
        for _ in range(self.num_batches):
            p = rng.choices(self.cfg.patch_sizes, weights=self.cfg.patch_size_probs)[0]
            s = rng.choices(self.cfg.seq_lens, weights=self.cfg.seq_len_probs)[0]
            b = calculate_batch_size(s, self.cfg.max_tokens_per_batch, self.cfg.batch_divisor)
            out.append((p, s, b))
        return out


# ---------------------------------------------------------------------------
# patchify transforms (host side)
# ---------------------------------------------------------------------------

def _target_grid(w: int, h: int, patch: int, max_seq_len: int) -> Tuple[int, int]:
    """Largest aspect-preserving (gw, gh) with gw*gh <= max_seq_len."""
    scale = math.sqrt(max_seq_len * patch * patch / (w * h))
    scale = min(scale, 1.0) if w * h <= max_seq_len * patch * patch else scale
    gw = max(1, int(w * scale / patch))
    gh = max(1, int(h * scale / patch))
    while gw * gh > max_seq_len:
        if gw >= gh:
            gw -= 1
        else:
            gh -= 1
    return gw, gh


class NaFlexTransform:
    """PIL -> {"patches", "patch_coord", "patch_valid"} padded to max_seq_len
    (the reference's transform *factory* contract, transform.py:77-130: callable is
    created per (max_seq_len, patch_size) bucket)."""

    def __init__(
        self,
        max_seq_len: int,
        patch_size: int,
        mean=(0.48145466, 0.4578275, 0.40821073),
        std=(0.26862954, 0.26130258, 0.27577711),
        interpolation: str = "bicubic",
    ):
        from PIL import Image

        self.max_seq_len = max_seq_len
        self.patch_size = patch_size
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)
        self.interp = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR}.get(interpolation, Image.BICUBIC)

    def __call__(self, img) -> Dict[str, np.ndarray]:
        p = self.patch_size
        if img.mode != "RGB":
            img = img.convert("RGB")
        gw, gh = _target_grid(img.width, img.height, p, self.max_seq_len)
        img = img.resize((gw * p, gh * p), self.interp)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - self.mean) / self.std  # (gh*p, gw*p, 3)
        n = gh * gw
        patches = arr.reshape(gh, p, gw, p, 3).transpose(0, 2, 1, 3, 4).reshape(n, p * p * 3)
        ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        coords = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1).astype(np.int32)

        max_len = self.max_seq_len
        out_patches = np.zeros((max_len, p * p * 3), dtype=np.float32)
        out_coords = np.zeros((max_len, 2), dtype=np.int32)
        out_valid = np.zeros((max_len,), dtype=bool)
        out_patches[:n] = patches
        out_coords[:n] = coords
        out_valid[:n] = True
        return {"patches": out_patches, "patch_coord": out_coords, "patch_valid": out_valid}


def collate_naflex(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack patch dicts (equal shapes within a bucket) — reference collate_naflex_dicts
    (naflex_data.py:196-238)."""
    return {k: np.stack([s[k] for s in samples], axis=0) for k in samples[0]}


def naflex_transform_factory(cfg: NaFlexDataConfig, mean=None, std=None) -> Callable:
    """(max_seq_len, patch_size) -> transform, cached per bucket."""
    cache: Dict[Tuple[int, int], NaFlexTransform] = {}
    kw = {}
    if mean is not None:
        kw["mean"] = mean
    if std is not None:
        kw["std"] = std

    def get(seq_len: int, patch_size: int) -> NaFlexTransform:
        key = (seq_len, patch_size)
        if key not in cache:
            cache[key] = NaFlexTransform(seq_len, patch_size, **kw)
        return cache[key]

    return get


class NaFlexWdsPipeline:
    """NaFlex wds training pipeline: the deterministic per-epoch (patch, seq_len, batch)
    schedule drives per-bucket transforms over the shared sample stream (reference
    NaFlexBatcher + NaFlexMapDatasetWrapper, naflex_data.py:794-1045). Every batch has
    one static (batch, seq_len) shape from the closed bucket set."""

    def __init__(self, wds_pipeline, data_cfg: NaFlexDataConfig, num_batches: int, tokenizer,
                 mean=None, std=None, bucketer=None):
        self.inner = wds_pipeline  # provides _samples(epoch) of {image_bytes, caption}
        self.cfg = data_cfg.resolve()
        self.scheduler = NaFlexBatchScheduler(self.cfg, num_batches)
        self.factory = naflex_transform_factory(self.cfg, mean=mean, std=std)
        self.tokenizer = tokenizer
        self.bucketer = bucketer  # optional LengthBucketer (data/bucketing.py)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.inner.set_epoch(epoch)
        if self.bucketer is not None:
            self.bucketer.set_epoch(epoch)

    def __iter__(self):
        from .wds import decode_image_rgb

        schedule = self.scheduler.schedule(self.epoch)
        stream = self.inner._samples(self.epoch)
        if self.bucketer is not None:
            stream = iter(self.bucketer(stream))
        for patch_size, seq_len, batch_size in schedule:
            transform = self.factory(seq_len, patch_size)
            dicts, captions = [], []
            while len(dicts) < batch_size:
                try:
                    rec = next(stream)
                except StopIteration:
                    return
                try:
                    d = transform(decode_image_rgb(rec["image_bytes"]))
                except Exception:  # noqa: BLE001 — skip-and-replenish (naflex_data.py:900-925)
                    continue
                dicts.append(d)
                captions.append(rec["caption"])
            batch = collate_naflex(dicts)
            yield {"image": batch, "text": np.asarray(self.tokenizer(captions), dtype=np.int32)}


class SyntheticNaFlexDataset:
    """NaFlex patch-dict synthetic batches for smoke tests (one bucket per schedule entry)."""

    def __init__(self, data_cfg: NaFlexDataConfig, tokenizer, num_batches: int = 4,
                 caption: str = "a synthetic caption"):
        from PIL import Image

        self.cfg = data_cfg.resolve()
        self.scheduler = NaFlexBatchScheduler(self.cfg, num_batches)
        self.factory = naflex_transform_factory(self.cfg)
        self.tokenizer = tokenizer
        self.caption = caption
        self.num_batches = num_batches
        self.epoch = 0
        self._img = Image.new("RGB", (96, 64))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self):
        for patch_size, seq_len, batch_size in self.scheduler.schedule(self.epoch):
            t = self.factory(seq_len, patch_size)
            d = t(self._img)
            batch = {k: np.repeat(v[None], batch_size, axis=0) for k, v in d.items()}
            txt = np.repeat(np.asarray(self.tokenizer([self.caption]), np.int32), batch_size, axis=0)
            yield {"image": batch, "text": txt}
