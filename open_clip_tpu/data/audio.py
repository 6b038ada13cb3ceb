"""Audio preprocessing + datasets (host side, numpy).

Equivalents of reference ``src/open_clip/audio/transform.py`` (fixed-clip fill/truncate
+ 4-view fusion mel stack) and ``src/open_clip_train/audio_data.py`` (wds audio
pipeline, synthetic audio) without torchaudio: resampling is linear-interp, the mel
uses the shared numpy mirror of the on-device mel (data/naflex_audio._np_log_mel).
"""

from __future__ import annotations

import random
from dataclasses import asdict, dataclass, is_dataclass
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from ..config import CLIPAudioCfg
from ..models.genlap import AudioNaFlexCfg
from .naflex_audio import _np_log_mel, resample_poly


@dataclass
class AudioAugmentationCfg:
    """reference audio/transform.py:11-17."""

    data_trunc: str = "rand_trunc"
    data_fill: str = "repeatpad"
    enable_fusion: bool = False
    int16_normalize: bool = False


def _cfg_dict(audio_cfg) -> Dict[str, Any]:
    if is_dataclass(audio_cfg):
        return asdict(audio_cfg)
    return dict(audio_cfg)


def get_audio_frame_count(audio_cfg) -> int:
    cfg = _cfg_dict(audio_cfg)
    return cfg.get("clip_samples", 480000) // cfg.get("hop_size", 480) + 1


def int16_roundtrip(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, -1.0, 1.0)
    return ((x * 32767.0).astype(np.int16) / 32767.0).astype(np.float32)


def _mel_for(cfg: Dict[str, Any], wav: np.ndarray) -> np.ndarray:
    ncfg = AudioNaFlexCfg(
        sample_rate=cfg.get("sample_rate", 48000),
        window_size=cfg.get("window_size", 1024),
        hop_size=cfg.get("hop_size", 480),
        fmin=cfg.get("fmin", 50),
        fmax=cfg.get("fmax", 14000),
        n_mels=cfg.get("mel_bins", 64),
    )
    return _np_log_mel(wav, ncfg)  # (frames, n_mels)


class AudioPreprocess:
    """(waveform, sr) -> {"waveform", "longer"[, "mel_fusion"]}
    (reference AudioPreprocess, audio/transform.py:60-160)."""

    def __init__(
        self,
        audio_cfg,
        data_fill: str = "repeatpad",
        data_trunc: str = "rand_trunc",
        int16_normalize: bool = False,
    ):
        self.cfg = _cfg_dict(audio_cfg)
        self.data_fill = data_fill
        self.data_trunc = data_trunc
        self.int16_normalize = int16_normalize
        self.target_sr = self.cfg.get("sample_rate", 48000)
        self.clip_samples = self.cfg.get("clip_samples", 480000)
        self.hop_size = self.cfg.get("hop_size", 480)

    def _fill(self, wav: np.ndarray) -> np.ndarray:
        n = self.clip_samples
        if len(wav) >= n:
            return wav[:n]
        if self.data_fill == "repeat":
            reps = int(np.ceil(n / len(wav)))
            return np.tile(wav, reps)[:n]
        if self.data_fill == "repeatpad":
            reps = n // len(wav)
            wav = np.tile(wav, max(reps, 1))
            return np.pad(wav, (0, n - len(wav)))
        if self.data_fill == "pad":
            return np.pad(wav, (0, n - len(wav)))
        raise ValueError(f"unsupported audio fill mode {self.data_fill!r}")

    def __call__(self, audio_data: Tuple[np.ndarray, int]) -> Dict[str, np.ndarray]:
        wav, sr = audio_data
        wav = np.asarray(wav, dtype=np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        if sr != self.target_sr:
            wav = resample_poly(wav, sr, self.target_sr)
        if self.int16_normalize:
            wav = int16_roundtrip(wav)

        result: Dict[str, np.ndarray] = {}
        n = self.clip_samples
        if len(wav) > n:
            if self.data_trunc == "fusion":
                mel = _mel_for(self.cfg, wav)
                chunk = n // self.hop_size + 1
                total = mel.shape[0]
                if chunk >= total:
                    result["mel_fusion"] = np.stack([mel] * 4)
                    longer = False
                else:
                    ranges = [
                        (0, chunk),
                        ((total - chunk) // 2, (total - chunk) // 2 + chunk),
                        (total - chunk, total),
                    ]
                    locals_ = [mel[s:e] for s, e in ranges]
                    locals_ = [
                        np.pad(m, ((0, chunk - m.shape[0]), (0, 0))) if m.shape[0] < chunk else m
                        for m in locals_
                    ]
                    g = mel
                    if g.shape[0] < chunk:
                        g = np.pad(g, ((0, chunk - g.shape[0]), (0, 0)))
                    elif g.shape[0] > chunk:
                        idx = random.randint(0, g.shape[0] - chunk)
                        g = g[idx : idx + chunk]
                    result["mel_fusion"] = np.stack([g] + locals_)
                    longer = True
                wav = wav[:n]
            elif self.data_trunc == "rand_trunc":
                idx = random.randint(0, len(wav) - n)
                wav = wav[idx : idx + n]
                longer = True
            elif self.data_trunc == "trunc":
                wav = wav[:n]
                longer = True
            else:
                raise ValueError(f"unsupported audio truncation mode {self.data_trunc!r}")
        else:
            wav = self._fill(wav)
            longer = False
            if self.data_trunc == "fusion":
                mel = _mel_for(self.cfg, wav)
                result["mel_fusion"] = np.stack([mel] * 4)

        result["waveform"] = wav.astype(np.float32)
        result["longer"] = np.asarray(longer)
        return result


def audio_transform_v2(audio_cfg, is_train: bool = False, audio_aug_cfg=None) -> AudioPreprocess:
    """reference audio_transform_v2 (audio/transform.py:173-195)."""
    cfg = _cfg_dict(audio_cfg)
    if isinstance(audio_aug_cfg, dict):
        audio_aug_cfg = AudioAugmentationCfg(**audio_aug_cfg)
    elif audio_aug_cfg is None:
        audio_aug_cfg = AudioAugmentationCfg()
    enable_fusion = bool(audio_aug_cfg.enable_fusion or cfg.get("enable_fusion", False))
    data_trunc = audio_aug_cfg.data_trunc if is_train else "trunc"
    if enable_fusion:
        data_trunc = "fusion"
    return AudioPreprocess(
        cfg, data_fill=audio_aug_cfg.data_fill, data_trunc=data_trunc,
        int16_normalize=audio_aug_cfg.int16_normalize,
    )


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

class SyntheticAudioDataset:
    """Sine-wave clips + fixed caption (reference get_synthetic_audio_dataset,
    audio_data.py:394-430)."""

    def __init__(
        self,
        preprocess: AudioPreprocess,
        tokenizer,
        dataset_size: int = 100,
        batch_size: int = 8,
        seconds: float = 2.0,
        caption: str = "a synthetic tone for smoke testing",
    ):
        # CLAP preprocess carries target_sr; the GenLAP NaFlex patchify carries its
        # AudioNaFlexCfg — both feed the same synthetic pipeline
        sr = getattr(preprocess, "target_sr", None) or preprocess.cfg.sample_rate
        t = np.arange(int(sr * seconds)) / sr
        wav = (0.1 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        sample = preprocess((wav, sr))
        self.batch_size = batch_size
        self.num_samples = dataset_size
        n = batch_size
        self._batch = {
            "audio": {k: np.repeat(v[None], n, axis=0) for k, v in sample.items()},
            "text": np.repeat(np.asarray(tokenizer([caption]), dtype=np.int32), n, axis=0),
        }

    def set_epoch(self, epoch: int) -> None:
        pass

    def __iter__(self):
        for _ in range(max(1, self.num_samples // self.batch_size)):
            yield {
                "audio": {k: v.copy() for k, v in self._batch["audio"].items()},
                "text": self._batch["text"].copy(),
            }


def decode_audio_bytes(data: bytes, ext: str) -> Tuple[np.ndarray, int]:
    """Decode audio bytes. WAV decodes natively (scipy); other codecs need soundfile
    (gated)."""
    import io

    if ext in ("wav",):
        from scipy.io import wavfile

        sr, wav = wavfile.read(io.BytesIO(data))
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim == 2:
            wav = wav.T  # (C, T)
        return wav, sr
    try:
        import soundfile as sf  # optional

        wav, sr = sf.read(io.BytesIO(data), dtype="float32")
        return wav.T if wav.ndim == 2 else wav, sr
    except ImportError as e:
        raise RuntimeError(f"cannot decode .{ext} audio without soundfile") from e


def make_wds_audio_pipeline(cfg, preprocess, tokenizer, audio_ext: str = None):
    """Audio wds pipeline: reuses the image WdsPipeline with an audio decode stage
    (reference get_wds_audio_dataset, audio_data.py:155-418). ``audio_ext`` pins the
    preferred tar member suffix (reference --audio-ext); other known audio suffixes
    still match as fallback."""
    from .wds import AUDIO_EXTS, WdsConfig, WdsPipeline, extract_caption, iterate_tar_samples

    exts = ((audio_ext,) if audio_ext else ()) + tuple(
        e for e in AUDIO_EXTS if e != audio_ext)

    class AudioWds(WdsPipeline):
        def _samples(self, epoch):
            # same swap-shuffle buffer as the image pipeline: without it samples
            # arrive in tar order (recording sessions / classes cluster within a
            # shard), correlating consecutive contrastive batches
            rng = random.Random(self.cfg.seed * 7919 + epoch)
            buf = []
            for shard in self._my_shards(epoch):
                for sample in iterate_tar_samples(shard):
                    caption = extract_caption(sample, self.cfg.caption_key)
                    pair = next(((sample[e], e) for e in exts if e in sample), None)
                    if caption is None or pair is None:
                        continue
                    rec = {"audio_bytes": pair[0], "audio_ext": pair[1], "caption": caption}
                    if self.cfg.shuffle_samples:
                        if len(buf) < self.cfg.shuffle_samples:
                            buf.append(rec)
                            continue
                        idx = rng.randrange(len(buf))
                        buf[idx], rec = rec, buf[idx]
                    yield rec
            rng.shuffle(buf)
            yield from buf

        def __iter__(self):
            auds, caps = [], []
            for rec in self._samples(self.epoch):
                try:
                    wav, sr = decode_audio_bytes(rec["audio_bytes"], rec["audio_ext"])
                    out = self.preprocess((wav, sr))
                except Exception:  # noqa: BLE001 — data-plane fault tolerance
                    continue
                auds.append(out)
                caps.append(rec["caption"])
                if len(auds) == self.cfg.batch_size:
                    yield self._collate_audio(auds, caps)
                    auds, caps = [], []
            if auds and self.cfg.partial_batches:
                yield self._collate_audio(auds, caps)

        def _collate_audio(self, auds, caps):
            batch = {k: np.stack([a[k] for a in auds]) for k in auds[0]}
            return {"audio": batch, "text": np.asarray(self.tokenizer(caps), dtype=np.int32)}

    return AudioWds(cfg, preprocess, tokenizer)


# The reference gates audio on torchaudio/torchlibrosa availability
# (reference __init__.py AUDIO_AVAILABLE / require_audio). The TPU build's audio
# front-ends are self-contained (numpy/scipy mel + native encoders), so audio is
# always available; require_audio mirrors the API for drop-in compatibility.
AUDIO_AVAILABLE = True


def require_audio() -> None:
    """No-op guard kept for reference-API compatibility."""
