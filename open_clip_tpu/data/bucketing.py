"""Length bucketing for variable-length text/audio batches.

Re-design of reference ``src/open_clip_train/naflex_data.py:236-443`` (CaptionLength /
AudioTokenLength / LengthBucketer / pool prefetch): reorder the sample stream so
similar sequence lengths batch together, cutting padding waste in token-budget NaFlex
batches. Reorder-only — the sample multiset and step count are preserved exactly; the
sort key is a sum of pluggable length functions.

The bucketer is a plain iterator stage (no torch DataLoader machinery): it pools
``pool`` samples, sorts by length, splits into ``chunk``-sized runs, and shuffles the
runs with a (seed, epoch)-derived rng so epochs stay deterministic. ``prefetch_pools``
moves the fill+sort upstream onto a background thread so disk reads overlap the
decode drain.
"""

from __future__ import annotations

import math
import queue
import random
import struct
import threading
from typing import Callable, Dict, Iterable, List, Optional, Sequence

Sample = Dict[str, object]


class CaptionLength:
    """Length-fn: caption token count (reference naflex_data.py:236-249)."""

    def __init__(self, key: str = "caption", tokenizer=None):
        self.key = key
        self.tokenizer = tokenizer

    def __call__(self, sample: Sample) -> int:
        value = sample.get(self.key)
        if value is None:
            return 0
        if hasattr(value, "shape"):
            return int(value.shape[-1] if value.ndim else 0)
        if isinstance(value, (bytes, str)) and self.tokenizer is not None:
            text = value.decode("utf-8", "ignore") if isinstance(value, bytes) else value
            import numpy as np

            toks = np.asarray(self.tokenizer([text]))[0]
            # unpadded length when the tokenizer pads with 0
            return int((toks != 0).sum())
        return len(value) if hasattr(value, "__len__") else 0


def _wav_header_frames(raw: bytes):
    """(num_frames, sample_rate) from a RIFF/WAVE header, or None.

    Native replacement for the reference's torchaudio.info header parse
    (naflex_data.py:283-290): bucketing reorders *before* decode, so lengths must come
    from compressed bytes. Only wav is parsed (the native audio loader is wav-first);
    other containers return None and simply sort together.
    """
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = None
    block_align = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        if cid == b"fmt " and pos + 24 <= len(raw):
            sample_rate = struct.unpack_from("<I", raw, pos + 12)[0]
            block_align = struct.unpack_from("<H", raw, pos + 20)[0]
        elif cid == b"data" and sample_rate and block_align:
            return size // max(block_align, 1), sample_rate
        pos += 8 + size + (size & 1)
    return None


class AudioTokenLength:
    """Length-fn: estimated NaFlex audio-patch count before patchify (reference
    naflex_data.py:251-304): resample-aware frame count, ceil to time patches,
    multiplied by freq tokens, clamped to the largest bucket."""

    def __init__(
        self,
        audio_key: str = "audio",
        freq_tokens: int = 1,
        patch_time: int = 1,
        hop_size: int = 1,
        window_size: int = 0,
        sample_rate: int = 0,
        max_audio_tokens: int = 0,
    ):
        self.audio_key = audio_key
        self.freq_tokens = max(1, int(freq_tokens))
        self.patch_time = max(1, int(patch_time))
        self.hop_size = max(1, int(hop_size))
        self.window_size = max(0, int(window_size))
        self.sample_rate = int(sample_rate)
        self.max_audio_tokens = max(0, int(max_audio_tokens))

    def __call__(self, sample: Sample) -> int:
        audio = sample.get(self.audio_key)
        if isinstance(audio, (bytes, bytearray)):
            parsed = _wav_header_frames(bytes(audio))
            if parsed is None:
                return 0
            num_samples, sr = parsed
        elif isinstance(audio, (tuple, list)) and audio and hasattr(audio[0], "shape"):
            waveform, sr = audio[0], (audio[1] if len(audio) > 1 else 0)
            num_samples = waveform.shape[-1]
        elif hasattr(audio, "shape"):
            num_samples, sr = audio.shape[-1], 0
        else:
            return 0
        if self.sample_rate and sr and sr != self.sample_rate:
            num_samples = num_samples * self.sample_rate / sr
        num_samples = max(num_samples, self.window_size)
        frames = int(num_samples // self.hop_size) + 1
        time_tokens = max(1, math.ceil(frames / self.patch_time))
        tokens = self.freq_tokens * time_tokens
        return min(tokens, self.max_audio_tokens) if self.max_audio_tokens else tokens


class LengthBucketer:
    """Reorder a sample stream so similar lengths are adjacent (reference
    naflex_data.py:371-443). Pool -> sort by summed length fns -> chunk -> shuffle
    chunks with a (seed, epoch) rng. ``set_epoch`` reseeds per epoch."""

    def __init__(
        self,
        length_fns: Optional[Sequence[Callable[[Sample], int]]] = None,
        pool: int = 2048,
        chunk: int = 128,
        seed: int = 42,
        prefetch_pools: int = 0,
    ):
        self.length_fns = list(length_fns) if length_fns else [CaptionLength()]
        self.pool = max(1, int(pool))
        self.chunk = max(1, int(chunk))
        self.seed = int(seed)
        self.epoch = 0
        self.prefetch_pools = max(0, int(prefetch_pools))

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def _length(self, sample: Sample) -> int:
        return sum(fn(sample) for fn in self.length_fns)

    def _flush(self, buffer: List[Sample], rng: random.Random):
        buffer.sort(key=self._length)
        chunks = [buffer[i:i + self.chunk] for i in range(0, len(buffer), self.chunk)]
        rng.shuffle(chunks)
        for chunk in chunks:
            yield from chunk

    def _pools(self, src: Iterable[Sample], rng: random.Random, stop=None):
        buffer: List[Sample] = []
        for sample in src:
            if stop is not None and stop.is_set():
                return
            buffer.append(sample)
            if len(buffer) >= self.pool:
                yield list(self._flush(buffer, rng))
                buffer = []
        if buffer:
            yield list(self._flush(buffer, rng))

    def __call__(self, src: Iterable[Sample]):
        rng = random.Random(self.seed + self.epoch * 131)
        if self.prefetch_pools > 0:
            yield from _prefetch(lambda stop: self._pools(src, rng, stop),
                                 maxsize=self.prefetch_pools)
            return
        for pool in self._pools(src, rng):
            yield from pool


def _prefetch(make_pools: Callable, maxsize: int, poll: float = 1.0):
    """Drain pools produced on a background thread through a bounded queue (reference
    naflex_data.py:306-368): upstream read/sort overlaps the downstream decode."""
    pending: "queue.Queue" = queue.Queue(maxsize=maxsize)
    stop = threading.Event()
    box: Dict[str, BaseException] = {}
    SENTINEL = object()

    def producer():
        try:
            for pool in make_pools(stop):
                while True:
                    try:
                        pending.put(pool, timeout=poll)
                        break
                    except queue.Full:
                        if stop.is_set():
                            return
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer side
            box["exc"] = e
        finally:
            while True:
                try:
                    pending.put(SENTINEL, timeout=poll)
                    break
                except queue.Full:
                    if stop.is_set():
                        return

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            pool = pending.get()
            if pool is SENTINEL:
                break
            yield from pool
    finally:
        stop.set()
        try:
            while True:
                pending.get_nowait()
        except queue.Empty:
            pass
    if "exc" in box:
        raise box["exc"]
