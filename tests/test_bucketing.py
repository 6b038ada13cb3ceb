"""Length bucketing (reference naflex_data.py:236-443): reorder-only, deterministic,
length-sorted chunks; wav-header audio token estimation."""

import io
import struct
import wave

import numpy as np

from open_clip_tpu.data.bucketing import (
    AudioTokenLength, CaptionLength, LengthBucketer, _wav_header_frames,
)


def _samples(n=300, seed=0):
    rng = np.random.default_rng(seed)
    return [{"id": i, "caption": np.zeros((int(rng.integers(1, 77)),), np.int32)}
            for i in range(n)]


def test_bucketer_preserves_multiset():
    samples = _samples()
    out = list(LengthBucketer([CaptionLength()], pool=128, chunk=16)(iter(samples)))
    assert sorted(s["id"] for s in out) == sorted(s["id"] for s in samples)
    assert len(out) == len(samples)


def test_bucketer_reduces_length_spread():
    samples = _samples(512)
    bucketer = LengthBucketer([CaptionLength()], pool=256, chunk=32)
    out = list(bucketer(iter(samples)))

    def spread(seq, chunk=32):
        tot = 0.0
        for i in range(0, len(seq), chunk):
            lens = [len(s["caption"]) for s in seq[i:i + chunk]]
            tot += max(lens) - min(lens)
        return tot

    assert spread(out) < 0.3 * spread(samples)


def test_bucketer_deterministic_per_epoch():
    samples = _samples()
    b1 = LengthBucketer([CaptionLength()], pool=128, chunk=16, seed=7)
    b2 = LengthBucketer([CaptionLength()], pool=128, chunk=16, seed=7)
    b1.set_epoch(3)
    b2.set_epoch(3)
    assert [s["id"] for s in b1(iter(samples))] == [s["id"] for s in b2(iter(samples))]
    b2.set_epoch(4)
    assert [s["id"] for s in b1(iter(samples))] != [s["id"] for s in b2(iter(samples))]


def test_bucketer_prefetch_matches_sync():
    samples = _samples()
    sync = LengthBucketer([CaptionLength()], pool=128, chunk=16, seed=5)
    pre = LengthBucketer([CaptionLength()], pool=128, chunk=16, seed=5, prefetch_pools=2)
    assert [s["id"] for s in sync(iter(samples))] == [s["id"] for s in pre(iter(samples))]


def _wav_bytes(n_frames, sr=48000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def test_wav_header_parse():
    frames, sr = _wav_header_frames(_wav_bytes(48000 * 3, 48000))
    assert frames == 48000 * 3 and sr == 48000
    assert _wav_header_frames(b"not a wav file at all" * 4) is None


def test_audio_token_length_matches_patchify_formula():
    # 3 s at 16 kHz source, model at 48 kHz, hop 480, patch_time 4, 1 freq token
    raw = _wav_bytes(16000 * 3, sr=16000)
    fn = AudioTokenLength(freq_tokens=1, patch_time=4, hop_size=480,
                          window_size=1024, sample_rate=48000)
    # resampled samples = 48000*3; frames = 48000*3//480 + 1 = 301; ceil(301/4) = 76
    assert fn({"audio": raw}) == 76
    # decoded-waveform input takes the same path
    wav = np.zeros((16000 * 3,), np.float32)
    assert fn({"audio": (wav, 16000)}) == 76
    # cap at the largest bucket
    fn_cap = AudioTokenLength(freq_tokens=1, patch_time=4, hop_size=480,
                              window_size=1024, sample_rate=48000, max_audio_tokens=50)
    assert fn_cap({"audio": raw}) == 50
