"""Audio transform + dataset + audio zero-shot plumbing tests."""

import io
import tarfile

import numpy as np
import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import CLIPAudioCfg
from open_clip_tpu.data.audio import (
    AudioPreprocess,
    SyntheticAudioDataset,
    audio_transform_v2,
    decode_audio_bytes,
    get_audio_frame_count,
    make_wds_audio_pipeline,
)
from open_clip_tpu.data.wds import WdsConfig
from open_clip_tpu.train.audio_zero_shot import run_audio_zero_shot

CFG = {"sample_rate": 16000, "clip_samples": 32000, "hop_size": 160, "window_size": 400,
       "mel_bins": 64, "fmin": 50, "fmax": 8000}


def _fake_tokenizer(texts):
    out = np.zeros((len(texts), 8), dtype=np.int32)
    for i, t in enumerate(texts):
        h = abs(hash(t))
        out[i, :] = [(h >> (7 * j)) % 127 + 1 for j in range(8)]
    return out


def test_fill_modes():
    wav = np.ones(1000, dtype=np.float32)
    for mode, check in [
        ("pad", lambda w: w[1500] == 0.0),
        ("repeat", lambda w: w[1500] == 1.0),
        ("repeatpad", lambda w: w[31000] == 1.0 or w[31999] == 0.0),
    ]:
        pp = AudioPreprocess(CFG, data_fill=mode, data_trunc="trunc")
        out = pp((wav, 16000))
        assert out["waveform"].shape == (32000,)
        assert not out["longer"]
        assert check(out["waveform"]), mode


def test_trunc_modes():
    wav = np.random.default_rng(0).standard_normal(64000).astype(np.float32)
    for mode in ("trunc", "rand_trunc"):
        pp = AudioPreprocess(CFG, data_trunc=mode)
        out = pp((wav, 16000))
        assert out["waveform"].shape == (32000,)
        assert out["longer"]


def test_fusion_mode():
    wav = np.random.default_rng(1).standard_normal(64000).astype(np.float32)
    pp = audio_transform_v2({**CFG, "enable_fusion": True}, is_train=True)
    out = pp((wav, 16000))
    frames = get_audio_frame_count(CFG)
    assert out["mel_fusion"].shape == (4, frames, 64)
    assert out["longer"]
    # short clip: 4 identical views, longer=False
    out2 = pp((wav[:8000], 16000))
    assert out2["mel_fusion"].shape == (4, frames, 64)
    assert not out2["longer"]
    np.testing.assert_array_equal(out2["mel_fusion"][0], out2["mel_fusion"][1])


def test_resample():
    pp = AudioPreprocess(CFG, data_trunc="trunc")
    wav = np.random.default_rng(2).standard_normal(48000).astype(np.float32)
    out = pp((wav, 48000))  # 1 s at 48k -> 1 s at 16k = 16000 samples, filled
    assert out["waveform"].shape == (32000,)


def test_synthetic_audio_dataset():
    pp = AudioPreprocess(CFG, data_trunc="trunc")
    ds = SyntheticAudioDataset(pp, _fake_tokenizer, dataset_size=8, batch_size=4, seconds=1.0)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0]["audio"]["waveform"].shape == (4, 32000)
    assert batches[0]["text"].shape == (4, 8)


def _wav_bytes(wav, sr):
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, sr, (wav * 32767).astype(np.int16))
    return buf.getvalue()


def test_wds_audio_pipeline(tmp_path):
    rng = np.random.default_rng(3)
    with tarfile.open(tmp_path / "audio-000000.tar", "w") as tf:
        for i in range(6):
            data = _wav_bytes(rng.standard_normal(16000) * 0.1, 16000)
            info = tarfile.TarInfo(f"{i:05d}.wav")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"sound number {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))

    cfg = WdsConfig(urls=str(tmp_path / "audio-000000.tar"), batch_size=3, shuffle_shards=0,
                    shuffle_samples=0, partial_batches=True)
    pp = AudioPreprocess(CFG, data_trunc="trunc")
    pipe = make_wds_audio_pipeline(cfg, pp, _fake_tokenizer)
    batches = list(pipe)
    assert sum(b["audio"]["waveform"].shape[0] for b in batches) == 6
    assert batches[0]["audio"]["waveform"].shape == (3, 32000)


def test_audio_zero_shot_loop():
    """Full audio ZS loop with a tiny CLAP model and an in-memory dataset."""
    name = "tiny-clap-zs"
    if name not in oct.list_models():
        oct.add_model_config(
            {
                "embed_dim": 32,
                "audio_cfg": {"model_type": "HTSAT", "model_name": "tiny", "sample_rate": 16000,
                              "mel_bins": 64, "window_size": 400, "hop_size": 160,
                              "clip_samples": 32000, "fmin": 50, "fmax": 8000},
                "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
            },
            name=name,
        )
    model = oct.create_model(name)
    pp = AudioPreprocess({**CFG}, data_trunc="trunc")
    rng = np.random.default_rng(4)

    batches = []
    for _ in range(2):
        auds = [pp((rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)) for _ in range(2)]
        batches.append({
            "audio": {k: np.stack([a[k] for a in auds]) for k in auds[0]},
            "label": rng.integers(0, 3, size=2).astype(np.int32),
        })
    classifier = rng.standard_normal((32, 3)).astype(np.float32)
    classifier /= np.linalg.norm(classifier, axis=0)
    metrics = run_audio_zero_shot(model, classifier, batches)
    assert 0.0 <= metrics["top1"] <= 1.0
