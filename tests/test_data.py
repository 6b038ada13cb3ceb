"""Data-pipeline tests with on-the-fly tar fixtures (reference tests/test_wds.py style)."""

import io
import json
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from open_clip_tpu.data.wds import (
    WdsConfig,
    WdsPipeline,
    expand_urls,
    extract_caption,
    iterate_tar_samples,
)
from open_clip_tpu.data.datasets import CsvDataset, SyntheticDataset, get_data
from open_clip_tpu.transform import PreprocessCfg, image_transform_v2


def _fake_tokenizer(texts):
    import zlib

    out = np.zeros((len(texts), 8), dtype=np.int32)
    for i, t in enumerate(texts):
        # crc32, not hash(): str hash is salted per process and the multiworker
        # pipeline tokenizes inside forkserver children
        h = zlib.crc32(t.encode()) * 2654435761 % 2**63
        ids = [(h >> (7 * j)) % 127 + 1 for j in range(8)]
        out[i, :] = ids
    return out


def _make_shard(path, n, start=0, img_size=(24, 20)):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            img = Image.new("RGB", img_size, (i % 255, 30, 60))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:06d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


@pytest.fixture()
def shards(tmp_path):
    _make_shard(tmp_path / "shard-000000.tar", 10, 0)
    _make_shard(tmp_path / "shard-000001.tar", 5, 100)
    return tmp_path


def test_expand_urls_braces():
    urls, w = expand_urls("/data/shard-{000000..000003}.tar")
    assert len(urls) == 4 and urls[0].endswith("shard-000000.tar") and w is None


def test_expand_urls_multisource_weights():
    # per-shard weight is the source weight verbatim (reference data.py:174-179):
    # source mass = weight x shard count, so dataset size still matters
    urls, w = expand_urls("/a/s-{00..01}.tar::/b/t-{00..03}.tar", weights="1::2")
    assert len(urls) == 6
    assert w == pytest.approx([1.0, 1.0, 2.0, 2.0, 2.0, 2.0])


def test_iterate_tar_samples(shards):
    samples = list(iterate_tar_samples(str(shards / "shard-000000.tar")))
    assert len(samples) == 10
    assert {"__key__", "jpg", "txt"} <= set(samples[0])
    assert samples[0]["txt"] == b"caption number 0"


def test_iterate_corrupt_tar(tmp_path):
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"not a tar file at all")
    assert list(iterate_tar_samples(str(bad))) == []


def test_extract_caption_json():
    sample = {"json": json.dumps({"cap_a": "hello", "cap_b": "world"}).encode()}
    got = extract_caption(sample, "json:cap_a=1")
    assert got == "hello"
    got = extract_caption(sample, "json:cap_a=1::cap_b=1")
    assert got in ("hello", "world")


def test_wds_pipeline_epoch_composition(shards):
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    cfg = WdsConfig(
        urls=str(shards / "shard-{000000..000001}.tar"),
        batch_size=4, shuffle_shards=0, shuffle_samples=0, partial_batches=True,
    )
    pipe = WdsPipeline(cfg, pp, _fake_tokenizer)
    batches = list(pipe)
    n = sum(b["image"].shape[0] for b in batches)
    assert n == 15
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    assert batches[0]["text"].shape == (4, 8)


def test_wds_deterministic_per_epoch(shards):
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    cfg = WdsConfig(urls=str(shards / "shard-{000000..000001}.tar"), batch_size=5,
                    shuffle_samples=4, seed=1, partial_batches=True)
    pipe = WdsPipeline(cfg, pp, _fake_tokenizer)
    pipe.set_epoch(0)
    a = [b["text"] for b in pipe]
    pipe.set_epoch(0)
    b = [b["text"] for b in pipe]
    pipe.set_epoch(1)
    c = [b["text"] for b in pipe]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    assert not np.array_equal(np.concatenate(a), np.concatenate(c))


def test_wds_multiworker_covers_all_samples(shards):
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    base = dict(urls=str(shards / "shard-{000000..000001}.tar"), batch_size=3,
                shuffle_shards=0, shuffle_samples=0, partial_batches=True, seed=3)
    single = WdsPipeline(WdsConfig(**base, num_workers=1), pp, _fake_tokenizer)
    multi = WdsPipeline(WdsConfig(**base, num_workers=2), pp, _fake_tokenizer)

    def keyset(pipe):
        return sorted(tuple(row) for b in pipe for row in b["text"])

    a, b = keyset(single), keyset(multi)
    assert a == b  # same sample multiset, worker split is a partition
    # deterministic across re-iterations at the same epoch
    assert keyset(multi) == b


def test_wds_multiworker_propagates_worker_error(shards, tmp_path):
    def bad_preprocess(img):
        raise ValueError("boom")

    cfg = WdsConfig(urls=str(shards / "shard-000000.tar"), batch_size=2,
                    num_workers=2, max_consecutive_failures=2)
    pipe = WdsPipeline(cfg, bad_preprocess, _fake_tokenizer)
    with pytest.raises(RuntimeError):
        list(pipe)


def test_csv_dataset(tmp_path):
    img_path = tmp_path / "img0.jpg"
    Image.new("RGB", (20, 20), "blue").save(img_path)
    csv_path = tmp_path / "data.csv"
    csv_path.write_text("filepath\ttitle\nimg0.jpg\ta blue square\nimg0.jpg\tanother one\n")
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    ds = CsvDataset(str(csv_path), pp, _fake_tokenizer, batch_size=2)
    batches = list(ds)
    assert len(batches) == 1
    assert batches[0]["image"].shape == (2, 16, 16, 3)


def test_synthetic_dataset():
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    ds = SyntheticDataset(pp, _fake_tokenizer, image_size=(16, 16), dataset_size=8, batch_size=4)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 16, 16, 3)


def test_get_data_synthetic():
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    data = get_data(
        {"dataset_type": "synthetic", "train_num_samples": 8, "batch_size": 4},
        (pp, pp), tokenizer=_fake_tokenizer,
    )
    assert "train" in data
    assert data["train"].num_batches == 2


def test_wds_epoch_batches_caps_and_pads(shards):
    """epoch_batches equalizes every epoch to exactly N batches (reference
    with_epoch): a long stream is cut, a short one continues into a
    re-shuffled pass — so all ranks always run the same step count."""
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    base = dict(urls=str(shards / "shard-{000000..000001}.tar"),
                batch_size=4, shuffle_shards=0, shuffle_samples=0)
    # raw content = 15 samples -> 3 full batches; cap to 2
    capped = WdsPipeline(WdsConfig(**base, epoch_batches=2), pp, _fake_tokenizer)
    assert len(list(capped)) == 2
    # pad to 5: cycles into a second pass
    padded = WdsPipeline(WdsConfig(**base, epoch_batches=5), pp, _fake_tokenizer)
    batches = list(padded)
    assert len(batches) == 5
    assert all(b["image"].shape[0] == 4 for b in batches)
    # deterministic for a fixed (seed, epoch)
    again = list(WdsPipeline(WdsConfig(**base, epoch_batches=5), pp, _fake_tokenizer))
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(a["text"], b["text"])


def test_csv_val_keeps_partial_tail(tmp_path):
    """Eval CSVs must not drop the tail remainder (reference val DataLoader has
    drop_last=False); a val set smaller than batch_size must still yield."""
    img_path = tmp_path / "img0.jpg"
    Image.new("RGB", (20, 20), "red").save(img_path)
    csv_path = tmp_path / "v.csv"
    csv_path.write_text("filepath\ttitle\n" + "img0.jpg\tcap\n" * 3)
    pp = image_transform_v2(PreprocessCfg(size=16), is_train=False)
    ds = CsvDataset(str(csv_path), pp, _fake_tokenizer, batch_size=2, partial_batches=True)
    batches = list(ds)
    assert [b["image"].shape[0] for b in batches] == [2, 1]
    tiny = CsvDataset(str(csv_path), pp, _fake_tokenizer, batch_size=64, partial_batches=True)
    assert [b["image"].shape[0] for b in list(tiny)] == [3]
