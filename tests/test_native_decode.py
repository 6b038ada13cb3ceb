"""Native (C++/libjpeg) decode stage: PIL parity, fallbacks, wds integration.

The shared library is compiled on first use (g++ + libjpeg are part of this
image); every test skips cleanly when the toolchain is absent so the PIL tier
remains a full substitute.
"""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from open_clip_tpu.native import decode_resize_batch, decode_resize_one, jpeg_dims
from open_clip_tpu.transform import PreprocessCfg, _Uint8CanvasTransform

_native_ok = decode_resize_one(_probe := (lambda: (
    (b := io.BytesIO()), Image.new("RGB", (16, 16), (1, 2, 3)).save(b, "JPEG"), b.getvalue()
))()[-1], 32) is not None

pytestmark = pytest.mark.skipif(not _native_ok, reason="native decode unavailable")


def _jpeg(w, h, seed=0, quality=90):
    rng = np.random.default_rng(seed)
    smooth = rng.integers(0, 256, (max(1, h // 8), max(1, w // 8), 3)).astype(np.uint8)
    img = Image.fromarray(smooth).resize((w, h), Image.BICUBIC)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.parametrize("wh", [(640, 480), (480, 640), (300, 300), (120, 90), (2000, 500)])
def test_strict_mode_matches_pil_tier(wh):
    """1/2^k scaling + bicubic must land within PIL fixed-point noise (<=2)."""
    data = _jpeg(*wh, seed=wh[0])
    t = _Uint8CanvasTransform(PreprocessCfg(size=224), canvas=256)
    t.native_canvas = None  # force the PIL reference path
    ref = t(data)
    nat = decode_resize_one(data, 256, fractional=False)
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 2, (d.max(), d.mean())


def test_fractional_mode_close_to_strict():
    data = _jpeg(1024, 768, seed=3)
    a = decode_resize_one(data, 256, fractional=True).astype(int)
    b = decode_resize_one(data, 256, fractional=False).astype(int)
    d = np.abs(a - b)
    assert d.mean() < 3.0 and d.max() < 64, (d.max(), d.mean())


def test_small_image_pads_like_pil():
    """Images smaller than the canvas upscale shortest edge, crop/pad the rest."""
    data = _jpeg(100, 60, seed=4)
    t = _Uint8CanvasTransform(PreprocessCfg(size=224), canvas=256)
    t.native_canvas = None
    ref = t(data)
    nat = decode_resize_one(data, 256, fractional=False)
    assert nat.shape == ref.shape == (256, 256, 3)
    d = np.abs(nat.astype(int) - ref.astype(int))
    assert d.max() <= 2


def test_grayscale_jpeg_decodes_to_rgb():
    img = Image.new("L", (64, 64), 77)
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    out = decode_resize_one(buf.getvalue(), 32)
    assert out is not None and out.shape == (32, 32, 3)
    assert np.ptp(out) <= 2 and abs(int(out.mean()) - 77) <= 2


def test_bad_bytes_return_none_and_batch_status():
    assert decode_resize_one(b"definitely not a jpeg", 64) is None
    good = _jpeg(80, 80)
    out, status = decode_resize_batch([good, b"nope", good], 64, nthreads=2)
    assert status[0] == 0 and status[2] == 0 and status[1] != 0
    assert out.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(out[0], out[2])
    assert not out[1].any()  # failed slot stays zero-filled


def test_jpeg_dims_header_probe():
    assert jpeg_dims(_jpeg(321, 123)) == (321, 123)
    assert jpeg_dims(b"\x00\x01") is None


def test_transform_fast_path_equals_batch_api():
    """_Uint8CanvasTransform routes bytes through the native stage when eligible."""
    data = _jpeg(640, 480, seed=9)
    t = _Uint8CanvasTransform(PreprocessCfg(size=224), canvas=256)
    assert t.native_canvas == 256
    via_transform = t(data)
    direct = decode_resize_one(data, 256)
    np.testing.assert_array_equal(via_transform, direct)


# ---------------------------------------------------------------------------
# wds pipeline integration
# ---------------------------------------------------------------------------

def _fake_tok(texts):
    out = np.zeros((len(texts), 4), np.int32)
    for i, s in enumerate(texts):
        out[i, : min(4, len(s))] = [ord(c) % 97 for c in s[:4]]
    return out


def _make_shard(path, n, png_at=()):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            rng = np.random.default_rng(i)
            arr = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
            buf = io.BytesIO()
            if i in png_at:
                Image.fromarray(arr).save(buf, "PNG")
                name = f"{i:06d}.png"
            else:
                Image.fromarray(arr).save(buf, "JPEG", quality=92)
                name = f"{i:06d}.jpg"
            data = buf.getvalue()
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:06d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def test_wds_native_path_matches_pil_order_and_content(tmp_path):
    from open_clip_tpu.data.wds import WdsConfig, WdsPipeline

    _make_shard(tmp_path / "s-000000.tar", 12)
    urls = str(tmp_path / "s-000000.tar")
    t = _Uint8CanvasTransform(PreprocessCfg(size=32), canvas=48)

    def run(native_threads):
        cfg = WdsConfig(urls=urls, batch_size=4, num_workers=1, seed=7,
                        native_decode_threads=native_threads)
        pipe = WdsPipeline(cfg, t, _fake_tok)
        pipe.set_epoch(0)
        return list(pipe)

    nat = run(2)
    t.native_canvas = None  # force the PIL tier
    pil = run(0)
    assert len(nat) == len(pil) == 3
    for bn, bp in zip(nat, pil):
        np.testing.assert_array_equal(bn["text"], bp["text"])  # same sample order
        d = np.abs(bn["image"].astype(int) - bp["image"].astype(int))
        assert d.mean() < 3.0  # fractional DCT scaling vs PIL draft


def test_wds_native_path_falls_back_for_png(tmp_path):
    from open_clip_tpu.data.wds import WdsConfig, WdsPipeline

    _make_shard(tmp_path / "s-000000.tar", 8, png_at=(2, 5))
    cfg = WdsConfig(urls=str(tmp_path / "s-000000.tar"), batch_size=4, num_workers=1,
                    seed=7, native_decode_threads=2)
    t = _Uint8CanvasTransform(PreprocessCfg(size=32), canvas=48)
    pipe = WdsPipeline(cfg, t, _fake_tok)
    pipe.set_epoch(0)
    batches = list(pipe)
    assert sum(b["image"].shape[0] for b in batches) == 8  # PNG slots survive via PIL
    for b in batches:
        assert b["image"].dtype == np.uint8
        assert (np.ptp(b["image"].reshape(b["image"].shape[0], -1), axis=1) > 0).all()

def test_wds_native_fast_path_recovers_after_failure(tmp_path):
    """A corrupt sample must not permanently disable the zero-copy fast path:
    chunks top up slow-path leftovers to batch_size so `images` drains back to
    empty and later clean batches ship the contiguous buffer again."""
    from open_clip_tpu.data.wds import WdsConfig, WdsPipeline

    _make_shard(tmp_path / "s-000000.tar", 16)
    # overwrite sample 1 with bytes that fail BOTH native and PIL decode
    with tarfile.open(tmp_path / "s-000000.tar", "r") as tf:
        members = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    members["000001.jpg"] = b"\xff\xd8\xff\xe0 not a real jpeg body"
    with tarfile.open(tmp_path / "s-000000.tar", "w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

    cfg = WdsConfig(urls=str(tmp_path / "s-000000.tar"), batch_size=4, num_workers=1,
                    seed=7, native_decode_threads=2)
    t = _Uint8CanvasTransform(PreprocessCfg(size=32), canvas=48)
    pipe = WdsPipeline(cfg, t, _fake_tok)
    slow_collates = []
    orig = pipe._collate
    pipe._collate = lambda imgs, caps: slow_collates.append(len(imgs)) or orig(imgs, caps)
    pipe.set_epoch(0)
    batches = list(pipe)
    # 15 good samples -> 3 full batches (partial dropped); only the batch that
    # absorbed the failure goes through the slow collate, the rest are fast-path
    assert sum(b["image"].shape[0] for b in batches) == 12
    assert len(slow_collates) == 1
