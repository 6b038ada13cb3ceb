"""Host data-pipeline throughput bench (data-only; no device work).

Builds a synthetic wds shard set of real JPEGs, then measures samples/sec through
WdsPipeline decode+preprocess at several worker counts — the host must sustain more
than the device step rate (e.g. 1300+ img/s for the ViT-B-32 bench step) to avoid
starving the chip. On this 1-core box the absolute numbers are small; the point of the
table is the worker scaling and a recorded baseline per machine.

Usage: python scripts/bench_data.py [n_shards] [imgs_per_shard]
"""

import io
import sys

sys.path.insert(0, "/root/repo")
import tarfile
import tempfile
import time
from pathlib import Path


def make_shards(root: Path, n_shards=4, per_shard=256, size=256):
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for s in range(n_shards):
        path = root / f"shard-{s:05d}.tar"
        with tarfile.open(path, "w") as tar:
            for i in range(per_shard):
                img = Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=80)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{s:05d}{i:04d}.jpg")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
                txt = f"caption {s} {i}".encode()
                info = tarfile.TarInfo(f"{s:05d}{i:04d}.txt")
                info.size = len(txt)
                tar.addfile(info, io.BytesIO(txt))
        paths.append(str(path))
    return paths


def main():
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per_shard = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import numpy as np

    from open_clip_tpu.data.wds import WdsConfig, WdsPipeline
    from open_clip_tpu.transform import image_transform

    pp = image_transform(224, is_train=True)

    def tok(texts):
        return np.zeros((len(texts), 77), np.int32)

    with tempfile.TemporaryDirectory() as td:
        shards = make_shards(Path(td), n_shards, per_shard)
        urls = "::".join(shards)
        total = n_shards * per_shard
        for workers in (1, 2, 4):
            cfg = WdsConfig(urls=urls, batch_size=64, num_workers=workers, seed=0)
            pipe = WdsPipeline(cfg, pp, tok)
            n = 0
            t0 = time.perf_counter()
            for batch in pipe:
                n += batch["image"].shape[0]
            dt = time.perf_counter() - t0
            print(f"workers={workers}: {n / dt:8.1f} samples/s  ({n}/{total} in {dt:.1f}s)")


if __name__ == "__main__":
    main()
