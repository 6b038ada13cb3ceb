"""Dataset assembly: CSV, synthetic, webdataset; get_data dispatcher.

Equivalent of reference ``src/open_clip_train/data.py:949-1192``: dict batches
{'image', 'text'}, a ``DataInfo`` carrier with ``set_epoch``, dataset-type dispatch
('webdataset' | 'csv' | 'synthetic' | 'auto'), and sample/batch bookkeeping for the
train loop. All host-side; device placement happens in the train loop.
"""

from __future__ import annotations

import csv
import logging
import math
import os
import random
import sys
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

from .wds import PrefetchIterator, WdsConfig, WdsPipeline, decode_image_rgb, expand_urls, get_dataset_size

logger = logging.getLogger(__name__)


@dataclass
class DataInfo:
    """Mirrors reference DataInfo (data.py:151-161)."""

    dataloader: Iterable
    num_samples: int = 0
    num_batches: int = 0

    def set_epoch(self, epoch: int) -> None:
        setter = getattr(self.dataloader, "set_epoch", None)
        if setter is not None:
            setter(epoch)


class CsvDataset:
    """CSV/TSV of (image path, caption) — reference get_csv_dataset (data.py:949-1022)."""

    def __init__(
        self,
        input_filename: str,
        preprocess: Callable,
        tokenizer: Callable,
        img_key: str = "filepath",
        caption_key: str = "title",
        sep: str = "\t",
        batch_size: int = 64,
        shuffle: bool = False,
        seed: int = 0,
        partial_batches: bool = False,
        world_size: int = 1,
        rank: int = 0,
    ):
        with open(input_filename, newline="") as fh:
            reader = csv.DictReader(fh, delimiter=sep)
            rows = [(r[img_key], r[caption_key]) for r in reader]
        if not rows:
            raise ValueError(f"no rows in {input_filename}")
        self.rows = rows
        self.world_size = max(1, world_size)
        self.rank = rank
        self.root = os.path.dirname(os.path.abspath(input_filename))
        self.preprocess = preprocess
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.partial_batches = partial_batches
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.rows)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from PIL import Image

        order = list(range(len(self.rows)))
        if self.shuffle:
            # train: rank split AFTER the (seed-shared) shuffle — every rank
            # agrees on the permutation and takes a disjoint stride slice,
            # DistributedSampler semantics (reference data.py:1004-1010)
            random.Random(self.seed + self.epoch).shuffle(order)
            if self.world_size > 1:
                order = order[self.rank :: self.world_size]
        chunks = [order[i : i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        if chunks and len(chunks[-1]) < self.batch_size and not self.partial_batches:
            # torch's val DataLoader keeps the last partial batch
            # (reference get_csv_dataset, drop_last=False); train drops it
            chunks = chunks[:-1]
        if not self.shuffle and self.world_size > 1:
            # eval: split at BATCH granularity (round-robin whole batches) so
            # every batch has exactly the single-process composition — the
            # contrastive val loss is batch-composition-dependent, so this is
            # what makes rank-split eval metrics match a 1-process run exactly.
            # "index" carries each row's global dataset position for feature
            # reassembly (parallel.distributed.host_gather_by_index).
            chunks = chunks[self.rank :: self.world_size]
        for chunk in chunks:
            images: List[np.ndarray] = []
            captions: List[str] = []
            for i in chunk:
                path, caption = self.rows[i]
                if not os.path.isabs(path):
                    path = os.path.join(self.root, path)
                with Image.open(path) as img:
                    images.append(self.preprocess(img.convert("RGB")))
                captions.append(caption)
            batch = {
                "image": np.stack(images),
                "text": np.asarray(self.tokenizer(captions), dtype=np.int32),
            }
            if not self.shuffle and self.world_size > 1:
                batch["index"] = np.asarray(chunk, dtype=np.int64)
            yield batch


class SyntheticDataset:
    """Blank image + fixed caption batches — reference get_synthetic_dataset
    (data.py:1084-1147). Generates each unique batch once and replays it (pure
    throughput/smoke testing)."""

    def __init__(
        self,
        preprocess: Callable,
        tokenizer: Callable,
        image_size=(224, 224),
        caption: str = "a synthetic caption for smoke testing",
        dataset_size: int = 100,
        batch_size: int = 64,
    ):
        from PIL import Image

        img = Image.new("RGB", (image_size[1], image_size[0]))
        arr = preprocess(img)
        self.batch_size = batch_size
        self.num_samples = dataset_size
        n = batch_size
        self._batch = {
            "image": np.repeat(arr[None], n, axis=0),
            "text": np.repeat(np.asarray(tokenizer([caption]), dtype=np.int32), n, axis=0),
        }

    def set_epoch(self, epoch: int) -> None:
        pass

    def __iter__(self):
        for _ in range(max(1, self.num_samples // self.batch_size)):
            yield {k: v.copy() for k, v in self._batch.items()}


def _infer_dataset_type(path: str) -> str:
    """reference data.py dispatch on extension ('auto')."""
    ext = path.split(".")[-1].lower()
    if ext in ("csv", "tsv"):
        return "csv"
    if ext == "tar":
        return "webdataset"
    raise ValueError(f"cannot infer dataset type from {path!r}")


def get_data(
    args: Any,
    preprocess_fns,
    epoch: int = 0,
    tokenizer: Optional[Callable] = None,
) -> Dict[str, DataInfo]:
    """Assemble the data dict (reference get_data, data.py:1148-1192).

    ``args`` uses the reference's flag names: train_data, val_data, dataset_type,
    train_num_samples, batch_size, csv_img_key, csv_caption_key, csv_separator,
    dataset_resampled, train_data_upsampling_factors, workers, seed,
    world_size, rank, imagenet_val.
    """
    get = (lambda k, d=None: getattr(args, k, d)) if not isinstance(args, dict) else args.get
    pp_train, pp_val = preprocess_fns
    data: Dict[str, DataInfo] = {}

    def build(split_path: str, is_train: bool) -> DataInfo:
        dstype = get("dataset_type", "auto")
        pp = pp_train if is_train else pp_val
        batch_size = get("batch_size", 64)
        if is_train:
            # reference CLI contract: --accum-freq accumulates accum_freq batches
            # of --batch-size each (train.py:254-267), so the effective/optimizer
            # batch is batch_size * accum_freq. The loader yields that whole
            # super-batch; the train step splits it back into accum_freq
            # GradCache microbatches of batch_size.
            batch_size *= max(1, get("accum_freq", 1) or 1)
        if dstype == "synthetic-audio":
            from .audio import SyntheticAudioDataset

            ds = SyntheticAudioDataset(
                pp, tokenizer,
                dataset_size=get("train_num_samples", 100) or 100,
                batch_size=batch_size,
            )
            n = ds.num_samples
            return DataInfo(ds, num_samples=n, num_batches=max(1, n // batch_size))
        if dstype == "webdataset-audio":
            from .audio import make_wds_audio_pipeline

            cfg = WdsConfig(
                urls=split_path, batch_size=batch_size,
                caption_key=get("wds_caption_key", "txt"), seed=get("seed", 0),
                world_size=get("world_size", 1), rank=get("rank", 0),
                shuffle_shards=2000 if is_train else 0, partial_batches=not is_train,
            )
            ds = make_wds_audio_pipeline(cfg, pp, tokenizer,
                                         audio_ext=get("audio_ext", None))
            n = get("train_num_samples") or 0
            gbs = batch_size * (get("world_size", 1) or 1)
            return DataInfo(ds, num_samples=n, num_batches=n // gbs if n else 0)
        if dstype == "synthetic-naflex":
            from .naflex import NaFlexDataConfig, SyntheticNaFlexDataset

            ncfg = NaFlexDataConfig(
                seq_lens=tuple(get("naflex_seq_lens", (128, 256))),
                patch_sizes=tuple(get("naflex_patch_sizes", (16,))),
                max_tokens_per_batch=get("naflex_max_tokens", 16384),
                batch_divisor=get("naflex_batch_divisor", 8),
                seed=get("seed", 0),
            )
            nb = max(1, (get("train_num_samples", 100) or 100) // batch_size)
            ds = SyntheticNaFlexDataset(ncfg, tokenizer, num_batches=nb)
            return DataInfo(ds, num_samples=get("train_num_samples", 100) or 100, num_batches=nb)
        if dstype == "webdataset-naflex":
            from .naflex import NaFlexDataConfig, NaFlexWdsPipeline

            wcfg = WdsConfig(
                urls=split_path, batch_size=batch_size, caption_key=get("wds_caption_key", "txt"),
                seed=get("seed", 0), world_size=get("world_size", 1), rank=get("rank", 0),
                shuffle_shards=2000 if is_train else 0,
                shuffle_samples=get("wds_shuffle_buffer", 5000) if is_train else 0,
            )
            inner = WdsPipeline(wcfg, pp, tokenizer)
            ncfg = NaFlexDataConfig(
                seq_lens=tuple(get("naflex_seq_lens", (128, 256, 576, 784, 1024))),
                seq_len_probs=tuple(get("naflex_seq_len_probs")) if get("naflex_seq_len_probs") else None,
                patch_sizes=tuple(get("naflex_patch_sizes", (16,))),
                patch_size_probs=tuple(get("naflex_patch_size_probs")) if get("naflex_patch_size_probs") else None,
                max_tokens_per_batch=get("naflex_max_tokens", 16384),
                batch_divisor=get("naflex_batch_divisor", 8),
                pad_multiple=get("naflex_pad_multiple", None),
                seed=get("seed", 0),
            )
            n = get("train_num_samples") or 0
            nb = max(1, n * ncfg.seq_lens[0] // max(ncfg.max_tokens_per_batch, 1)) if n else 8
            bucketer = None
            if is_train and get("length_bucketing", False):
                from .bucketing import CaptionLength, LengthBucketer

                bucketer = LengthBucketer(
                    [CaptionLength(key="caption", tokenizer=tokenizer)],
                    pool=get("bucket_pool", 2048), chunk=get("bucket_chunk", 128),
                    seed=get("seed", 0),
                    prefetch_pools=get("bucket_prefetch_pools", 0),
                )
            ds = NaFlexWdsPipeline(inner, ncfg, nb, tokenizer, bucketer=bucketer)
            return DataInfo(ds, num_samples=n, num_batches=nb)
        if dstype == "synthetic":
            ds = SyntheticDataset(
                pp, tokenizer,
                dataset_size=get("train_num_samples", 100) or 100,
                batch_size=batch_size,
            )
            n = ds.num_samples
            return DataInfo(ds, num_samples=n, num_batches=max(1, n // batch_size))
        if dstype == "auto":
            dstype = _infer_dataset_type(split_path)
        if dstype == "csv":
            world = get("world_size", 1) or 1
            rank = get("rank", 0) or 0
            ds = CsvDataset(
                split_path, pp, tokenizer,
                img_key=get("csv_img_key", "filepath"),
                caption_key=get("csv_caption_key", "title"),
                sep=get("csv_separator", "\t"),
                batch_size=batch_size,
                shuffle=is_train,
                seed=get("seed", 0),
                partial_batches=not is_train,
                world_size=world,
                rank=rank,
            )
            if is_train:  # sample-stride split, partial batch dropped
                nb = len(range(rank, len(ds), world)) // batch_size
            else:  # whole-batch round-robin split, tail kept
                nb = len(range(rank, math.ceil(len(ds) / batch_size), world))
            return DataInfo(ds, num_samples=len(ds), num_batches=nb)
        if dstype == "webdataset":
            num_samples = get("train_num_samples") if is_train else get("val_num_samples")
            if not num_samples:
                num_samples, _ = get_dataset_size(split_path)
                num_samples = num_samples or 0
            # per-rank steps per epoch count against the GLOBAL batch
            # (batch_size is per-host, reference data.py:773 global_batch_size)
            gbs = batch_size * (get("world_size", 1) or 1)
            num_batches = num_samples // gbs if num_samples else 0
            cfg = WdsConfig(
                urls=split_path,
                weights=get("train_data_upsampling_factors") if is_train else None,
                resampled=bool(get("dataset_resampled", False)) and is_train,
                batch_size=batch_size,
                caption_key=get("wds_caption_key", "txt"),
                seed=get("seed", 0),
                world_size=get("world_size", 1),
                rank=get("rank", 0),
                shuffle_shards=2000 if is_train else 0,
                shuffle_samples=get("wds_shuffle_buffer", 5000) if is_train else 0,
                partial_batches=not is_train,
                num_workers=get("workers", 2) if is_train else 1,
                native_decode_threads=get("native_decode_threads", 0) if is_train else 0,
                # train: equalize every rank's epoch to exactly num_batches steps
                # (reference with_epoch) so collective step counts never diverge
                epoch_batches=num_batches if is_train and num_batches else None,
            )
            ds = WdsPipeline(cfg, pp, tokenizer)
            return DataInfo(ds, num_samples=num_samples, num_batches=num_batches)
        raise ValueError(f"unsupported dataset type {dstype!r}")

    if get("train_data") or str(get("dataset_type", "")).startswith("synthetic"):
        data["train"] = build(get("train_data") or "", is_train=True)
    if get("val_data"):
        data["val"] = build(get("val_data"), is_train=False)
    if get("imagenet_val"):
        data["imagenet-val"] = make_imagenet_val(
            get("imagenet_val"), pp_val, get("batch_size", 64),
            world_size=get("world_size", 1) or 1, rank=get("rank", 0) or 0)
    if get("imagenet_v2"):
        data["imagenet-v2"] = make_imagenet_val(
            get("imagenet_v2"), pp_val, get("batch_size", 64),
            world_size=get("world_size", 1) or 1, rank=get("rank", 0) or 0)
    if get("audio_zeroshot_dataset"):
        # reference data.py:1185-1192 wires the audio-zeroshot split; local wav
        # folders work offline, HF dataset ids need hub access
        from ..train.audio_zero_shot import build_audio_zero_shot_dataset

        loader = build_audio_zero_shot_dataset(
            get("audio_zeroshot_dataset"), pp_val,
            batch_size=get("batch_size", 64),
            split=get("audio_zeroshot_split", "test"),
            audio_key=get("audio_zeroshot_audio_key", "audio"),
            label_key=get("audio_zeroshot_target_key", "target"),
            classname_key=get("audio_zeroshot_class_key", "category"),
            world_size=get("world_size", 1) or 1, rank=get("rank", 0) or 0,
        )
        info = DataInfo(loader, num_samples=getattr(loader, "num_samples", 0))
        info.classnames = loader.classnames
        data["audio-zeroshot"] = info
    return data


def make_imagenet_val(root: str, preprocess: Callable, batch_size: int,
                      world_size: int = 1, rank: int = 0) -> DataInfo:
    """ImageFolder-style ImageNet val loader (reference get_imagenet, data.py:208-268).
    Expects root/<class_dir>/<image files> with class dirs sorted -> label ids.
    Multi-host: each process decodes only its stride slice (``rank::world_size``)
    of the sorted item list; ``zero_shot.run_zero_shot_classifier`` sums the
    per-host top-k counts across processes (reference splits via sampler,
    src/open_clip_train/zero_shot.py:77-109)."""

    class _Folder:
        def __init__(self):
            classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
            self.items: List = []
            for li, c in enumerate(classes):
                cdir = os.path.join(root, c)
                for f in sorted(os.listdir(cdir)):
                    self.items.append((os.path.join(cdir, f), li))
            if world_size > 1:
                self.items = self.items[rank::world_size]

        def set_epoch(self, epoch):
            pass

        def __len__(self):
            return len(self.items)

        def __iter__(self):
            from PIL import Image

            images, labels = [], []
            for path, li in self.items:
                with Image.open(path) as img:
                    images.append(preprocess(img.convert("RGB")))
                labels.append(li)
                if len(images) == batch_size:
                    yield {"image": np.stack(images), "label": np.asarray(labels, dtype=np.int32)}
                    images, labels = [], []
            if images:
                yield {"image": np.stack(images), "label": np.asarray(labels, dtype=np.int32)}

    ds = _Folder()
    return DataInfo(ds, num_samples=len(ds), num_batches=math.ceil(len(ds) / batch_size))
