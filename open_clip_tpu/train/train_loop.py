"""Epoch loop + evaluation (reference ``src/open_clip_train/train.py``).

``train_one_epoch`` drives the jitted train step over the host data pipeline with
device prefetch; ``evaluate`` accumulates features on host for paired-retrieval
metrics and the validation contrastive loss (train.py:536-714).
"""

from __future__ import annotations

import logging
import math
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import get_clip_metrics
from .train_step import TrainState, eval_forward

logger = logging.getLogger(__name__)


class AverageMeter:
    """Running average (reference train.py:99-116)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def train_one_epoch(
    state: TrainState,
    step_fn: Callable,
    dataloader: Iterable,
    epoch: int,
    args: Any,
    schedule: Optional[Callable] = None,
    writer=None,
    skip_steps: int = 0,
    batch_sharding=None,
) -> TrainState:
    batch_time = AverageMeter()
    data_time = AverageMeter()
    loss_m = AverageMeter()

    log_every = getattr(args, "log_every_n_steps", 100)
    metric_every = getattr(args, "log_metric_every_n_steps", None) or log_every
    ema_samples = max(1, getattr(args, "train_loss_ema_samples", 50000) or 50000)
    loss_ema = None
    rng = jax.random.PRNGKey(getattr(args, "seed", 0) + epoch)

    # overlap host decode/tokenize AND the H2D copy with the device step: the
    # prefetch thread device_puts each batch (onto the mesh sharding when given),
    # so the main thread only dispatches compiled steps (the role of the
    # reference's DataLoader workers + pin_memory/non_blocking, data.py:1023-1055)
    from ..data.wds import device_prefetch

    # depth bounds batches pinned in device HBM, so keep it small and independent
    # of the host decode-worker count (workers=8 at batch-1024 fp32 would pin ~5 GB)
    prefetch_depth = min(3, max(1, getattr(args, "workers", 2)))
    loader = device_prefetch(dataloader, depth=prefetch_depth, sharding=batch_sharding)

    end = time.perf_counter()
    pending_metrics = None
    for i, batch in enumerate(loader):
        if i < skip_steps:
            # mid-epoch resume: fast-forward the deterministic (seed, epoch)-keyed
            # sample stream past already-trained batches instead of replaying them
            # (the reference replays from the epoch start; data.py has no position
            # restore). Decode cost only, no device steps. The per-step RNG is still
            # split so dropout/augmentation randomness after resume matches an
            # uninterrupted run at the same step index.
            rng, _ = jax.random.split(rng)
            end = time.perf_counter()
            continue
        data_time.update(time.perf_counter() - end)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)
        pending_metrics = metrics

        if (i % metric_every) == 0 or (i % log_every) == 0:
            # host sync only at metric cadence (reference train.py:432-505)
            bs = _batch_size(batch)
            loss = float(np.asarray(metrics["loss"]))
            loss_m.update(loss, n=bs)
            # sample-horizon EMA for the console (reference --train-loss-ema-samples)
            alpha = min(1.0, bs * metric_every / ema_samples)
            loss_ema = loss if loss_ema is None else loss_ema * (1 - alpha) + loss * alpha
            scale = float(np.asarray(metrics["logit_scale"]))
            lr = float(schedule(int(state.step))) if schedule is not None else float("nan")
            if (i % log_every) == 0:
                logger.info(
                    "epoch %d step %d loss %.4f (ema %.4f) logit_scale %.2f lr %.2e data %.3fs batch %.3fs",
                    epoch, i, loss, loss_ema, scale, lr, data_time.avg, batch_time.avg,
                )
            if writer is not None:
                writer.log(
                    {"train/loss": loss, "train/loss_ema": loss_ema,
                     "train/logit_scale": scale, "train/lr": lr},
                    step=int(state.step),
                )
        batch_time.update(time.perf_counter() - end)
        end = time.perf_counter()

    if pending_metrics is not None:
        np.asarray(pending_metrics["loss"])  # final sync
    return state


def _to_device(batch):
    return jax.tree.map(jnp.asarray, batch)


def _batch_size(batch) -> int:
    return jax.tree_util.tree_leaves(batch)[0].shape[0]


def make_eval_step(cfg, compute_dtype=jnp.bfloat16):
    """One jitted validation step: normalized paired features + in-batch contrastive
    loss + generative (caption) loss where the model has a decoder. Replaces the
    reference's per-batch autocast forward (train.py:605-640) with a single compiled
    function — no per-batch Python encode calls or host syncs."""
    from ..models.clip import clip_forward
    from ..loss import caption_cross_entropy

    def step(params, batch):
        primary_in = batch.get("audio", batch.get("image"))
        out = clip_forward(
            params, cfg, primary_in, batch.get("text"),
            train=False, compute_dtype=compute_dtype,
        )
        primary = out.get("image_features", out.get("audio_features"))
        txf = out["text_features"]
        scale = out["logit_scale"]
        res = {"primary_features": primary, "text_features": txf, "logit_scale": scale}
        if primary is not None and txf is not None:
            # in-batch CE both directions (reference train.py:620-630)
            logits = scale * primary.astype(jnp.float32) @ txf.astype(jnp.float32).T
            labels = jnp.arange(primary.shape[0])
            li = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], 1).mean()
            lt = -jnp.take_along_axis(jax.nn.log_softmax(logits.T, axis=-1), labels[:, None], 1).mean()
            res["loss"] = 0.5 * (li + lt)
        if "logits" in out and "text" in batch:
            # CoCa generative val loss (reference maybe_compute_generative_loss, train.py:631)
            pad_id = cfg.text_cfg.pad_id if cfg.text_cfg else 0
            res["gen_loss"] = caption_cross_entropy(
                out["logits"][:, :-1], batch["text"][:, 1:], pad_id=pad_id)
        return res

    return jax.jit(step)


def evaluate(
    model,
    data: Dict[str, Any],
    epoch: int,
    args: Any,
    tokenizer=None,
    writer=None,
) -> Dict[str, float]:
    """Validation: paired retrieval + contrastive val loss + generative loss +
    zero-shot (reference train.py:536-714), via one jitted eval step."""
    metrics: Dict[str, float] = {}

    if hasattr(model.cfg, "trunk_cfg"):
        # GenLIP/GenLAP: no contrastive head — validation is the fused AR caption
        # loss (reference genlip_task.py eval_forward)
        if "val" in data:
            from ..models import genlap as _genlap, genlip as _genlip

            is_audio = getattr(model.cfg, "audio_cfg", None) is not None
            fwd = _genlap.genlap_forward if is_audio else _genlip.genlip_forward
            mod_key = "audio" if is_audio else "image"

            @jax.jit
            def gen_step(params, batch):
                return fwd(params, model.cfg, batch[mod_key], batch["text"],
                           compute_loss=True, compute_dtype=model.compute_dtype)["loss"]

            loss_sum, n = 0.0, 0
            for batch in data["val"].dataloader:
                bs = _batch_size(batch)
                loss_sum += float(np.asarray(gen_step(model.params, _to_device(batch)))) * bs
                n += bs
            from ..parallel.distributed import host_psum

            loss_sum, n = host_psum([loss_sum, n])
            if n:
                metrics["val_generative_loss"] = loss_sum / n
                metrics["num_samples"] = int(n)
        metrics["epoch"] = epoch
        if metrics and writer is not None:
            writer.log({f"val/{k}": v for k, v in metrics.items()}, step=epoch)
        return metrics

    from .zero_shot import zero_shot_eval

    metrics.update(zero_shot_eval(model, data, epoch, args, tokenizer=tokenizer))

    if "audio-zeroshot" in data:
        from .audio_zero_shot import audio_zero_shot_eval, parse_templates

        metrics.update(audio_zero_shot_eval(
            model, data, epoch, args, tokenizer=tokenizer,
            templates=parse_templates(getattr(args, "audio_zeroshot_template", None))))

    if "val" in data:
        eval_step = make_eval_step(model.cfg, compute_dtype=getattr(model, "compute_dtype", jnp.bfloat16))
        all_imf, all_txf, all_idx = [], [], []
        loss_sum = gen_sum = 0.0
        n = gen_n = 0
        primary_key = "image"
        # bounded device-result pipeline: keep a couple of batches in flight so the
        # chip stays busy, but transfer as we go — holding every batch's features in
        # HBM until the end would scale val-set HBM use with the dataset size
        pending = []
        PIPELINE_DEPTH = 2

        def _drain(res, bs, idx):
            nonlocal loss_sum, gen_sum, n, gen_n
            if res.get("primary_features") is not None:
                all_imf.append(np.asarray(res["primary_features"], dtype=np.float32))
                all_txf.append(np.asarray(res["text_features"], dtype=np.float32))
                if idx is not None:
                    all_idx.append(idx)
                loss_sum += float(np.asarray(res["loss"])) * bs
            if "gen_loss" in res:
                gen_sum += float(np.asarray(res["gen_loss"])) * bs
                gen_n += bs
            n += bs

        for batch in data["val"].dataloader:
            if "audio" in batch:
                primary_key = "audio"
            # global row ids from rank-split loaders stay host-side for feature
            # reassembly; everything else goes to the chip
            idx = batch.pop("index", None)
            res = eval_step(model.params, _to_device(batch))
            pending.append((res, _batch_size(batch), idx))
            if len(pending) > PIPELINE_DEPTH:
                _drain(*pending.pop(0))
        for res, bs, idx in pending:
            _drain(res, bs, idx)
        # multi-host: the val loader is rank-split (stride), so reduce the scalar
        # sums and reassemble the full paired feature matrices in global order
        # before retrieval ranking (reference instead replicates eval on every
        # rank, zero_shot.py:77-109 — this does 1/W the per-host work)
        from ..parallel.distributed import (
            host_gather_by_index, host_gather_stride, host_psum)

        loss_sum, n, gen_sum, gen_n = host_psum([loss_sum, n, gen_sum, gen_n])
        if n and all_imf:
            if all_idx:
                gidx = np.concatenate(all_idx)
                imf = host_gather_by_index(np.concatenate(all_imf, axis=0), gidx)
                txf = host_gather_by_index(np.concatenate(all_txf, axis=0), gidx)
            else:
                imf = host_gather_stride(np.concatenate(all_imf, axis=0))
                txf = host_gather_stride(np.concatenate(all_txf, axis=0))
            loss_key = "clip_val_loss" if primary_key == "image" else f"{primary_key}_val_loss"
            metrics[loss_key] = loss_sum / n
            metrics.update(
                get_clip_metrics([imf], [txf], float(np.exp(np.asarray(model.params["logit_scale"]))),
                                 chunk_size=getattr(args, "val_retrieval_chunk_size", None) or 4096)
            )
            metrics["num_samples"] = int(n)
        if gen_n:
            metrics["val_generative_loss"] = gen_sum / gen_n

    metrics["epoch"] = epoch
    if metrics and writer is not None:
        writer.log({f"val/{k}": v for k, v in metrics.items()}, step=epoch)
    return metrics
