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

from ..loss import clip_loss
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
) -> TrainState:
    batch_time = AverageMeter()
    data_time = AverageMeter()
    loss_m = AverageMeter()

    log_every = getattr(args, "log_every_n_steps", 100)
    rng = jax.random.PRNGKey(getattr(args, "seed", 0) + epoch)

    # overlap host decode/tokenize with the device step (the role of the reference's
    # DataLoader workers, data.py:1023-1055)
    from ..data.wds import PrefetchIterator

    prefetch_depth = max(1, getattr(args, "workers", 2))
    loader = PrefetchIterator(dataloader, depth=prefetch_depth)

    end = time.perf_counter()
    pending_metrics = None
    for i, batch in enumerate(loader):
        data_time.update(time.perf_counter() - end)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, _to_device(batch), step_rng)
        pending_metrics = metrics

        if (i % log_every) == 0:
            # host sync only at metric cadence (reference train.py:432-505)
            loss = float(np.asarray(metrics["loss"]))
            loss_m.update(loss, n=_batch_size(batch))
            scale = float(np.asarray(metrics["logit_scale"]))
            lr = float(schedule(int(state.step))) if schedule is not None else float("nan")
            logger.info(
                "epoch %d step %d loss %.4f (avg %.4f) logit_scale %.2f lr %.2e data %.3fs batch %.3fs",
                epoch, i, loss, loss_m.avg, scale, lr, data_time.avg, batch_time.avg,
            )
            if writer is not None:
                writer.log(
                    {"train/loss": loss, "train/logit_scale": scale, "train/lr": lr},
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


def evaluate(
    model,
    data: Dict[str, Any],
    epoch: int,
    args: Any,
    tokenizer=None,
    writer=None,
) -> Dict[str, float]:
    """Validation: paired retrieval + contrastive val loss + zero-shot
    (reference train.py:536-714)."""
    metrics: Dict[str, float] = {}

    from .zero_shot import zero_shot_eval

    metrics.update(zero_shot_eval(model, data, epoch, args, tokenizer=tokenizer))

    if "val" in data:
        all_imf, all_txf = [], []
        losses = []
        n = 0
        for batch in data["val"].dataloader:
            imf = model.encode_image(jnp.asarray(batch["image"]), normalize=True)
            txf = model.encode_text(jnp.asarray(batch["text"]), normalize=True)
            scale = jnp.exp(model.params["logit_scale"].astype(jnp.float32))
            losses.append(float(clip_loss(imf, txf, scale)) * imf.shape[0])
            n += imf.shape[0]
            all_imf.append(np.asarray(imf, dtype=np.float32))
            all_txf.append(np.asarray(txf, dtype=np.float32))
        if n:
            metrics["clip_val_loss"] = float(np.sum(losses) / n)
            metrics.update(
                get_clip_metrics(all_imf, all_txf, float(np.exp(np.asarray(model.params["logit_scale"]))))
            )
            metrics["num_samples"] = n

    metrics["epoch"] = epoch
    if metrics and writer is not None:
        writer.log({f"val/{k}": v for k, v in metrics.items()}, step=epoch)
    return metrics
