"""Training CLI orchestrator: ``python -m open_clip_tpu.train.main <flags>``.

Equivalent of reference ``src/open_clip_train/main.py:97-763``: experiment naming +
logging, model + transforms, mesh + sharding, optimizer + schedule, data, resume,
epoch loop (train -> evaluate -> checkpoint with atomic latest swap), results.jsonl
and params.txt dumps. The DDP/FSDP/GradScaler/compile plumbing collapses into the
mesh + jitted step.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from datetime import datetime
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..factory import create_model_and_transforms, get_tokenizer, _compute_dtype
from ..checkpoint import load_native, save_native
from ..data import get_data
from ..parallel.mesh import create_mesh, fsdp_shardings, place_on_mesh, shard_params
from .params import parse_args
from .optim import OptimizerCfg, create_optimizer
from .scheduler import create_scheduler
from .train_loop import evaluate, train_one_epoch
from .train_step import create_train_state, jit_train_step, make_train_step

logger = logging.getLogger(__name__)


class JsonlWriter:
    def __init__(self, path):
        self.path = path

    def log(self, metrics, step):
        with open(self.path, "a") as fh:
            fh.write(json.dumps({"step": step, **{k: _py(v) for k, v in metrics.items()}}) + "\n")


class TensorBoardWriter:
    def __init__(self, log_dir):
        from torch.utils.tensorboard import SummaryWriter

        self.tb = SummaryWriter(str(log_dir))

    def log(self, metrics, step):
        for k, v in metrics.items():
            try:
                self.tb.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass


class WandbWriter:
    """wandb run writer (reference train.py:28-40 / main.py:584-612). Dep-gated: the
    reference hard-fails the same way when --report-to wandb without the package."""

    def __init__(self, args, log_dir):
        try:
            import wandb
        except ImportError as e:
            raise ImportError("Please install wandb to use --report-to wandb") from e
        self.wandb = wandb
        self.run = wandb.init(
            project=getattr(args, "wandb_project_name", "open-clip"),
            name=args.name,
            notes=getattr(args, "wandb_notes", ""),
            tags=[],
            resume="auto" if args.resume == "latest" else None,
            config=vars(args),
            dir=str(log_dir),
        )

    def log(self, metrics, step):
        self.wandb.log(metrics, step=step)


class TrackioWriter:
    """trackio writer (reference train.py:34-40 gates it the same way)."""

    def __init__(self, args, log_dir):
        try:
            import trackio
        except ImportError as e:
            raise ImportError("Please install trackio to use --report-to trackio") from e
        self.trackio = trackio
        trackio.init(project=getattr(args, "wandb_project_name", "open-clip"), name=args.name,
                     config=vars(args))

    def log(self, metrics, step):
        self.trackio.log(metrics, step=step)


class MultiWriter:
    def __init__(self, writers):
        self.writers = writers

    def log(self, metrics, step):
        for w in self.writers:
            w.log(metrics, step)


def _py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def random_seed(seed: int = 42):
    import random

    random.seed(seed)
    np.random.seed(seed % (2 ** 31))


def _write_ckpt_meta(path, epoch: int, step: int, args) -> None:
    """Sidecar <path>.meta.json so resume recovers the exact epoch even when
    steps/epoch changed between runs (torch checkpoints embed 'epoch' the same way).
    Written NEXT to the checkpoint dir: under async Orbax saves the dir itself does
    not exist until the background rename finalizes."""
    import json as _json

    try:
        with open(str(path) + ".meta.json", "w") as fh:
            _json.dump({"epoch": epoch, "step": step,
                        "samples_seen": step * args.batch_size
                        * max(1, getattr(args, "accum_freq", 1) or 1) * args.world_size}, fh)
    except OSError as e:  # noqa: PERF203 — meta is best-effort
        logger.warning("could not write checkpoint meta: %r", e)


def _resume_epoch(resume_path: str, step: int, steps_per_epoch: int) -> int:
    """Epoch to resume at: sidecar meta.json > epoch_N dir name > step-derived
    (the last assumes constant steps/epoch)."""
    import json as _json
    import re as _re

    real = Path(resume_path).resolve()  # epoch_latest may be a pointer symlink
    for meta in (Path(str(real) + ".meta.json"), real / "meta.json"):
        if meta.exists():
            try:
                return int(_json.loads(meta.read_text())["epoch"])
            except (OSError, KeyError, ValueError):
                pass
    m = _re.match(r"epoch_(\d+)$", real.name)
    if m:
        return int(m.group(1))
    return step // max(steps_per_epoch, 1)


def get_latest_checkpoint(ckpt_dir: Path) -> Optional[str]:
    """Resume-latest discovery (reference get_latest_checkpoint, main.py:77-96):
    the epoch_latest pointer or the highest epoch_N dir, whichever is newer.

    epoch_latest may be stale — e.g. written by an earlier --save-most-recent run
    that a later run without the flag never updated — so it only wins when the
    epoch it points at is >= the highest numbered checkpoint present."""
    import re as _re

    def _epoch_num(p: Path) -> int:
        real = p.resolve()
        m = _re.match(r"epoch_(\d+)$", real.name)
        if m:
            return int(m.group(1))
        import json as _json

        for meta in (Path(str(real) + ".meta.json"), real / "meta.json"):
            try:
                return int(_json.loads(meta.read_text())["epoch"])
            except (OSError, KeyError, ValueError):
                pass
        return -1

    cands = sorted((p for p in ckpt_dir.glob("epoch_*") if p.name.split("_")[1].isdigit()),
                   key=lambda p: int(p.name.split("_")[1]))
    latest = ckpt_dir / "epoch_latest"
    if latest.exists():
        n = _epoch_num(latest)
        if not cands or n < 0 or n >= int(cands[-1].name.split("_")[1]):
            return str(latest)
    return str(cands[-1]) if cands else None


def main(args=None):
    args = parse_args(args)
    if getattr(args, "use_switchback", False):
        from ..models import blocks as _blocks

        _blocks.MLP_LINEAR_IMPL = "switchback"
    logging.basicConfig(
        level=logging.DEBUG if getattr(args, "debug", False) else logging.INFO,
        format="%(asctime)s | %(levelname)s | %(message)s")
    if getattr(args, "cache_dir", None):
        os.environ.setdefault("HF_HOME", args.cache_dir)
        os.environ.setdefault("HUGGINGFACE_HUB_CACHE", args.cache_dir)

    # --- multi-host (before any rank-gated side effects) ---------------------------
    from ..parallel.distributed import init_distributed, is_primary

    args.rank, args.world_size = 0, 1
    rank, world = init_distributed(
        args.dist_coordinator, args.dist_num_processes, args.dist_process_id,
        auto=args.dist_auto,
    )
    args.rank, args.world_size = rank, world
    if world > 1:
        logger.info("multi-host: process %d/%d, %d global devices", rank, world, len(jax.devices()))

    if args.name is None:
        args.name = "-".join(
            [datetime.now().strftime("%Y_%m_%d-%H_%M_%S"), f"model_{args.model.replace('/', '-')}",
             f"lr_{args.lr}", f"b_{args.batch_size}"]
        )
    log_dir = Path(args.logs) / args.name
    ckpt_dir = log_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if is_primary():
        with open(log_dir / "params.txt", "w") as fh:
            for k in sorted(vars(args)):
                fh.write(f"{k}: {getattr(args, k)}\n")

    random_seed(args.seed)

    if getattr(args, "copy_codebase", False) and is_primary():
        # snapshot the package source next to the logs (reference main.py copy_codebase)
        import shutil

        import open_clip_tpu as _pkg

        src = Path(_pkg.__file__).parent
        dst = log_dir / "code" / "open_clip_tpu"
        if not dst.exists():
            shutil.copytree(src, dst, ignore=shutil.ignore_patterns("__pycache__"))
            logger.info("copied codebase to %s", dst)

    # remote sync background process (reference main.py:211-232), primary host only
    if args.remote_sync and is_primary():
        from .file_utils import remote_sync, start_sync_process

        if not remote_sync(str(log_dir), os.path.join(args.remote_sync, args.name), args.remote_sync_protocol):
            raise RuntimeError("initial remote sync failed; check --remote-sync target")
        proc = start_sync_process(
            args.remote_sync_frequency, str(log_dir),
            os.path.join(args.remote_sync, args.name), args.remote_sync_protocol,
        )
        proc.start()

    # --- mesh --------------------------------------------------------------------
    n_dev = len(jax.devices())
    fsdp = args.mesh_fsdp
    tensor = getattr(args, "mesh_tensor", 1)
    data_ax = args.mesh_data if args.mesh_data > 0 else n_dev // (fsdp * tensor)
    mesh = create_mesh(data=data_ax, fsdp=fsdp, tensor=tensor) if n_dev > 1 else None
    logger.info("devices=%d mesh=%s", n_dev, dict(mesh.shape) if mesh else None)

    # --- model -------------------------------------------------------------------
    model, pp_train, pp_val = create_model_and_transforms(
        args.model,
        args.pretrained or None,
        precision=args.precision,
        force_quick_gelu=args.force_quick_gelu,
        force_custom_text=args.force_custom_text,
        force_patch_dropout=args.force_patch_dropout,
        force_image_size=tuple(args.force_image_size) if args.force_image_size else None,
        force_context_length=args.force_context_length,
        seed=args.seed,
        aug_cfg=args.aug_cfg,
        image_mean=tuple(args.image_mean) if args.image_mean else None,
        image_std=tuple(args.image_std) if args.image_std else None,
        image_interpolation=args.image_interpolation,
        image_resize_mode=args.image_resize_mode,
    )
    cfg = model.cfg
    params = model.params

    # tower-only pretrained loads (reference --pretrained-image / --pretrained-audio)
    for flag, tower in (("pretrained_image", "visual"), ("pretrained_audio", "audio")):
        path = getattr(args, flag, None)
        if path:
            from ..checkpoint import read_state_dict
            from ..convert import torch_clip_to_params

            sd = read_state_dict(path)
            if tower == "audio" and getattr(cfg, "audio_cfg", None) is not None:
                from ..models.clap import torch_clap_to_params

                loaded = torch_clap_to_params(sd, cfg)
            else:
                loaded = torch_clip_to_params(sd, cfg)
            if tower not in loaded:
                raise ValueError(f"--{flag.replace('_', '-')}: checkpoint has no {tower} tower")
            params = dict(params)
            params[tower] = loaded[tower]
            logger.info("loaded %s tower from %s", tower, path)

    if mesh is not None:
        if tensor > 1:
            from ..parallel.mesh import tp_shardings

            params = shard_params(params, tp_shardings(params, mesh))
        else:
            params = shard_params(params, fsdp_shardings(params, mesh))

    device_pp = None
    if getattr(args, "device_preprocess", False):
        # BASELINE north-star input path: the host stage emits fixed-shape uint8
        # (decode + geometry only), the RandomResizedCrop + normalize run fused
        # inside the jitted train step, and H2D ships 4x fewer bytes
        if getattr(model, "_preprocess_cfg", None) is None or getattr(cfg, "vision_cfg", None) is None:
            raise ValueError("--device-preprocess supports standard image towers only "
                             "(not audio/GenLIP/NaFlex patch-dict inputs)")
        from ..transform import make_device_train_preprocess, uint8_image_transform_v2

        pp_train = uint8_image_transform_v2(model._preprocess_cfg, is_train=True,
                                            aug_cfg=args.aug_cfg)
        device_pp = make_device_train_preprocess(model._preprocess_cfg, aug_cfg=args.aug_cfg)
        logger.info("device preprocess: host uint8 canvas -> on-device RRC+normalize")

    tokenizer = get_tokenizer(args.model)
    data = get_data(args, (pp_train, pp_val), epoch=0, tokenizer=tokenizer)
    assert "train" in data or "val" in data or "imagenet-val" in data, "no data specified"

    writers = []
    if is_primary():
        writers.append(JsonlWriter(log_dir / "results.jsonl"))
        if "tensorboard" in (args.report_to or ""):
            writers.append(TensorBoardWriter(log_dir / "tensorboard"))
        if "wandb" in (args.report_to or ""):
            writers.append(WandbWriter(args, log_dir))
        if "trackio" in (args.report_to or ""):
            writers.append(TrackioWriter(args, log_dir))
    writer = MultiWriter(writers)

    start_epoch = 0
    state = None
    steps_per_epoch = max(data["train"].num_batches, 1) if "train" in data else 0

    if "train" in data:
        total_steps = steps_per_epoch * args.epochs
        scheduler_kind = "const" if getattr(args, "skip_scheduler", False) else args.lr_scheduler
        schedule = create_scheduler(
            scheduler_kind, args.lr, args.warmup, total_steps,
            **({"cooldown_steps": steps_per_epoch * args.epochs_cooldown,
                "cooldown_power": args.lr_cooldown_power,
                "cooldown_end_lr": args.lr_cooldown_end}
               if args.lr_scheduler == "const-cooldown" and args.epochs_cooldown else {}),
        )
        opt_cfg = OptimizerCfg(
            opt=args.opt, lr=args.lr, wd=args.wd, beta1=args.beta1, beta2=args.beta2,
            eps=args.eps, momentum=args.momentum, layer_decay=args.layer_decay,
            image_layer_decay=getattr(args, "image_layer_decay", None),
            text_layer_decay=getattr(args, "text_layer_decay", None),
            audio_layer_decay=getattr(args, "audio_layer_decay", None),
            grad_clip_norm=args.grad_clip_norm,
            wd_exclude_patterns=tuple(getattr(args, "wd_exclude_patterns", ()) or ()),
        )
        _vc = getattr(cfg, "vision_cfg", None)
        # LLRD layer count only applies to standard ViT towers (GenLIP trunks and
        # ResNets enumerate layer groups differently; reference optim.py:247-335)
        num_layers = _vc.layers if _vc is not None and getattr(_vc, "is_resnet", None) is False else None
        optimizer = create_optimizer(opt_cfg, params, schedule, num_layers=num_layers)
        if args.lock_image or args.lock_text:
            from .optim import apply_trainable_mask, trainable_mask

            mask = trainable_mask(
                params,
                lock_image=args.lock_image,
                lock_image_unlocked_groups=args.lock_image_unlocked_groups,
                lock_text=args.lock_text,
                lock_text_unlocked_layers=args.lock_text_unlocked_layers,
            )
            optimizer = apply_trainable_mask(optimizer, mask)

        teacher = None
        if args.distill_model:
            from ..factory import create_model as _create_model

            tm = _create_model(args.distill_model, args.distill_pretrained or None, seed=args.seed)
            teacher = (tm.cfg, tm.params)
        state = create_train_state(params, optimizer, ema=args.ema is not None)
        if mesh is not None:
            state = place_on_mesh(state, mesh)

        if args.resume:
            resume_path = args.resume
            if resume_path == "latest":
                resume_path = get_latest_checkpoint(ckpt_dir)
            if resume_path:
                logger.info("resuming from %s", resume_path)
                state = load_native(resume_path, like=state)
                if mesh is not None:
                    state = place_on_mesh(state, mesh)
                start_epoch = _resume_epoch(resume_path, int(state.step), steps_per_epoch)
                from ..parallel.distributed import broadcast_scalar_from_primary

                start_epoch = int(broadcast_scalar_from_primary(start_epoch))

        from ..models import blocks

        blocks.REMAT_POLICY = args.remat_policy
        blocks.SCAN_UNROLL = args.scan_unroll

        # loss/family dispatch (reference create_task, factory.py:975: every model
        # family — incl. GenLIP/GenLAP — is trainable from the CLI); the task
        # layer (task.py) shares this dispatch
        from ..task import loss_type_for

        loss_type = loss_type_for(cfg, distill=bool(args.distill_model), siglip=args.siglip)
        step_fn = jit_train_step(
            make_train_step(
                cfg, optimizer,
                loss_type=loss_type,
                mesh=mesh,
                compute_dtype=_compute_dtype(args.precision),
                remat=args.grad_checkpointing,
                local_loss=args.local_loss,
                dist_impl=args.loss_dist_impl,
                accum_steps=args.accum_freq,
                ema_decay=args.ema,
                caption_loss_weight=args.coca_caption_loss_weight,
                clip_loss_weight=args.coca_contrastive_loss_weight,
                teacher=teacher,
                naflex_loss_scale=args.naflex_loss_scale,
                reference_batch_size=args.batch_size,
                freeze_bn_stats=args.lock_image and args.lock_image_freeze_bn_stats,
                device_preprocess=device_pp,
            ),
            mesh,
        )

        if args.profile_dir:
            # jax trace of the first few steps (aux tracing subsystem; SURVEY §5)
            try:
                jax.profiler.start_trace(args.profile_dir)
                _profiling = True
            except Exception as e:  # noqa: BLE001 — backend may not support tracing
                logger.warning("profiler trace unavailable: %r", e)
                _profiling = False
        resume_skip = 0
        if start_epoch and steps_per_epoch:
            # in-epoch offset of the restored step (constant steps/epoch assumption
            # only affects the skip estimate, never correctness of weights)
            resume_skip = max(0, int(state.step) - start_epoch * steps_per_epoch)

        for epoch in range(start_epoch, args.epochs):
            logger.info("=> epoch %d", epoch)
            data["train"].set_epoch(epoch)
            batch_sh = None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from ..parallel.mesh import DATA_AXIS

                batch_sh = NamedSharding(mesh, P(DATA_AXIS))
            state = train_one_epoch(
                state, step_fn, data["train"].dataloader, epoch, args, schedule, writer,
                skip_steps=resume_skip if epoch == start_epoch else 0,
                batch_sharding=batch_sh,
            )
            # raw weights stay on the facade; eval below uses EMA when present
            # (reference get_trainable_module(use_ema=True), base_task.py:159-163)
            model.params = state.params
            if args.profile_dir and epoch == start_epoch and _profiling:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", args.profile_dir)
                _profiling = False

            completed = epoch + 1
            if any(k in data for k in ("val", "imagenet-val", "imagenet-v2", "audio-zeroshot")):
                if completed % args.val_frequency == 0 or completed == args.epochs:
                    if state.ema_params is not None:
                        model.params = state.ema_params
                    try:
                        metrics = evaluate(model, data, completed, args, tokenizer=tokenizer, writer=writer)
                    finally:
                        model.params = state.params
                    logger.info("eval: %s", {k: round(_py(v), 4) for k, v in metrics.items()})

            saved_path = None
            if completed % args.save_frequency == 0 or completed == args.epochs:
                saved_path = ckpt_dir / f"epoch_{completed}"
                # async: device->host copy blocks (donation-safe), serialization
                # finalizes in the background while the next epoch trains
                save_native(str(saved_path), state, block=False)
                _write_ckpt_meta(saved_path, completed, int(state.step), args)
                logger.info("saving checkpoint %s (async)", saved_path)
            if args.save_most_recent:
                import shutil

                latest = ckpt_dir / "epoch_latest"
                if saved_path is not None:
                    # pointer swap — no second serialization of the same state
                    # (reference main.py:678-741 re-writes the full checkpoint; the
                    # atomic-swap guarantee is kept via symlink replace)
                    if latest.is_dir() and not latest.is_symlink():
                        shutil.rmtree(latest)
                    tmp_link = ckpt_dir / ".latest_tmp"
                    if tmp_link.is_symlink() or tmp_link.exists():
                        tmp_link.unlink()
                    os.symlink(saved_path.name, tmp_link)
                    os.replace(tmp_link, latest)
                else:
                    # epoch not covered by save_frequency: serialize directly;
                    # Orbax's tmp-dir + rename keeps the update atomic
                    if latest.is_symlink():
                        latest.unlink()
                    save_native(str(latest), state, block=False)
                    _write_ckpt_meta(latest, completed, int(state.step), args)
            if args.delete_previous_checkpoint:
                # independent of --save-most-recent; the previous saved epoch is
                # save_frequency back, not completed-1 (reference main.py:729-734)
                prev_epoch = completed - args.save_frequency
                prev = ckpt_dir / f"epoch_{prev_epoch}"
                if prev_epoch > 0 and prev.exists():
                    import shutil

                    from ..checkpoint import wait_for_saves

                    wait_for_saves()  # never delete while a save may reference disk
                    shutil.rmtree(prev)
                    meta = Path(str(prev) + ".meta.json")  # sidecar lives NEXT to the dir
                    if meta.exists():
                        meta.unlink()
        from ..checkpoint import wait_for_saves

        wait_for_saves()
        return state

    # eval-only
    metrics = evaluate(model, data, 0, args, tokenizer=tokenizer, writer=writer)
    logger.info("eval: %s", {k: round(_py(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
