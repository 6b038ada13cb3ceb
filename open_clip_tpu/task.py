"""Training-task layer: the user-facing bundle of model + loss + step builder.

Mirrors the reference's task package (``src/open_clip/task/base_task.py:37``,
``image_text_task.py:21``, ``clip_task.py:9`` …, exported from
``src/open_clip/__init__.py:17-27`` and built by ``factory.py:975
create_task``) — but jax-native: a task here does not wrap parameters in a
module or own DDP/FSDP/compile state. It holds the functional (cfg, params)
pair plus the loss configuration, and its single real duty is to build the
jitted train step (``make_train_step``) and the train state. Parallelism is a
property of the step's mesh + shardings, EMA is a field of the train state,
and "compile" is ``jax.jit`` — so the reference's wrapper plumbing
(``unwrap_model``, ``_compiled_training_forward``, FSDP policies) has no
jax equivalent and deliberately does not exist.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.clip import CLIPModel, LOGIT_SCALE_MAX, clamp_logit_scale


def loss_type_for(cfg, *, distill: bool = False, siglip: bool = False) -> str:
    """Single source of truth for the family -> loss dispatch (reference
    ``factory.py:990-1040``): used by both :func:`create_task` and the CLI
    orchestrator (train/main.py)."""
    if distill:
        return "distill"
    if hasattr(cfg, "trunk_cfg"):
        return "genlap" if getattr(cfg, "audio_cfg", None) is not None else "genlip"
    if siglip:
        return "siglip"
    if getattr(cfg, "multimodal_cfg", None) is not None:
        return "coca"
    return "clip"


def get_model_from_task(task_or_model):
    """Extract the raw model from a task or return a plain model unchanged
    (reference ``base_task.py:25-34``; there are no DDP/compile wrappers to
    unwrap in jax)."""
    if isinstance(task_or_model, TrainingTask):
        return task_or_model.model
    return task_or_model


class TrainingTask:
    """Modality-agnostic base (reference ``base_task.py:37``). Holds a
    :class:`CLIPModel` facade (or any object with ``.cfg`` / ``.params``) and
    the loss configuration; subclasses pin ``loss_type`` and the batch
    contract (``data_keys`` / ``create_dummy_batch``)."""

    loss_type: str = "clip"

    def __init__(self, model, *, ema: Optional[float] = None, verbose: bool = True,
                 **loss_kwargs):
        self.model = model
        self.ema_decay = ema
        self._naflex_data_config = None
        # reference gather_with_grad: in jax every gather in the loss graph is
        # differentiated by construction; the flag only picks local vs global
        # loss assembly, so map it onto local_loss and drop it.
        loss_kwargs.pop("gather_with_grad", None)
        loss_kwargs.pop("cache_labels", None)  # label caching is free under jit
        loss_kwargs.pop("rank", None)          # mesh owns the topology
        loss_kwargs.pop("world_size", None)
        self.loss_kwargs = loss_kwargs

    # -- functional accessors --------------------------------------------------
    @property
    def cfg(self):
        return self.model.cfg

    @property
    def params(self):
        return self.model.params

    # -- NaFlex data policy (reference base_task.py:80-94) ----------------------
    @property
    def naflex_data_config(self):
        return self._naflex_data_config

    def set_naflex_data_config(self, naflex_data_config) -> "TrainingTask":
        self._naflex_data_config = naflex_data_config
        return self

    # -- the real duty: build state + step --------------------------------------
    def create_state(self, optimizer):
        from .train.train_step import create_train_state

        return create_train_state(self.params, optimizer, ema=self.ema_decay is not None)

    def make_train_step(self, optimizer, *, mesh=None, jit: bool = True,
                        compute_dtype=jnp.bfloat16, remat: bool = False, **overrides):
        """Build the train step for this task's family. Extra kwargs override
        the task's stored loss configuration (reference tasks bake the loss at
        construction, ``clip_task.py:15-40``)."""
        from .train.train_step import jit_train_step, make_train_step

        kw = dict(self.loss_kwargs)
        kw.update(overrides)
        step = make_train_step(
            self.cfg, optimizer, loss_type=self.loss_type, mesh=mesh,
            compute_dtype=compute_dtype, remat=remat, ema_decay=self.ema_decay, **kw,
        )
        return jit_train_step(step, mesh) if jit else step

    # -- checkpoint interface (reference task/checkpoint.py) --------------------
    def state_dict(self, state) -> Dict[str, Any]:
        """Reference-shaped ``{'state_dict': ..., 'state_dict_ema': ...}``
        (``base_task.py:46-48``) from a TrainState."""
        out = {"state_dict": state.params}
        if getattr(state, "ema_params", None) is not None:
            out["state_dict_ema"] = state.ema_params
        return out

    def save_checkpoint(self, path: str, state, block: bool = True) -> None:
        from .checkpoint import save_native

        save_native(path, state, block=block)

    def load_checkpoint(self, path: str, like=None):
        from .checkpoint import load_native

        return load_native(path, like=like)


class ImageTextTask(TrainingTask):
    """Image + text contract shared by CLIP-family tasks (reference
    ``image_text_task.py:21``)."""

    @property
    def data_keys(self) -> Tuple[str, ...]:
        return ("image", "text")

    def create_dummy_batch(self, image_size=None, context_length: Optional[int] = None,
                           batch_size: int = 1, dtype=jnp.float32) -> Dict[str, Any]:
        cfg = self.cfg
        if context_length is None:
            context_length = cfg.text_cfg.context_length
        if self._naflex_data_config is not None:
            ps = self._naflex_data_config.eval_patch_size
            image = _naflex_dummy_image(batch_size, self._naflex_data_config.eval_seq_len,
                                        ps if isinstance(ps, tuple) else (ps, ps), dtype)
        else:
            if image_size is None:
                image_size = cfg.vision_cfg.image_size
            if not isinstance(image_size, (tuple, list)):
                image_size = (image_size, image_size)
            # NHWC — the tpu-native layout (torch reference is NCHW)
            image = jnp.zeros((batch_size, *image_size, 3), dtype)
        return {"image": image,
                "text": jnp.zeros((batch_size, context_length), jnp.int32)}

    def clamp_logit_scale(self, max_val: float = LOGIT_SCALE_MAX) -> None:
        """Functional clamp: replaces the model's params pytree (the train step
        applies the same clamp in-graph every step; this mirrors the reference's
        post-step module mutation, ``image_text_task.py:92-101``)."""
        self.model.params = clamp_logit_scale(self.model.params, max_val=max_val)


def _naflex_dummy_image(batch_size: int, max_seq_len: int,
                        patch_size: Tuple[int, int], dtype) -> Dict[str, jax.Array]:
    """NaFlex dummy image dict (reference ``image_text_task.py:66-89``)."""
    patch_dim = patch_size[0] * patch_size[1] * 3
    width = math.ceil(math.sqrt(max_seq_len))
    idx = np.arange(max_seq_len)
    coord = np.stack((idx // width, idx % width), axis=-1)
    return {
        "patches": jnp.zeros((batch_size, max_seq_len, patch_dim), dtype),
        "patch_coord": jnp.asarray(np.broadcast_to(coord, (batch_size, max_seq_len, 2)),
                                   jnp.int32),
        "patch_valid": jnp.ones((batch_size, max_seq_len), bool),
    }


class CLIPTask(ImageTextTask):
    """InfoNCE contrastive task (reference ``clip_task.py:9``)."""

    loss_type = "clip"


class SigLIPTask(ImageTextTask):
    """Sigmoid pairwise task (reference ``siglip_task.py``)."""

    loss_type = "siglip"


class CoCaTask(ImageTextTask):
    """Contrastive + captioning task (reference ``coca_task.py``)."""

    loss_type = "coca"

    def __init__(self, model, *, caption_loss_weight: float = 2.0,
                 clip_loss_weight: float = 1.0, **kw):
        super().__init__(model, caption_loss_weight=caption_loss_weight,
                         clip_loss_weight=clip_loss_weight, **kw)


class DistillCLIPTask(ImageTextTask):
    """Student-teacher distillation (reference ``distill_task.py``): the
    teacher's (cfg, params) ride into the step as frozen constants."""

    loss_type = "distill"

    def __init__(self, model, dist_model, **kw):
        teacher = (get_model_from_task(dist_model).cfg, get_model_from_task(dist_model).params)
        super().__init__(model, teacher=teacher, **kw)
        self.dist_model = dist_model


class CLAPTask(TrainingTask):
    """Audio-text contrastive task (reference ``clap_task.py``): same InfoNCE
    loss as CLIP over an (audio, text) batch contract."""

    loss_type = "clip"

    @property
    def data_keys(self) -> Tuple[str, ...]:
        return ("audio", "text")

    def create_dummy_batch(self, batch_size: int = 1,
                           context_length: Optional[int] = None) -> Dict[str, Any]:
        cfg = self.cfg
        if context_length is None:
            context_length = cfg.text_cfg.context_length
        n = int(getattr(cfg.audio_cfg, "audio_length", 480000))
        return {"audio": {"waveform": jnp.zeros((batch_size, n), jnp.float32)},
                "text": jnp.zeros((batch_size, context_length), jnp.int32)}

    def clamp_logit_scale(self, max_val: float = LOGIT_SCALE_MAX) -> None:
        self.model.params = clamp_logit_scale(self.model.params, max_val=max_val)


class GenLipTask(ImageTextTask):
    """Generative prefix-LM task (reference ``genlip_task.py``): the model
    computes its own fused AR loss, so the task carries no loss weights."""

    loss_type = "genlip"


class GenLapTask(TrainingTask):
    """Audio captioning task (reference ``genlap_task.py``)."""

    loss_type = "genlap"

    @property
    def data_keys(self) -> Tuple[str, ...]:
        return ("audio", "text")


def create_task(args, model, dist_model=None, naflex_data_config=None) -> TrainingTask:
    """Build the task for a parsed-args namespace (reference ``factory.py:975``).

    ``args`` needs the same fields the reference reads: ``model``, ``distill``
    (or ``distill_model``), ``siglip``, ``local_loss``, ``coca_*`` weights.
    """
    if not isinstance(model, CLIPModel) and not isinstance(model, TrainingTask) \
            and not hasattr(model, "cfg"):
        raise TypeError("create_task expects a CLIPModel facade (factory.create_model)")
    cfg = model.cfg
    distill = bool(getattr(args, "distill", None) or getattr(args, "distill_model", None))
    lt = loss_type_for(cfg, distill=distill, siglip=bool(getattr(args, "siglip", False)))
    shared = dict(local_loss=bool(getattr(args, "local_loss", True)),
                  ema=getattr(args, "ema", None))
    if getattr(cfg, "audio_cfg", None) is not None and lt == "clip":
        task: TrainingTask = CLAPTask(model, **shared)
    elif lt == "distill":
        if dist_model is None:
            raise ValueError("distillation requires dist_model")
        task = DistillCLIPTask(model, dist_model, **shared)
    elif lt == "coca":
        task = CoCaTask(
            model,
            caption_loss_weight=getattr(args, "coca_caption_loss_weight", 2.0),
            clip_loss_weight=getattr(args, "coca_contrastive_loss_weight", 1.0),
            **shared,
        )
    elif lt == "siglip":
        task = SigLIPTask(model, **shared)
    elif lt == "genlip":
        task = GenLipTask(model, **shared)
    elif lt == "genlap":
        task = GenLapTask(model, **shared)
    else:
        task = CLIPTask(model, **shared)
    if naflex_data_config is not None:
        task.set_naflex_data_config(naflex_data_config)
    return task
