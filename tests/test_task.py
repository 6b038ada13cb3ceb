"""Task layer (open_clip_tpu/task.py) vs the reference's task package
(reference src/open_clip/task/, factory.py:975 create_task): dispatch per
family, the batch contract helpers, and an executed CLIPTask train step."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models.clip import CLIPModel, init_clip
from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
from open_clip_tpu.train.scheduler import const_lr

pytestmark = pytest.mark.quick

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16,
                   "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2,
                 "layers": 2},
}


@pytest.fixture(scope="module")
def tiny_model():
    name = "tiny-task-vit"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY), name=name)
    cfg = parse_model_cfg(name)
    return CLIPModel(cfg, init_clip(jax.random.PRNGKey(0), cfg))


def _args(**kw):
    base = dict(model="tiny-task-vit", distill=False, distill_model=None, siglip=False,
                local_loss=True, ema=None, coca_caption_loss_weight=2.0,
                coca_contrastive_loss_weight=1.0)
    base.update(kw)
    return argparse.Namespace(**base)


def test_create_task_dispatch(tiny_model):
    assert isinstance(oct.create_task(_args(), tiny_model), oct.CLIPTask)
    assert isinstance(oct.create_task(_args(siglip=True), tiny_model), oct.SigLIPTask)
    t = oct.create_task(_args(distill=True), tiny_model, dist_model=tiny_model)
    assert isinstance(t, oct.DistillCLIPTask)
    with pytest.raises(ValueError):
        oct.create_task(_args(distill=True), tiny_model)


def test_create_task_coca_and_audio_families():
    coca_cfg = parse_model_cfg("coca_ViT-B-32")
    assert oct.task.loss_type_for(coca_cfg) == "coca"
    clap_cfg = parse_model_cfg("CLAP-HTSAT-tiny")
    assert oct.task.loss_type_for(clap_cfg) == "clip"  # audio contrastive
    # dispatch picks the audio batch contract for CLAP configs
    class _M:  # noqa: N801 — minimal cfg/params carrier
        cfg = clap_cfg
        params = None
    t = oct.create_task(_args(model="CLAP-HTSAT-tiny"), _M())
    assert isinstance(t, oct.CLAPTask)
    assert t.data_keys == ("audio", "text")


def test_get_model_from_task(tiny_model):
    task = oct.CLIPTask(tiny_model)
    assert oct.get_model_from_task(task) is tiny_model
    assert oct.get_model_from_task(tiny_model) is tiny_model


def test_dummy_batch_contract(tiny_model):
    task = oct.CLIPTask(tiny_model)
    assert task.data_keys == ("image", "text")
    batch = task.create_dummy_batch(batch_size=3)
    assert batch["image"].shape == (3, 32, 32, 3)
    assert batch["text"].shape == (3, 12)
    # NaFlex policy flips the dummy image to the patch-dict form
    class _NF:  # minimal NaFlexDataConfig stand-in
        eval_seq_len = 49
        eval_patch_size = (16, 16)
    task.set_naflex_data_config(_NF())
    nb = task.create_dummy_batch(batch_size=2)
    assert nb["image"]["patches"].shape == (2, 49, 16 * 16 * 3)
    assert nb["image"]["patch_valid"].shape == (2, 49)


def test_clip_task_trains(tiny_model):
    """The task layer's step builder is the real train path: loss decreases."""
    task = oct.create_task(_args(), tiny_model)
    opt = create_optimizer(OptimizerCfg(lr=1e-3, wd=0.01, grad_clip_norm=1.0),
                           task.params, const_lr(1e-3, 0))
    state = task.create_state(opt)
    step = task.make_train_step(opt, compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = {"image": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
             "text": rng.integers(1, 63, size=(16, 12)).astype(np.int32)}
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # reference-shaped state_dict (base_task.py:46-48)
    sd = task.state_dict(state)
    assert "state_dict" in sd and "state_dict_ema" not in sd

    # clamp_logit_scale mutates the facade's params functionally
    task.model.params = dict(task.model.params, logit_scale=jnp.asarray(9.9))
    task.clamp_logit_scale()
    assert float(task.params["logit_scale"]) <= float(np.log(100)) + 1e-6


def test_task_exports_match_reference_names():
    for n in ("TrainingTask", "ImageTextTask", "CLIPTask", "SigLIPTask", "CoCaTask",
              "GenLipTask", "GenLapTask", "DistillCLIPTask", "create_task",
              "get_model_from_task"):
        assert hasattr(oct, n), n
