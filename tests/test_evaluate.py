"""Jitted evaluate(): retrieval metrics + contrastive val loss + generative val loss.

Covers the reference evaluate semantics (reference src/open_clip_train/train.py:536-714):
clip_val_loss is the mean in-batch bidirectional CE, CoCa models add
val_generative_loss, retrieval metrics come from the accumulated features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models.clip import CLIPModel, init_clip
from open_clip_tpu.train.train_loop import evaluate, make_eval_step

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
}

TINY_COCA = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
                   "attentional_pool": True, "attn_pooler_queries": 13, "attn_pooler_heads": 2},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
                 "embed_cls": True},
    "multimodal_cfg": {"context_length": 11, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
    "custom_text": True,
}


def _register(name, cfg_dict):
    if name not in oct.list_models():
        oct.add_model_config(dict(cfg_dict), name=name)
    return parse_model_cfg(name)


class _Loader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


class _Data:
    def __init__(self, dataloader):
        self.dataloader = dataloader


class _Args:
    imagenet_val = None
    imagenet_v2 = None
    zeroshot_frequency = 0
    epochs = 1
    precision = "fp32"
    batch_size = 8
    distributed = False


def _val_batches(rng, n_batches=2, bs=8, ctx=12):
    out = []
    for _ in range(n_batches):
        out.append({
            "image": rng.standard_normal((bs, 32, 32, 3)).astype(np.float32),
            "text": rng.integers(1, 63, size=(bs, ctx)).astype(np.int32),
        })
    return out


def test_evaluate_clip(rng):
    cfg = _register("tiny-eval-vit", TINY)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    model = CLIPModel(cfg, params, compute_dtype=jnp.float32)
    data = {"val": _Data(_Loader(_val_batches(rng)))}
    metrics = evaluate(model, data, epoch=0, args=_Args())
    assert "clip_val_loss" in metrics and np.isfinite(metrics["clip_val_loss"])
    assert metrics["num_samples"] == 16
    assert "image_to_text_R@1" in metrics
    assert "val_generative_loss" not in metrics


def test_evaluate_clip_loss_matches_manual(rng):
    """clip_val_loss equals the hand-computed in-batch bidirectional CE."""
    cfg = _register("tiny-eval-vit", TINY)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    model = CLIPModel(cfg, params, compute_dtype=jnp.float32)
    batches = _val_batches(rng, n_batches=1)
    metrics = evaluate(model, {"val": _Data(_Loader(batches))}, epoch=0, args=_Args())

    imf = np.asarray(model.encode_image(batches[0]["image"], normalize=True), np.float32)
    txf = np.asarray(model.encode_text(batches[0]["text"], normalize=True), np.float32)
    scale = float(np.exp(np.asarray(model.params["logit_scale"])))
    logits = scale * imf @ txf.T

    def ce(l):
        l = l - l.max(-1, keepdims=True)
        logp = l - np.log(np.exp(l).sum(-1, keepdims=True))
        return -np.mean(np.diag(logp))

    expect = 0.5 * (ce(logits) + ce(logits.T))
    assert abs(metrics["clip_val_loss"] - expect) < 1e-4


def test_evaluate_coca_generative_loss(rng):
    cfg = _register("tiny-eval-coca", TINY_COCA)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    model = CLIPModel(cfg, params, compute_dtype=jnp.float32)
    data = {"val": _Data(_Loader(_val_batches(rng)))}
    metrics = evaluate(model, data, epoch=0, args=_Args())
    assert "val_generative_loss" in metrics and np.isfinite(metrics["val_generative_loss"])
    assert "clip_val_loss" in metrics


def test_eval_step_is_jitted_once(rng):
    """The eval step must not run per-batch Python encodes — one compiled callable."""
    cfg = _register("tiny-eval-vit", TINY)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    step = make_eval_step(cfg, compute_dtype=jnp.float32)
    b = _val_batches(rng, n_batches=1)[0]
    r1 = step(params, {k: jnp.asarray(v) for k, v in b.items()})
    assert r1["primary_features"].shape == (8, 32)
    assert np.isfinite(float(r1["loss"]))


def test_train_one_epoch_skip_steps():
    """Mid-epoch resume fast-forwards the sample stream without device steps."""
    import types

    import jax
    import jax.numpy as jnp

    from open_clip_tpu.train.train_loop import train_one_epoch
    from open_clip_tpu.train.train_step import TrainState

    seen = []

    def step_fn(state, batch, rng):
        seen.append(int(batch["idx"][0]))
        return state._replace(step=state.step + 1), {"loss": jnp.asarray(0.5)}

    loader = [{"idx": jnp.asarray([i])} for i in range(6)]
    args = types.SimpleNamespace(log_every_n_steps=100, seed=0, workers=1,
                                 batch_size=1, world_size=1)
    state = TrainState(params={}, opt_state=(), step=jnp.asarray(3))
    state = train_one_epoch(state, step_fn, loader, epoch=0, args=args, skip_steps=3)
    assert seen == [3, 4, 5], seen
