"""One full training step vs the torch reference: loss, gradients, and the
AdamW + wd-exclusion + grad-clip update, end to end on identical weights/batch.

Strongest train-path guarantee in the suite: embedding parity (test_parity_clip)
covers the forward; this pins the backward and the optimizer semantics
(reference open_clip_train/optim.py create_optimizer + main.py grad-clip +
open_clip/loss.py ClipLoss) against make_train_step + optax.
"""

import json

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.checkpoint import merge_params
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.convert import torch_clip_to_params
from open_clip_tpu.models.clip import init_clip

from .reference_stubs import install_reference

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.quick

TINY_CFG = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16, "head_width": 32},
    "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 64, "heads": 2, "layers": 2},
}

LR, WD, BETA1, BETA2, EPS, CLIP_NORM = 1e-3, 0.1, 0.9, 0.98, 1e-6, 1.0


@pytest.fixture(scope="module")
def ref():
    return install_reference()


@pytest.fixture(scope="module")
def pair(ref, tmp_path_factory):
    name = "tiny-stepparity-vit"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY_CFG), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(TINY_CFG))
        ref.add_model_config(p)
    torch.manual_seed(7)
    tmodel = ref.create_model(name)
    tmodel.train()
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    assert "_unconverted" not in loaded
    params = merge_params(params, loaded, cfg, strict=True)
    return tmodel, cfg, params


def _batch(seed=3, bs=8):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((bs, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 511, size=(bs, 16)).astype(np.int32)
    return img, txt


def _torch_step(ref, tmodel):
    """Reference semantics exactly: ClipLoss, create_optimizer param groups,
    clip_grad_norm_, one AdamW step (reference main.py:380-420 train loop)."""
    from open_clip.loss import ClipLoss
    from open_clip_train.optim import OptimizerCfg as RefOptCfg
    from open_clip_train.optim import create_optimizer as ref_create_optimizer

    opt = ref_create_optimizer(
        tmodel,
        RefOptCfg(opt="adamw", lr=LR, weight_decay=WD, beta1=BETA1, beta2=BETA2, eps=EPS),
    )
    img, txt = _batch()
    image = torch.from_numpy(img).permute(0, 3, 1, 2).contiguous()
    text = torch.from_numpy(txt.astype(np.int64))
    out = tmodel(image=image, text=text)
    if isinstance(out, dict):
        fi, ft, scale = out["image_features"], out["text_features"], out["logit_scale"]
    else:
        fi, ft, scale = out
    loss = ClipLoss()(fi, ft, scale)
    opt.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP_NORM, norm_type=2.0)
    opt.step()
    return float(loss.detach()), {n: p.detach().clone()
                                  for n, p in tmodel.named_parameters()}


def _jax_step(cfg, params):
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import (create_train_state, jit_train_step,
                                                make_train_step)

    opt = create_optimizer(
        OptimizerCfg(lr=LR, wd=WD, beta1=BETA1, beta2=BETA2, eps=EPS,
                     grad_clip_norm=CLIP_NORM),
        params, const_lr(LR, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, loss_type="clip",
                                          compute_dtype=jnp.float32, remat=False))
    img, txt = _batch()
    batch = {"image": jnp.asarray(img), "text": jnp.asarray(txt)}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    return float(metrics["loss"]), new_state.params


def _flat(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], np.asarray(tree, dtype=np.float64)


def test_one_train_step_matches_reference(ref, pair):
    tmodel, cfg, params = pair
    ref_loss, ref_params_after = _torch_step(ref, tmodel)
    our_loss, our_params_after = _jax_step(cfg, params)

    assert abs(ref_loss - our_loss) < 1e-5, (ref_loss, our_loss)

    # updated parameters: AdamW step-1 update is ~sign(g)*lr, so parity here
    # pins grads, the wd mask, the global-norm clip, and optax-vs-torch AdamW
    conv_after = torch_clip_to_params(ref_params_after, cfg)
    conv_after.pop("_unconverted", None)
    before = dict(_flat(params))
    ours = dict(_flat(our_params_after))
    theirs = dict(_flat(conv_after))
    assert set(ours) == set(theirs)
    worst = (None, 0.0)
    for name, ref_v in theirs.items():
        d = float(np.max(np.abs(ours[name] - ref_v)))
        if d > worst[1]:
            worst = (name, d)
        # update magnitude is <= lr (+ wd*lr*|w|); require agreement to ~1% of lr
        assert d < LR * 0.02, f"{name}: max |Δ| {d:.3e} (ref moved " \
                              f"{float(np.max(np.abs(before[name] - ref_v))):.3e})"
    # and the step actually moved the weights
    moved = max(float(np.max(np.abs(before[n] - theirs[n]))) for n in theirs)
    assert moved > LR * 0.5, f"reference step barely moved weights ({moved:.3e})"


def test_one_siglip_step_matches_reference(ref, tmp_path_factory):
    """Same one-step pin for the sigmoid loss + logit_bias path (reference
    SigLipLoss, loss.py:314; model.py:364 init_logit_bias)."""
    from open_clip.loss import SigLipLoss
    from open_clip_train.optim import OptimizerCfg as RefOptCfg
    from open_clip_train.optim import create_optimizer as ref_create_optimizer

    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import (create_train_state, jit_train_step,
                                                make_train_step)

    sig_cfg = dict(TINY_CFG)
    sig_cfg["init_logit_scale"] = float(np.log(10.0))
    sig_cfg["init_logit_bias"] = -10.0
    name = "tiny-stepparity-siglip"
    if name not in oct.list_models():
        oct.add_model_config(dict(sig_cfg), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(sig_cfg))
        ref.add_model_config(p)
    torch.manual_seed(11)
    tmodel = ref.create_model(name)
    tmodel.train()
    cfg = parse_model_cfg(name)
    params = merge_params(init_clip(jax.random.PRNGKey(0), cfg),
                          torch_clip_to_params(tmodel.state_dict(), cfg), cfg, strict=True)

    img, txt = _batch(seed=5)
    # torch side
    opt = ref_create_optimizer(
        tmodel, RefOptCfg(opt="adamw", lr=LR, weight_decay=WD, beta1=BETA1,
                          beta2=BETA2, eps=EPS))
    out = tmodel(image=torch.from_numpy(img).permute(0, 3, 1, 2).contiguous(),
                 text=torch.from_numpy(txt.astype(np.int64)))
    fi, ft, scale, bias = (out["image_features"], out["text_features"],
                           out["logit_scale"], out["logit_bias"]) \
        if isinstance(out, dict) else out
    ref_loss = SigLipLoss(rank=0, world_size=1)(fi, ft, scale, bias)
    opt.zero_grad()
    ref_loss.backward()
    torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP_NORM, norm_type=2.0)
    opt.step()
    ref_after = torch_clip_to_params(
        {n: p.detach().clone() for n, p in tmodel.named_parameters()}, cfg)
    ref_after.pop("_unconverted", None)

    # jax side
    jopt = create_optimizer(
        OptimizerCfg(lr=LR, wd=WD, beta1=BETA1, beta2=BETA2, eps=EPS,
                     grad_clip_norm=CLIP_NORM), params, const_lr(LR, 0))
    state = create_train_state(params, jopt)
    step = jit_train_step(make_train_step(cfg, jopt, loss_type="siglip",
                                          compute_dtype=jnp.float32, remat=False))
    new_state, metrics = step(state, {"image": jnp.asarray(img), "text": jnp.asarray(txt)},
                              jax.random.PRNGKey(0))

    assert abs(float(ref_loss) - float(metrics["loss"])) < 1e-5
    ours = dict(_flat(new_state.params))
    theirs = dict(_flat(ref_after))
    assert set(ours) == set(theirs)
    for k, v in theirs.items():
        d = float(np.max(np.abs(ours[k] - v)))
        assert d < LR * 0.02, f"{k}: max |delta| {d:.3e}"


def test_one_coca_step_matches_reference(ref, tmp_path_factory):
    """One-step pin for the CoCa path: contrastive + AR-shifted caption CE with
    pad masking and the 1.0/2.0 loss weights (reference task/coca_task.py:45-63,
    loss.py CoCaLoss with ignore_index=pad_id)."""
    from open_clip.loss import CoCaLoss
    from open_clip_train.optim import OptimizerCfg as RefOptCfg
    from open_clip_train.optim import create_optimizer as ref_create_optimizer

    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import (create_train_state, jit_train_step,
                                                make_train_step)

    coca_cfg = {
        "embed_dim": 32,
        "custom_text": True,
        "vision_cfg": {
            "image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
            "attentional_pool": True, "attn_pooler_queries": 9, "attn_pooler_heads": 4,
            "output_tokens": True,
        },
        "text_cfg": {
            "context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
            "embed_cls": True, "output_tokens": True,
        },
        "multimodal_cfg": {
            "context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
            "attn_pooler_heads": 2,
        },
    }
    name = "tiny-stepparity-coca"
    if name not in oct.list_models():
        oct.add_model_config(dict(coca_cfg), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(coca_cfg))
        ref.add_model_config(p)
    torch.manual_seed(23)
    tmodel = ref.create_model(name)
    # reference MultimodalTransformer leaves text_projection uninitialized
    # (torch.empty; its init_parameters is never called) — see test_parity_coca
    with torch.no_grad():
        torch.nn.init.normal_(tmodel.text_decoder.text_projection, std=0.02)
    tmodel.train()
    cfg = parse_model_cfg(name)
    params = merge_params(init_clip(jax.random.PRNGKey(0), cfg),
                          torch_clip_to_params(tmodel.state_dict(), cfg), cfg, strict=True)

    rng = np.random.default_rng(9)
    img = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 63, size=(8, 12)).astype(np.int32)
    txt[:, -3:] = 0  # pad tail exercises the caption-CE ignore mask (pad_id=0)

    # torch side (coca_task semantics)
    opt = ref_create_optimizer(
        tmodel, RefOptCfg(opt="adamw", lr=LR, weight_decay=WD, beta1=BETA1,
                          beta2=BETA2, eps=EPS))
    out = tmodel(image=torch.from_numpy(img).permute(0, 3, 1, 2).contiguous(),
                 text=torch.from_numpy(txt.astype(np.int64)))
    losses = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0)(
        out["image_features"], out["text_features"], out["logits"][:, :-1],
        torch.from_numpy(txt.astype(np.int64))[:, 1:], out["logit_scale"],
        output_dict=True)
    ref_loss = sum(losses.values())
    opt.zero_grad()
    ref_loss.backward()
    torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP_NORM, norm_type=2.0)
    opt.step()
    ref_after = torch_clip_to_params(
        {n: p.detach().clone() for n, p in tmodel.named_parameters()}, cfg)
    ref_after.pop("_unconverted", None)

    # jax side
    jopt = create_optimizer(
        OptimizerCfg(lr=LR, wd=WD, beta1=BETA1, beta2=BETA2, eps=EPS,
                     grad_clip_norm=CLIP_NORM), params, const_lr(LR, 0))
    state = create_train_state(params, jopt)
    step = jit_train_step(make_train_step(
        cfg, jopt, loss_type="coca", compute_dtype=jnp.float32, remat=False,
        caption_loss_weight=2.0, clip_loss_weight=1.0))
    new_state, metrics = step(state, {"image": jnp.asarray(img), "text": jnp.asarray(txt)},
                              jax.random.PRNGKey(0))

    assert abs(float(ref_loss) - float(metrics["loss"])) < 2e-5, \
        (float(ref_loss), float(metrics["loss"]))
    ours = dict(_flat(new_state.params))
    theirs = dict(_flat(ref_after))
    before = dict(_flat(params))
    assert set(ours) == set(theirs)
    for k, v in theirs.items():
        diff = ours[k] - v
        if k.endswith("attn_pool/query"):
            # known, deliberate divergence: the reference's CLASSIC tower decays
            # the attentional-pool query (its no_weight_decay() lists only
            # pos/class embeddings, transformer.py:778-781) while its newer MAP
            # towers exclude the query as a learned token (transformer.py:
            # 1481-1487). We follow the newer convention uniformly, so our step
            # differs by exactly the removed decay term lr*wd*q at step 1.
            np.testing.assert_allclose(diff, LR * WD * before[k], atol=LR * 0.02)
            continue
        d = float(np.max(np.abs(diff)))
        assert d < LR * 0.02, f"{k}: max |delta| {d:.3e}"
