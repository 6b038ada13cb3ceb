"""Train-step tests: loss decreases, grad-accum exactness, sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models.clip import init_clip
from open_clip_tpu.parallel.mesh import create_mesh, fsdp_shardings, shard_params
from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer, wd_mask
from open_clip_tpu.train.scheduler import const_lr, cosine_lr
from open_clip_tpu.train.train_step import (
    TrainState,
    create_train_state,
    jit_train_step,
    make_train_step,
)

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
}


@pytest.fixture(scope="module")
def tiny():
    name = "tiny-train-vit"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY), name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(rng, n=16):
    return {
        "image": rng.standard_normal((n, 32, 32, 3)).astype(np.float32),
        "text": rng.integers(1, 63, size=(n, 12)).astype(np.int32),
    }


def _optimizer(params, lr=1e-3):
    return create_optimizer(OptimizerCfg(lr=lr, wd=0.01, grad_clip_norm=1.0), params, const_lr(lr, 0))


def test_loss_decreases(tiny, rng):
    cfg, params = tiny
    opt = _optimizer(params)
    step = jit_train_step(make_train_step(cfg, opt, compute_dtype=jnp.float32))
    state = create_train_state(params, opt)
    batch = _batch(rng)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert float(state.params["logit_scale"]) <= np.log(100.0) + 1e-6


def test_accum_matches_simple(tiny, rng):
    """GradCache accumulation must produce the same update as the full-batch step."""
    cfg, params = tiny
    opt = _optimizer(params)
    batch = _batch(rng, n=16)
    key = jax.random.PRNGKey(0)

    s1 = create_train_state(params, opt)
    s1, m1 = make_train_step(cfg, opt, compute_dtype=jnp.float32)(s1, batch, key)

    s2 = create_train_state(params, opt)
    # note: accum path folds rng per microbatch; with no stochastic layers results are
    # rng-independent, so gradients must match exactly
    s2, m2 = make_train_step(cfg, opt, compute_dtype=jnp.float32, accum_steps=4)(s2, batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=2e-4)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_matches_single_device(tiny, rng):
    cfg, params = tiny
    opt = _optimizer(params)
    batch = _batch(rng, n=16)
    key = jax.random.PRNGKey(0)

    s_single = create_train_state(params, opt)
    s_single, m_single = make_train_step(cfg, opt, compute_dtype=jnp.float32)(s_single, batch, key)

    mesh = create_mesh(data=4, fsdp=2)
    shardings = fsdp_shardings(params, mesh, min_size=1024)
    sharded_params = shard_params(params, shardings)
    s_mesh = create_train_state(sharded_params, opt)
    step = jit_train_step(make_train_step(cfg, opt, mesh=mesh, compute_dtype=jnp.float32), mesh)
    s_mesh, m_mesh = step(s_mesh, batch, key)

    np.testing.assert_allclose(float(m_mesh["loss"]), float(m_single["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_mesh.params), jax.tree_util.tree_leaves(s_single.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_siglip_train_step(rng):
    tiny_siglip = dict(TINY)
    tiny_siglip["init_logit_bias"] = -10
    name = "tiny-train-siglip"
    if name not in oct.list_models():
        oct.add_model_config(tiny_siglip, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = _optimizer(params)
    mesh = create_mesh(data=8)
    step = jit_train_step(
        make_train_step(cfg, opt, loss_type="siglip", mesh=mesh, compute_dtype=jnp.float32), mesh
    )
    state = create_train_state(params, opt)
    batch = _batch(rng)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_ema(tiny, rng):
    cfg, params = tiny
    opt = _optimizer(params)
    step = make_train_step(cfg, opt, compute_dtype=jnp.float32, ema_decay=0.9)
    state = create_train_state(params, opt, ema=True)
    batch = _batch(rng, n=8)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # EMA must move toward params but not equal them
    p = np.asarray(state.params["visual"]["proj"])
    e = np.asarray(state.ema_params["visual"]["proj"])
    p0 = np.asarray(params["visual"]["proj"])
    assert not np.allclose(e, p)
    np.testing.assert_allclose(e, 0.9 * p0 + 0.1 * p, atol=1e-6)


def test_wd_mask_policy(tiny):
    cfg, params = tiny
    mask = wd_mask(params)
    assert mask["visual"]["blocks"]["attn"]["qkv"]["kernel"] == 1.0
    assert mask["visual"]["blocks"]["attn"]["qkv"]["bias"] == 0.0
    assert mask["visual"]["blocks"]["ln_1"]["scale"] == 0.0
    assert mask["visual"]["positional_embedding"] == 0.0
    assert mask["visual"]["class_embedding"] == 0.0
    assert mask["logit_scale"] == 0.0
    assert mask["text"]["token_embedding"] == 1.0
    assert mask["visual"]["patch_embed"]["kernel"] == 1.0


def test_cosine_schedule():
    sched = cosine_lr(1.0, 10, 110)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(110)) == pytest.approx(0.0, abs=1e-6)
    assert 0.45 < float(sched(60)) < 0.55


def test_coca_train_step(rng):
    tiny_coca = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
                       "attentional_pool": True, "attn_pooler_queries": 5, "attn_pooler_heads": 2,
                       "output_tokens": True},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
                     "embed_cls": True, "output_tokens": True},
        "multimodal_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
        "custom_text": True,
    }
    name = "tiny-train-coca"
    if name not in oct.list_models():
        oct.add_model_config(tiny_coca, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = _optimizer(params)
    mesh = create_mesh(data=4, devices=jax.devices()[:4])
    step = jit_train_step(
        make_train_step(cfg, opt, loss_type="coca", mesh=mesh, compute_dtype=jnp.float32), mesh
    )
    state = create_train_state(params, opt)
    batch = {
        "image": rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        "text": rng.integers(1, 63, size=(8, 12)).astype(np.int32),
    }
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_lock_image_tower(tiny, rng):
    from open_clip_tpu.train.optim import apply_trainable_mask, trainable_mask

    cfg, params = tiny
    mask = trainable_mask(params, lock_image=True, lock_image_unlocked_groups=1)
    assert float(np.max(np.asarray(mask["visual"]["blocks"]["attn"]["qkv"]["kernel"]))) == 0.0
    assert mask["visual"]["proj"] == 1.0  # head stays trainable with unlocked_groups=1
    assert mask["text"]["token_embedding"] == 1.0
    assert mask["logit_scale"] == 1.0

    opt = apply_trainable_mask(_optimizer(params), mask)
    step = make_train_step(cfg, opt, compute_dtype=jnp.float32)
    state = create_train_state(params, opt)
    batch = _batch(rng, n=8)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(state.params["visual"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["visual"]["blocks"]["attn"]["qkv"]["kernel"]),
    )
    assert not np.allclose(np.asarray(state.params["visual"]["proj"]), np.asarray(params["visual"]["proj"]))
    assert not np.allclose(
        np.asarray(state.params["text"]["blocks"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["text"]["blocks"]["attn"]["qkv"]["kernel"]),
    )


def test_distill_train_step(tiny, rng):
    cfg, params = tiny
    teacher_params = init_clip(jax.random.PRNGKey(9), cfg)
    opt = _optimizer(params)
    step = make_train_step(
        cfg, opt, loss_type="distill", compute_dtype=jnp.float32, teacher=(cfg, teacher_params)
    )
    state = create_train_state(params, opt)
    batch = _batch(rng, n=8)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    # teacher must remain untouched
    np.testing.assert_array_equal(
        np.asarray(teacher_params["visual"]["proj"]), np.asarray(init_clip(jax.random.PRNGKey(9), cfg)["visual"]["proj"])
    )


def test_genlip_train_step(rng):
    from open_clip_tpu.models import genlip as G

    cfg = G.GenLipModelCfg.from_dict(oct.get_model_config("naflexgenlip_test"))
    params = G.init_genlip(jax.random.PRNGKey(0), cfg)
    opt = _optimizer(params)
    step = make_train_step(cfg, opt, loss_type="genlip", compute_dtype=jnp.float32)
    state = create_train_state(params, opt)
    n, npatch, pdim, lt = 4, 8, 16 * 16 * 3, 10
    coords = np.stack(np.meshgrid(np.arange(2), np.arange(4), indexing="ij"), -1).reshape(-1, 2)
    batch = {
        "image": {
            "patches": rng.standard_normal((n, npatch, pdim)).astype(np.float32),
            "patch_coord": np.repeat(coords[None], n, 0).astype(np.int32),
            "patch_valid": np.ones((n, npatch), bool),
        },
        "text": rng.integers(0, 1000, size=(n, lt)).astype(np.int32),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_muon_optimizer(tiny, rng):
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr

    cfg, params = tiny
    opt = create_optimizer(OptimizerCfg(opt="muon", lr=1e-3, wd=0.0, momentum=0.95),
                           params, const_lr(1e-3, 0))
    step = make_train_step(cfg, opt, compute_dtype=jnp.float32)
    state = create_train_state(params, opt)
    batch = _batch(rng, n=8)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_per_layer_unlock_on_stacked_leaves(tiny, rng):
    """lock_image with unlocked_groups=2: head + LAST block train, earlier blocks and
    embeddings stay frozen (reference VisionTransformer.lock group order)."""
    from open_clip_tpu.train.optim import (OptimizerCfg, apply_trainable_mask,
                                           create_optimizer, trainable_mask)
    from open_clip_tpu.train.scheduler import const_lr

    cfg, params = tiny
    mask = trainable_mask(params, lock_image=True, lock_image_unlocked_groups=2)
    opt = apply_trainable_mask(
        create_optimizer(OptimizerCfg(lr=1e-2, wd=0.0), params, const_lr(1e-2, 0)), mask)
    step = make_train_step(cfg, opt, compute_dtype=jnp.float32)
    state = create_train_state(params, opt)
    state, _ = step(state, _batch(rng, n=8), jax.random.PRNGKey(0))

    before = params["visual"]["blocks"]["mlp"]["c_fc"]["kernel"]
    after = state.params["visual"]["blocks"]["mlp"]["c_fc"]["kernel"]
    n_layers = before.shape[0]
    # all but the last block frozen; last block moved
    np.testing.assert_array_equal(np.asarray(before[:-1]), np.asarray(after[:-1]))
    assert not np.allclose(np.asarray(before[-1]), np.asarray(after[-1]))
    # embeddings frozen, head trainable, text tower trainable
    np.testing.assert_array_equal(np.asarray(params["visual"]["patch_embed"]["kernel"]),
                                  np.asarray(state.params["visual"]["patch_embed"]["kernel"]))
    assert not np.allclose(np.asarray(params["visual"]["proj"]),
                           np.asarray(state.params["visual"]["proj"]))
    assert not np.allclose(np.asarray(params["text"]["token_embedding"]),
                           np.asarray(state.params["text"]["token_embedding"]))


def test_coca_accum_matches_simple():
    """CoCa grad accumulation (contrastive via GradCache + per-microbatch caption
    term) matches the single-pass step (reference coca_task accum-path semantics)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import (
        create_train_state, jit_train_step, make_train_step)

    cfg = parse_model_cfg("coca_ViT-B-32")
    cfg = dataclasses.replace(
        cfg,
        vision_cfg=dataclasses.replace(cfg.vision_cfg, image_size=32, layers=2,
                                       width=64, head_width=32),
        text_cfg=dataclasses.replace(cfg.text_cfg, layers=2, width=64, heads=2,
                                     context_length=12),
        multimodal_cfg=dataclasses.replace(cfg.multimodal_cfg, layers=2, width=64,
                                           heads=2, context_length=11),
        embed_dim=64)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.standard_normal((8, 32, 32, 3)), jnp.float32),
             "text": jnp.asarray(rng.integers(1, 100, size=(8, 12)), jnp.int32)}

    losses = {}
    states = {}
    for tag, accum in (("simple", 1), ("accum", 4)):
        opt = create_optimizer(OptimizerCfg(lr=1e-3, wd=0.0), params, const_lr(1e-3, 0))
        state = create_train_state(params, opt)
        step = jit_train_step(make_train_step(
            cfg, opt, loss_type="coca", accum_steps=accum, compute_dtype=jnp.float32))
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses[tag] = float(m["loss"])
        states[tag] = state
    assert np.isfinite(losses["accum"])
    # losses match exactly (caption term averages per microbatch == full-batch mean
    # here since microbatches share the token-count distribution of random data up
    # to padding; contrastive is GradCache-exact)
    np.testing.assert_allclose(losses["accum"], losses["simple"], rtol=2e-2)
    # updated params match closely (grads exact for contrastive; caption grads exact
    # given equal per-microbatch normalization)
    a = jax.tree.leaves(states["accum"].params)
    b = jax.tree.leaves(states["simple"].params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-4)


def test_distill_accum_matches_simple(tiny, rng):
    """Distillation under GradCache accumulation: the teacher-KL term must ride
    the cached full-batch cotangents and match the full-batch distill step
    (regression: the accum path used to drop the KL term silently)."""
    cfg, params = tiny
    teacher_params = init_clip(jax.random.PRNGKey(9), cfg)
    opt = _optimizer(params)
    batch = _batch(rng, n=16)
    key = jax.random.PRNGKey(0)

    s1 = create_train_state(params, opt)
    s1, m1 = make_train_step(cfg, opt, loss_type="distill", compute_dtype=jnp.float32,
                             teacher=(cfg, teacher_params))(s1, batch, key)

    s2 = create_train_state(params, opt)
    s2, m2 = make_train_step(cfg, opt, loss_type="distill", compute_dtype=jnp.float32,
                             teacher=(cfg, teacher_params), accum_steps=4)(s2, batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("policy", ["names", "names_mm", "dots"])
def test_remat_policy_matches_full_remat(tiny, rng, policy):
    """Selective remat policies change what the backward saves, never the math:
    the updated weights must match full remat exactly. The 'names' policy is the
    flagship bench frontier config (scripts/bench_sweep.py, docs/ROUND3.md)."""
    from open_clip_tpu.models import blocks

    cfg, params = tiny
    batch = _batch(rng, n=8)
    key = jax.random.PRNGKey(3)
    prev = blocks.REMAT_POLICY
    try:
        blocks.REMAT_POLICY = "none"
        opt = _optimizer(params)
        s_full = create_train_state(params, opt)
        s_full, m_full = make_train_step(cfg, opt, compute_dtype=jnp.float32,
                                         remat=True)(s_full, batch, key)

        blocks.REMAT_POLICY = policy
        opt = _optimizer(params)
        s_sel = create_train_state(params, opt)
        s_sel, m_sel = make_train_step(cfg, opt, compute_dtype=jnp.float32,
                                       remat=True)(s_sel, batch, key)
    finally:
        blocks.REMAT_POLICY = prev

    np.testing.assert_allclose(float(m_full["loss"]), float(m_sel["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_sel.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_policy_cli_flag():
    """--remat-policy/--scan-unroll parse and are applied by main before the step
    is built (reference --grad-checkpointing, params.py:183 — the policy knob is a
    TPU-native extension)."""
    from open_clip_tpu.train.params import parse_args

    args = parse_args(["--train-data", "x", "--remat-policy", "names", "--scan-unroll", "2"])
    assert args.remat_policy == "names" and args.scan_unroll == 2
    args = parse_args(["--train-data", "x"])
    assert args.remat_policy == "none" and args.scan_unroll == 1
