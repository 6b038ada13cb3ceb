"""Benchmarks on the real TPU chip.

Default (driver contract): ONE JSON line for the flagship ViT-B-32 contrastive train
step — {"metric", "value", "unit", "vs_baseline"} (+ informational "mfu").

``python bench.py --suite`` additionally measures the BASELINE.json config list
(ViT-L-14 train step, SigLIP ViT-B-16 sigmoid loss, NaFlex token-budget step, CoCa,
CLAP-HTSAT) — one JSON line each and a combined docs/bench_suite.json.

vs_baseline compares the flagship against the derived A100 anchor: ~775 images/sec/GPU
for ViT-B-32 contrastive training incl. text tower (BASELINE.md, derived from reference
docs/PRETRAINED.md:32 — 32768 global batch / 128 GPUs / 36 h / 12.8B samples).
MFU = 3x-forward train FLOPs / step time / 197 TF/s bf16 peak (v5e) — the standard
convention that does NOT credit remat recomputation as useful work; "hfu" additionally
counts the remat re-forward (4x fwd) and so reflects hardware busy-ness, not model work.
"""

import json
import os
import sys
import time

import numpy as np

A100_ANCHOR_IMG_PER_SEC = 775.0
V5E_PEAK_TFLOPS = 197.0


def _setup_jax():
    import os

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _require_device(timeout_s: int = 240):
    """Fail fast when device init hangs (a wedged TPU tunnel blocks
    ``jax.devices()`` in C code forever — seen when the pool relay accepts TCP
    but never grants the claim). Raises RuntimeError on timeout so main() can
    report the last measured result instead of hanging the driver."""
    import threading

    import jax

    done = threading.Event()
    out = {}

    def probe():
        try:
            out["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — reported below
            out["error"] = repr(e)
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        raise RuntimeError(f"jax.devices() did not return within {timeout_s}s "
                           "(TPU tunnel unresponsive)")
    if "error" in out:
        raise RuntimeError(f"jax device init failed: {out['error']}")
    return out["devices"]


def _sync(x):
    """Force completion with a real D2H fetch of ONE element. On the axon tunnel
    ``block_until_ready()`` returns once the execution is enqueued, not when it
    finishes — only a device->host copy actually waits (the train benches sync by
    fetching the loss for the same reason; un-synced timings here once reported an
    impossible 326k captions/s). A scalar fetch keeps the D2H bytes (~28 MB/s
    tunnel) out of the measurement."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def _train_step(cfg, loss_type="clip", remat=True, policy="none", unroll=1):
    import jax.numpy as jnp

    from open_clip_tpu.models import blocks
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step
    from open_clip_tpu.models.clip import init_clip
    import jax

    # set the remat/unroll globals explicitly per entry so suite runs are
    # order-independent (an earlier entry's policy must not leak into this one);
    # OCT_BENCH_REMAT_POLICY overrides for frontier probing (scripts/bench_frontier.py)
    blocks.REMAT_POLICY = os.environ.get("OCT_BENCH_REMAT_POLICY", policy)
    blocks.SCAN_UNROLL = int(os.environ.get("OCT_BENCH_SCAN_UNROLL", unroll))
    blocks.SCAN_SPLIT_TRANSPOSE = bool(int(os.environ.get("OCT_BENCH_SPLIT_TRANSPOSE", "0")))

    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0), params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, loss_type=loss_type,
                                          compute_dtype=jnp.bfloat16, remat=remat))
    return state, step


def _run_steps(state, step, batch, iters=10, warmup=2):
    import jax

    keys = [jax.random.PRNGKey(i) for i in range(warmup + iters)]
    for i in range(warmup):
        state, metrics = step(state, batch, keys[i])
        _ = np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, keys[warmup + i])
    loss = float(np.asarray(metrics["loss"]))  # device->host sync
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss), loss
    return dt


def _image_text_batch(jnp, bs, image_size, ctx, vocab):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.standard_normal((bs, image_size, image_size, 3)), jnp.bfloat16),
        "text": jnp.asarray(rng.integers(0, vocab - 1, size=(bs, ctx)), jnp.int32),
    }


def _profile_gflops(model_name, default, column="GFLOPs"):
    """Per-sample forward GFLOPs from docs/model_profile.csv (XLA-counted);
    ``column`` picks the full-model or per-tower count."""
    import os

    try:
        import csv

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "docs", "model_profile.csv")
        with open(path) as fh:
            for row in csv.DictReader(fh):
                if row["model"] == model_name and row.get(column):
                    return float(row[column])
    except OSError:
        pass
    return default


def _fwd_gflops(model_name, default):
    return _profile_gflops(model_name, default)


def _mfu_fields(fwd_fn, fwd_args, dt, *, count=1.0):
    """mfu/hfu for a bench entry from XLA-counted forward FLOPs at the ENTRY'S
    exact shapes (docs/model_profile.csv rows use the profiler's shapes, which
    differ for the token-budget/audio entries). 3x-fwd = standard MFU convention
    (remat recompute is not useful work); 4x = full-remat hardware-busy bound."""
    from open_clip_tpu.train.profiler import _flops_of

    flops = _flops_of(fwd_fn, *fwd_args)
    if not flops:
        return {}
    per_step = flops * count
    return {
        "mfu": round(3 * per_step / dt / 1e12 / V5E_PEAK_TFLOPS, 3),
        "hfu_upper_bound": round(4 * per_step / dt / 1e12 / V5E_PEAK_TFLOPS, 3),
    }


def bench_flagship(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models import blocks

    # selective remat "names_mm" (save the block-matmul OUTPUTS — fused qkv +
    # fc1 pre-activation + attn context — so the backward recomputes no dense
    # matmul at all) at batch 256/chip: the round-4 frontier winner. Measured
    # ladder at this point: full remat 1827, names (save matmul inputs) 1994,
    # names_mm 2108 img/s; no-remat still compiler-OOMs at 256. Batch 256 is
    # also the reference recipe's per-device batch (32768 global / 128 GPUs).
    cfg = parse_model_cfg("ViT-B-32")
    state, step = _train_step(cfg, policy="names_mm")
    bs = bs or 256
    batch = _image_text_batch(jnp, bs, 224, 77, 49408)
    dt = _run_steps(state, step, batch, iters=20)
    img_per_sec = bs / dt
    gflops = _fwd_gflops("ViT-B-32", 15.06)
    return {
        "metric": "vit_b32_clip_train_images_per_sec_per_chip",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip (bf16, batch 256/chip as in the reference 32k/128-GPU recipe, "
                "selective remat, incl. text tower + optimizer)",
        "vs_baseline": round(img_per_sec / A100_ANCHOR_IMG_PER_SEC, 3),
        "mfu": round(gflops * 3 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
        # hardware busy-ness: selective remat recomputes less than a full forward,
        # so the honest HFU multiplier sits in (3, 4); 4x (full-remat convention)
        # is reported as an upper bound
        "hfu_upper_bound": round(gflops * 4 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
    }


def bench_vit_l14(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg

    cfg = parse_model_cfg("ViT-L-14")
    # batch 64/chip: round-3 frontier probe winner (171 vs 166 img/s at 256;
    # scripts/bench_frontier.py — 32:162, 64:171, 96:169, 128:168, 256:166, 512 OOM);
    # round-4: names_mm (save matmul outputs) 187.9 vs names 181.5 img/s
    state, step = _train_step(cfg, policy="names_mm")
    bs = bs or 64
    batch = _image_text_batch(jnp, bs, 224, 77, 49408)
    dt = _run_steps(state, step, batch, iters=10)
    gflops = _fwd_gflops("ViT-L-14", 177.51)
    return {
        "metric": "vit_l14_clip_train_images_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": "images/sec/chip (bf16, batch 64, all-gather InfoNCE train step)",
        "mfu": round(gflops * 3 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
        "hfu": round(gflops * 4 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
    }


def bench_vit_h14(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.convert import convert_params_dtype
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step

    from open_clip_tpu.models import blocks

    # round-5: names_mm at batch 16 (86+ img/s, MFU ~0.51) beats full remat at
    # batch 32 (77.5, 0.455). names_mm at batch 32 RESOURCE_EXHAUSTEDs — saving
    # matmul outputs at H-14 scale doesn't fit 16 GB HBM at 32/chip, which was
    # the real blocker behind the round-4 "stale_error" (not only the compile
    # helper's HTTP 500s).
    blocks.REMAT_POLICY = os.environ.get("OCT_BENCH_REMAT_POLICY", "names_mm")
    blocks.SCAN_UNROLL = int(os.environ.get("OCT_BENCH_SCAN_UNROLL", "1"))
    blocks.SCAN_SPLIT_TRANSPOSE = bool(int(os.environ.get("OCT_BENCH_SPLIT_TRANSPOSE", "0")))
    cfg = parse_model_cfg("ViT-H-14")
    # 986M params cannot carry fp32 params + fp32 AdamW m/v + fp32 grads on a 16G
    # chip (measured: the fp32-AdamW step OOMs at compile while an SGD step runs).
    # Bench the realistic single-chip configuration instead: pure_bf16 params
    # (reference --precision pure_bf16) + bf16 Adam mu; multi-chip FSDP sharding is
    # the real training configuration (parallel/mesh.py).
    params = init_clip(jax.random.PRNGKey(0), cfg)
    params = convert_params_dtype(params, jnp.bfloat16)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0, mu_dtype="bfloat16"),
                           params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, loss_type="clip",
                                          compute_dtype=jnp.bfloat16, remat=True))
    # batch 16/chip under names_mm (round-5 winner); the round-3 full-remat
    # frontier winner was 32 (77.8 vs 75.2 at 48, 71.5 at 96 img/s).
    bs = bs or 16
    batch = _image_text_batch(jnp, bs, 224, 77, 49408)
    dt = _run_steps(state, step, batch, iters=5)
    gflops = _fwd_gflops("ViT-H-14", 381.9)
    return {
        "metric": "vit_h14_clip_train_images_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": f"images/sec/chip (pure_bf16 params + bf16 adam mu, batch {bs}, InfoNCE train step)",
        "mfu": round(gflops * 3 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
        "hfu": round(gflops * 4 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
    }


def bench_siglip(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg

    cfg = parse_model_cfg("ViT-B-16-SigLIP")
    # batch 256/chip: round-3 frontier probe winner (625 vs 617 img/s at 512;
    # scripts/bench_frontier.py — 128:612, 256:625, 512:617, 1024:590);
    # round-4: names_mm 684.3 vs full remat 628.0 img/s
    state, step = _train_step(cfg, loss_type="siglip", policy="names_mm")
    bs = bs or 256
    batch = _image_text_batch(jnp, bs, 224, 64, 32000)
    dt = _run_steps(state, step, batch, iters=10)
    gflops = _fwd_gflops("ViT-B-16-SigLIP", 46.4)
    return {
        "metric": "siglip_b16_train_images_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": "images/sec/chip (bf16, batch 256, sigmoid loss train step)",
        "mfu": round(gflops * 3 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
        "hfu": round(gflops * 4 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
    }


def bench_coca(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg

    cfg = parse_model_cfg("coca_ViT-B-32")
    # round-4 probe at 256: names_mm 704.1 vs full remat 699.6, names 679.7
    state, step = _train_step(cfg, loss_type="coca", policy="names_mm")
    bs = bs or 256  # round-3 probe: 698 samples/s vs 613 at 512 (matches the flagship frontier)
    batch = _image_text_batch(jnp, bs, 224, 76, 49408)
    dt = _run_steps(state, step, batch, iters=10)
    gflops = _fwd_gflops("coca_ViT-B-32", 33.3)
    return {
        "metric": "coca_b32_train_samples_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": "samples/sec/chip (bf16, batch 256, contrastive+caption train step)",
        "mfu": round(gflops * 3 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
        "hfu": round(gflops * 4 * bs / dt / 1e3 / V5E_PEAK_TFLOPS, 3),
    }


def bench_naflex(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg

    cfg = parse_model_cfg("naflex_ViT-B-16")
    # round-5 probe: names_mm (save block-matmul outputs) beat full remat by
    # ~3.8% at this bucket shape — same pattern as the dense towers.
    state, step = _train_step(cfg, policy="names_mm")
    # token-budget bucket: seq 1024 patches @ patch 16 -> 16384-token budget = 16/batch
    bs, seq = bs or 16, 1024
    rng = np.random.default_rng(0)
    patches = {
        "patches": jnp.asarray(rng.standard_normal((bs, seq, 16 * 16 * 3)), jnp.bfloat16),
        "patch_coord": jnp.asarray(
            np.stack(np.meshgrid(np.arange(32), np.arange(32), indexing="ij"), -1)
            .reshape(1, seq, 2).repeat(bs, 0), jnp.int32),
        "patch_valid": jnp.ones((bs, seq), bool),
    }
    batch = {"image": patches,
             "text": jnp.asarray(rng.integers(0, 49407, size=(bs, 77)), jnp.int32)}
    dt = _run_steps(state, step, batch, iters=5)
    toks_per_sec = bs * seq / dt

    from open_clip_tpu.models.clip import clip_forward

    def fwd(params, b):
        return clip_forward(params, cfg, b["image"], b["text"], compute_dtype=jnp.bfloat16)

    return {
        "metric": "naflex_b16_train_image_tokens_per_sec_per_chip",
        "value": round(toks_per_sec, 0),
        "unit": "image tokens/sec/chip (bf16, 16384-token budget bucket, seq 1024)",
        **_mfu_fields(fwd, (state.params, batch), dt),
    }


def bench_genlip(bs=None):
    """GenLIP prefix-LM train step at 1k image tokens — exercises the flash
    prefix-LM kernels (ops/flash_attention.py) and the fused linear-CE."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.factory import create_model
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step

    from open_clip_tpu.models import blocks

    # round-5 probe: names_mm beat full remat by ~2.9% on the prefix-LM step;
    # unroll/split-transpose probes regressed (kept at defaults).
    blocks.REMAT_POLICY = os.environ.get("OCT_BENCH_REMAT_POLICY", "names_mm")
    blocks.SCAN_UNROLL = int(os.environ.get("OCT_BENCH_SCAN_UNROLL", "1"))
    blocks.SCAN_SPLIT_TRANSPOSE = bool(int(os.environ.get("OCT_BENCH_SPLIT_TRANSPOSE", "0")))
    m = create_model("naflexgenlip_b16", load_weights=False)
    cfg, params = m.cfg, m.params
    opt = create_optimizer(OptimizerCfg(lr=1e-4, wd=0.1, grad_clip_norm=1.0),
                           params, const_lr(1e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, loss_type="genlip",
                                          compute_dtype=jnp.bfloat16, remat=True))
    bs, ni, lt = bs or 8, 1024, 128
    rng = np.random.default_rng(0)
    grid32 = np.stack(np.meshgrid(np.arange(32), np.arange(32), indexing="ij"), -1)
    batch = {
        "image": {
            "patches": jnp.asarray(rng.standard_normal((bs, ni, 768)), jnp.bfloat16),
            "patch_coord": jnp.asarray(grid32.reshape(1, ni, 2).repeat(bs, 0), jnp.int32),
            "patch_valid": jnp.ones((bs, ni), bool),
        },
        "text": jnp.asarray(rng.integers(1, 1000, size=(bs, lt)), jnp.int32),
    }
    dt = _run_steps(state, step, batch, iters=5)
    toks = bs * (ni + lt)

    from open_clip_tpu.models.genlip import genlip_forward

    def fwd(params, b):
        return genlip_forward(params, cfg, b["image"], b["text"], compute_loss=True,
                              compute_dtype=jnp.bfloat16)["loss"]

    return {
        "metric": "genlip_b16_train_tokens_per_sec_per_chip",
        "value": round(toks / dt, 0),
        "unit": "tokens/sec/chip (bf16, 1024 image + 128 text tokens, prefix-LM + fused CE)",
        **_mfu_fields(fwd, (state.params, batch), dt),
    }


def bench_clap(bs=None):
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg

    cfg = parse_model_cfg("CLAP-HTSAT-tiny")
    state, step = _train_step(cfg)
    # batch 128/chip: round-3 frontier probe winner (406 vs 370 clips/s at 32)
    bs = bs or 128
    rng = np.random.default_rng(0)
    batch = {
        "audio": {"waveform": jnp.asarray(rng.standard_normal((bs, 480000)) * 0.1, jnp.float32)},
        "text": jnp.asarray(rng.integers(0, 49407, size=(bs, 77)), jnp.int32),
    }
    dt = _run_steps(state, step, batch, iters=5)

    from open_clip_tpu.models.clip import clip_forward

    def fwd(params, b):
        return clip_forward(params, cfg, b["audio"], b["text"], compute_dtype=jnp.bfloat16)

    return {
        "metric": "clap_htsat_tiny_train_clips_per_sec_per_chip",
        "value": round(bs / dt, 1),
        "unit": f"10s clips/sec/chip (bf16, batch {bs}, on-device log-mel + train step)",
        **_mfu_fields(fwd, (state.params, batch), dt),
    }


def bench_inference(bs=None):
    """Serving-path throughput: jitted bf16 ``encode_image`` (normalize included),
    the hot op of zero-shot classification / retrieval / embedding services.
    MFU is 1x forward (no remat, no backward)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.convert import convert_params_dtype
    from open_clip_tpu.models.clip import encode_image, init_clip

    out = {"metric": "image_encode_inference_images_per_sec_per_chip",
           "unit": "images/sec/chip (bf16 params+compute, jitted encode_image+l2norm)"}
    for name, batch_size, ref_gf in (("ViT-B-32", 2048, 8.95), ("ViT-L-14", 512, 163.99)):
        cfg = parse_model_cfg(name)
        params = convert_params_dtype(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)

        @jax.jit
        def fn(params, image, _cfg=cfg):
            return encode_image(params, _cfg, image, normalize=True, compute_dtype=jnp.bfloat16)

        bs_i = bs or batch_size
        rng = np.random.default_rng(0)
        image = jnp.asarray(rng.standard_normal((bs_i, 224, 224, 3)), dtype=jnp.bfloat16)
        _sync(fn(params, image))
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            r = fn(params, image)
        _sync(r)
        dt = (time.perf_counter() - t0) / iters
        gf = _profile_gflops(name, ref_gf, column="image GFLOPs")
        key = name.lower().replace("-", "_")
        out[key] = {"value": round(bs_i / dt, 1), "batch": bs_i,
                    "mfu": round(gf * bs_i / dt / 1e3 / V5E_PEAK_TFLOPS, 3)}
    return out


def bench_generation(bs=None):
    """Captioning decode throughput (serving path): KV-cached fixed-shape decode
    loops for CoCa (greedy + beam-6, the reference's default generation type) and
    GenLIP (greedy over a 256-token NaFlex prefix). Reports captions/s/chip and the
    measured speedup over the reference-style re-encode-each-step loop (which is
    what the torch reference always does — it forces the HF cache off,
    coca_model.py:353-356)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    out = {"metric": "caption_generation_captions_per_sec_per_chip",
           "unit": "captions/sec/chip (bf16, jitted single-program decode)"}

    def _time(fn, *a, iters=5):
        _sync(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*a)
        _sync(r)
        return (time.perf_counter() - t0) / iters

    # --- CoCa-B/32 ---------------------------------------------------------------
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.convert import convert_params_dtype
    from open_clip_tpu.models import coca
    from open_clip_tpu.models.clip import init_clip

    cfg = parse_model_cfg("coca_ViT-B-32")
    params = convert_params_dtype(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    bs_c = bs or 64
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((bs_c, 224, 224, 3)), dtype=jnp.bfloat16)
    seq = 30

    # params must be a jit ARGUMENT: closing over them bakes 63M weights into the
    # HLO as literals (~570 MB serialized — the axon tunnel rejects it, HTTP 413)
    greedy = jax.jit(lambda p, img: coca.generate(
        p, cfg, img, seq_len=seq, kv_cache=True, compute_dtype=jnp.bfloat16))
    greedy_slow = jax.jit(lambda p, img: coca.generate(
        p, cfg, img, seq_len=seq, kv_cache=False, compute_dtype=jnp.bfloat16))
    beam = jax.jit(lambda p, img: coca.generate_beam(
        p, cfg, img, seq_len=seq, num_beams=6, kv_cache=True,
        compute_dtype=jnp.bfloat16))
    dt_fast = _time(greedy, params, image)
    dt_slow = _time(greedy_slow, params, image, iters=2)
    dt_beam = _time(beam, params, image, iters=2)
    out["coca_b32_greedy"] = {
        "value": round(bs_c / dt_fast, 1), "batch": bs_c, "seq_len": seq,
        "speedup_vs_reencode": round(dt_slow / dt_fast, 2)}
    out["coca_b32_beam6"] = {"value": round(bs_c / dt_beam, 1), "batch": bs_c,
                             "seq_len": seq}

    # --- GenLIP-B/16 -------------------------------------------------------------
    from open_clip_tpu.models import genlip as G

    from open_clip_tpu.config import get_model_config

    gcfg = G.GenLipModelCfg.from_dict(get_model_config("naflexgenlip_b16"))
    gparams = convert_params_dtype(G.init_genlip(jax.random.PRNGKey(0), gcfg), jnp.bfloat16)
    bs_g = max(1, (bs or 64) // 4)
    ni = 256
    pdim = 16 * 16 * 3
    coord = np.stack([np.arange(ni) // 16, np.arange(ni) % 16], -1).astype(np.int32)
    gimage = {
        "patches": jnp.asarray(rng.standard_normal((bs_g, ni, pdim)) * 0.1, jnp.bfloat16),
        "patch_coord": jnp.asarray(np.broadcast_to(coord, (bs_g, ni, 2))),
        "patch_valid": jnp.asarray(np.ones((bs_g, ni), bool)),
    }
    g_fast = jax.jit(lambda p, img: G.generate(
        p, gcfg, img, seq_len=32, kv_cache=True, compute_dtype=jnp.bfloat16))
    g_slow = jax.jit(lambda p, img: G.generate(
        p, gcfg, img, seq_len=32, kv_cache=False, compute_dtype=jnp.bfloat16))
    dtg_fast = _time(g_fast, gparams, gimage)
    dtg_slow = _time(g_slow, gparams, gimage, iters=2)
    out["genlip_b16_greedy"] = {
        "value": round(bs_g / dtg_fast, 1), "batch": bs_g, "seq_len": 32,
        "image_tokens": ni, "speedup_vs_reencode": round(dtg_slow / dtg_fast, 2)}
    return out


def _make_bench_shards(root, n_shards=4, per_shard=1024, side=256, quality=85):
    """Synthetic webdataset tar shards: distinct JPEG photos (noise + gradient so
    JPEG entropy is realistic) + distinct captions. Cached across bench runs."""
    import io
    import os
    import tarfile

    from PIL import Image

    os.makedirs(root, exist_ok=True)
    paths = [os.path.join(root, f"shard-{i:05d}.tar") for i in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return os.path.join(root, f"shard-{{00000..{n_shards - 1:05d}}}.tar")
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:side, 0:side]
    base = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.float32) / (2 * side) * 255
    for si, p in enumerate(paths):
        with tarfile.open(p, "w") as tf:
            for j in range(per_shard):
                arr = np.clip(base + rng.normal(0, 40, (side, side, 3)), 0, 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, "JPEG", quality=quality)
                img_bytes = buf.getvalue()
                cap = f"a synthetic photo number {si * per_shard + j} of textured noise over a diagonal gradient".encode()
                for name, data in ((f"{j:06d}.jpg", img_bytes), (f"{j:06d}.txt", cap)):
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    return os.path.join(root, f"shard-{{00000..{n_shards - 1:05d}}}.tar")


def bench_input_pipeline():
    """END-TO-END input path (BASELINE north star): tar bytes -> JPEG decode ->
    uint8 canvas -> H2D -> fused on-device RandomResizedCrop + normalize -> ViT-B-32
    train step, with the host stage overlapped via background prefetch.

    Reference to beat: the torch DataLoader pipeline (data.py:694-948) feeding
    775 img/s/A100. Source images are 256 px (LAION-style pre-resized thumbnails)."""
    jax = _setup_jax()
    import itertools
    import os

    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.data.wds import WdsConfig, WdsPipeline, device_prefetch
    from open_clip_tpu.factory import get_tokenizer
    from open_clip_tpu.models import blocks
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step
    from open_clip_tpu.transform import (
        PreprocessCfg,
        make_device_train_preprocess,
        uint8_image_transform_v2,
    )

    import sys as _sys

    def _prog(msg):
        print(f"# input_pipeline: {msg}", file=_sys.stderr, flush=True)

    blocks.REMAT_POLICY = "names"  # flagship frontier config (see bench_flagship)
    blocks.SCAN_UNROLL = 1
    urls = _make_bench_shards("/root/repo/.bench_data", n_shards=8)
    _prog("shards ready")
    cfg = parse_model_cfg("ViT-B-32")
    pp_cfg = PreprocessCfg(size=224)
    u8 = uint8_image_transform_v2(pp_cfg, is_train=True)
    devpp = make_device_train_preprocess(pp_cfg)

    import jax as _jax
    from open_clip_tpu.models.clip import init_clip

    params = init_clip(_jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0), params,
                           const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, compute_dtype=jnp.bfloat16, remat=True,
                                          device_preprocess=devpp))

    # 512, not 1024: the tunnel's remote-compile helper crashes (HTTP 500, subprocess
    # exit 1) on this step's program at batch 1024 — bisected to batch size alone
    # (1024 fails with and without the fused device preprocess; 512 compiles and
    # runs). The e2e number is host-decode-bound on this box, so the device-side
    # batch does not move it; override via OPEN_CLIP_TPU_BENCH_E2E_BS on real pods.
    bs = int(os.environ.get("OPEN_CLIP_TPU_BENCH_E2E_BS", "512"))
    default_nw = max(1, min(4, (os.cpu_count() or 1) - 1)) if (os.cpu_count() or 1) > 1 else 1
    nw = int(os.environ.get("OPEN_CLIP_TPU_BENCH_WORKERS", str(default_nw)))
    # native C++ decode stage (in-library threads, no fork/IPC) when it builds;
    # OPEN_CLIP_TPU_BENCH_NATIVE=0 forces the PIL fork-worker tier for comparison
    nat = int(os.environ.get("OPEN_CLIP_TPU_BENCH_NATIVE", "1")) and (
        getattr(u8, "native_canvas", None) is not None)
    nat_threads = max(nw, os.cpu_count() or 1) if nat else 0
    tok = get_tokenizer("ViT-B-32")
    wds = WdsPipeline(
        WdsConfig(urls=urls, batch_size=bs, shuffle_shards=0, shuffle_samples=0,
                  num_workers=nw, resampled=False, native_decode_threads=nat_threads),
        u8, tok,
    )

    def epochs():
        for e in itertools.count():
            wds.set_epoch(e)
            yield from wds

    loader = device_prefetch(epochs(), depth=3)
    it = iter(loader)
    warmup, iters = 3, 10
    for i in range(warmup):
        batch = next(it)
        _prog(f"warmup batch {i} fetched")
        state, metrics = step(state, batch, _jax.random.PRNGKey(i))
        _prog(f"warmup step {i} dispatched")
    _ = np.asarray(metrics["loss"])
    _prog("warmup done")
    t0 = time.perf_counter()
    for i in range(iters):
        batch = next(it)
        state, metrics = step(state, batch, _jax.random.PRNGKey(warmup + i))
    loss = float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(loss)
    img_per_sec = bs / dt
    _prog(f"e2e measured {img_per_sec:.0f} img/s")

    # pipeline-balance record: host stage alone, and the fused device step alone
    # (device-resident batch) — e2e should sit at min(host, device) when overlapped
    wds.set_epoch(99)
    host_it = iter(wds)
    next(host_it)
    t0 = time.perf_counter()
    n_host = 3
    for _ in range(n_host):
        next(host_it)
    host_rate = n_host * bs / (time.perf_counter() - t0)

    rng = np.random.default_rng(0)
    dev_batch = {
        "image": _jax.device_put(rng.integers(0, 255, (bs, 256, 256, 3), np.uint8)),
        "text": _jax.device_put(rng.integers(0, 49407, (bs, 77)).astype(np.int32)),
    }
    state, metrics = step(state, dev_batch, _jax.random.PRNGKey(99))
    _ = np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(5):
        state, metrics = step(state, dev_batch, _jax.random.PRNGKey(100 + i))
    float(np.asarray(metrics["loss"]))
    dev_rate = bs / ((time.perf_counter() - t0) / 5)

    # H2D rate in-context (after compute has run). On the axon tunnel this
    # collapses from ~1.2 GB/s (fresh process) to ~40 MB/s, which caps e2e on
    # this bench host — a tunnel artifact, not a pipeline property; recorded so
    # the e2e number can be attributed (docs/ROUND3.md).
    h2d_buf = rng.integers(0, 255, (bs, 256, 256, 3), np.uint8)
    t0 = time.perf_counter()
    _jax.device_put(h2d_buf).block_until_ready()
    h2d_rate = h2d_buf.nbytes / (time.perf_counter() - t0) / 1e6

    return {
        "metric": "vit_b32_e2e_tar_to_chip_images_per_sec",
        "value": round(img_per_sec, 1),
        "unit": f"images/sec (real tar shards, JPEG decode + uint8 H2D + fused device RRC/normalize + train step, "
                f"{'native C++ decode, ' + str(nat_threads) + ' threads' if nat_threads else str(nw) + ' PIL decode worker(s)'}, {os.cpu_count()} host core(s))",
        "vs_baseline": round(img_per_sec / A100_ANCHOR_IMG_PER_SEC, 3),
        "host_stage_images_per_sec": round(host_rate, 1),
        "device_step_images_per_sec": round(dev_rate, 1),
        "h2d_mb_per_sec_in_context": round(h2d_rate, 1),
    }


def bench_input_pipeline_sweep():
    """Host-decode scaling protocol (VERDICT r4 item 5): host-stage img/s per
    decode-thread count, per-thread efficiency, and the cores needed to saturate
    one chip's train step. On this 1-core box the sweep is degenerate (1-2
    threads oversubscribe the single core) — the protocol and the arithmetic are
    what carry to pod hosts (LAION recipe: 224-core hosts feed 4 chips/host).

    The chip-saturation extrapolation separates the genuine host cost from the
    axon-tunnel H2D artifact: it uses the measured per-thread decode rate and the
    device-step rate from the suite file (device-resident batches), NOT the
    tunnel-capped e2e number."""
    import itertools
    import os

    from open_clip_tpu.data.wds import WdsConfig, WdsPipeline
    from open_clip_tpu.factory import get_tokenizer
    from open_clip_tpu.transform import PreprocessCfg, uint8_image_transform_v2

    urls = _make_bench_shards("/root/repo/.bench_data", n_shards=8)
    pp_cfg = PreprocessCfg(size=224)
    u8 = uint8_image_transform_v2(pp_cfg, is_train=True)
    tok = get_tokenizer("ViT-B-32")
    bs = 512
    cores = os.cpu_count() or 1
    native = getattr(u8, "native_canvas", None) is not None

    sweep = []
    threads = sorted({1, 2, 4, 8, cores, 2 * cores})
    threads = [t for t in threads if t <= max(2 * cores, 2)]
    for nt in threads:
        wds = WdsPipeline(
            WdsConfig(urls=urls, batch_size=bs, shuffle_shards=0, shuffle_samples=0,
                      num_workers=1 if native else nt, resampled=False,
                      native_decode_threads=nt if native else 0),
            u8, tok)

        def epochs(w=wds):
            for e in itertools.count():
                w.set_epoch(e)
                yield from w

        it = iter(epochs())
        next(it)  # warm the reader
        t0 = time.perf_counter()
        n_meas = 3
        for _ in range(n_meas):
            next(it)
        rate = n_meas * bs / (time.perf_counter() - t0)
        sweep.append({"decode_threads": nt, "images_per_sec": round(rate, 1)})
        del wds, it

    base = sweep[0]["images_per_sec"]
    for row in sweep:
        row["scaling_vs_1thread"] = round(row["images_per_sec"] / max(base, 1e-9), 2)

    # chip-saturation arithmetic from the suite's device-resident step rate
    dev_rate = None
    try:
        with open("/root/repo/docs/bench_suite.json") as fh:
            dev_rate = json.load(fh)["input_pipeline"].get("device_step_images_per_sec")
    except (OSError, ValueError, KeyError):
        pass
    per_thread = base  # on a 1-core box thread 1 == core 1; pods: measure per added core
    out = {
        "metric": "input_pipeline_host_decode_scaling",
        "unit": f"host-stage images/sec by decode-thread count ({'native C++ decode' if native else 'PIL'}, "
                f"{cores} host core(s), batch {bs}, 256px JPEG -> 224px uint8 canvas)",
        "sweep": sweep,
        "per_core_images_per_sec": round(per_thread, 1),
        "device_step_images_per_sec": dev_rate,
        "cores_to_saturate_one_chip_estimate": (
            round(dev_rate / max(per_thread, 1e-9), 1) if dev_rate else None),
        "note": "1-core box: threads >1 oversubscribe the core, so the sweep shows flat/declining "
                "scaling by construction; the per-core rate x pod-host cores (e.g. 112-224) vs one "
                "chip's step rate is the pod arithmetic. H2D over the axon tunnel (~40 MB/s "
                "in-context) is excluded on purpose - it is a bench-host artifact, not a pipeline "
                "property (pods feed chips over PCIe/DMA at GB/s).",
    }
    return out


SUITE = {
    "vit_b32": bench_flagship,
    "input_pipeline_sweep": bench_input_pipeline_sweep,
    "input_pipeline": bench_input_pipeline,
    "vit_l14": bench_vit_l14,
    "vit_h14": bench_vit_h14,
    "siglip_b16": bench_siglip,
    "naflex_b16": bench_naflex,
    "coca_b32": bench_coca,
    "genlip_b16": bench_genlip,
    "clap_htsat": bench_clap,
    "inference": bench_inference,
    "generation": bench_generation,
}


def _cached_flagship_fallback(reason: str):
    """Last measured flagship result from docs/bench_suite.json, explicitly
    labeled as cached — emitted only when the device cannot be reached at all,
    so the driver gets an attributable line instead of a hang."""
    try:
        with open("/root/repo/docs/bench_suite.json") as fh:
            res = dict(json.load(fh)["vit_b32"])
    except (OSError, ValueError, KeyError):
        res = {"metric": "vit_b32_clip_train_images_per_sec_per_chip", "value": None}
    res["stale_cached_result"] = True
    res["error"] = reason
    return res


def main():
    args = sys.argv[1:]
    if not args:
        import os

        try:
            _require_device(int(os.environ.get("OCT_BENCH_DEVICE_TIMEOUT_S", "240")))
        except RuntimeError as e:
            print(json.dumps(_cached_flagship_fallback(str(e))), flush=True)
            os._exit(0)  # the stuck device-init thread would block a normal exit
        print(json.dumps(bench_flagship()))
        return
    names = list(SUITE) if args[0] in ("--suite", "--all") else args
    results = {}
    try:  # merge partial runs into the existing suite file instead of clobbering it
        with open("/root/repo/docs/bench_suite.json") as fh:
            results = json.load(fh)
    except (OSError, ValueError):
        pass
    for name in names:
        try:
            res = SUITE[name]()
        except Exception as e:  # noqa: BLE001 — a broken config shouldn't kill the suite
            res = {"metric": name, "error": repr(e)[:300]}
            if name in results and "error" not in results[name]:
                # keep the last good measurement; record the failure alongside it
                results[name]["stale_error"] = res["error"]
                print(json.dumps(res), flush=True)
                continue
        results[name] = res
        print(json.dumps(res), flush=True)
    try:
        with open("/root/repo/docs/bench_suite.json", "w") as fh:
            json.dump(results, fh, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    main()
