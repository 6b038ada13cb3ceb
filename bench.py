"""Benchmark: ViT-B-32 CLIP contrastive train step, images/sec/chip on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the derived A100 anchor: ~775 images/sec/GPU for ViT-B-32
contrastive training incl. text tower (BASELINE.md, derived from reference
docs/PRETRAINED.md:32 — 32768 global batch / 128 GPUs / 36 h / 12.8B samples).
"""

import json
import time

import numpy as np

A100_ANCHOR_IMG_PER_SEC = 775.0


def main():
    import os

    import jax

    # compiles ride a slow remote-compile tunnel in this environment; persist them
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    import open_clip_tpu as oct
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step

    from open_clip_tpu.models import blocks

    blocks.SCAN_UNROLL = 2  # sweep result: unroll 2 edges out 1 (1150 vs 1141 img/s)

    cfg = parse_model_cfg("ViT-B-32")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0), params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, compute_dtype=jnp.bfloat16, remat=True))

    batch_size = 1024
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3)), dtype=jnp.bfloat16),
        "text": jnp.asarray(rng.integers(0, 49407, size=(batch_size, 77)), dtype=jnp.int32),
    }

    # warmup / compile (note: on the axon tunnel backend block_until_ready does not
    # actually synchronize; a host transfer of the scalar loss does)
    keys = [jax.random.PRNGKey(i) for i in range(16)]
    for i in range(2):
        state, metrics = step(state, batch, keys[i])
        _ = np.asarray(metrics["loss"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, keys[2 + i])
    loss = float(np.asarray(metrics["loss"]))  # device->host sync
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)

    img_per_sec = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "vit_b32_clip_train_images_per_sec_per_chip",
                "value": round(img_per_sec, 1),
                "unit": "images/sec/chip (bf16, batch 1024, incl. text tower + optimizer)",
                "vs_baseline": round(img_per_sec / A100_ANCHOR_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
