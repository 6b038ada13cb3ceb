"""Perf sweep for the ViT-B-32 train step on the real chip.

Usage: python scripts/perf_sweep.py <remat_mode> <batch> [unroll]
  remat_mode: full | names | dots_no_batch | off
Prints one line: img/s and step ms.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    remat_mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    unroll = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import os
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step
    from open_clip_tpu.models import blocks

    blocks.SCAN_UNROLL = unroll
    remat = True
    if remat_mode == "off":
        remat = False
    elif remat_mode == "names":
        blocks.REMAT_POLICY = "names"
    elif remat_mode == "names3":
        blocks.REMAT_POLICY = "names"
        blocks.REMAT_SAVE_NAMES = ("remat_ln1", "remat_attn_ctx", "remat_ln2")
    elif remat_mode == "dots_no_batch":
        blocks.REMAT_POLICY = "dots_no_batch"
    else:
        blocks.REMAT_POLICY = "none"

    cfg = parse_model_cfg("ViT-B-32")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0), params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, compute_dtype=jnp.bfloat16, remat=remat))

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((batch_size, 224, 224, 3)), dtype=jnp.bfloat16),
        "text": jnp.asarray(rng.integers(0, 49407, size=(batch_size, 77)), dtype=jnp.int32),
    }
    keys = [jax.random.PRNGKey(i) for i in range(16)]
    for i in range(2):
        state, metrics = step(state, batch, keys[i])
        _ = np.asarray(metrics["loss"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, keys[2 + i])
    loss = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    img_per_sec = batch_size * iters / dt
    print(f"remat={remat_mode} batch={batch_size} unroll={unroll}: "
          f"{img_per_sec:.1f} img/s  {dt / iters * 1000:.1f} ms/step")


if __name__ == "__main__":
    main()
