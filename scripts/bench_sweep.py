"""Sweep (remat policy, batch size, scan unroll) for the ViT-B-32 train-step bench
on the real TPU. Each config is timed like bench.py; failures (compiler OOM) are
caught and reported so the sweep continues.

Usage: python scripts/bench_sweep.py [policy:batch:unroll ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(policy: str, batch_size: int, unroll: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models import blocks
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step

    # policy "noremat" turns gradient checkpointing off entirely (save everything);
    # the other values select a jax.checkpoint policy inside remat=True
    use_remat = policy != "noremat"
    blocks.REMAT_POLICY = policy if use_remat else "none"
    blocks.SCAN_UNROLL = unroll

    cfg = parse_model_cfg("ViT-B-32")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0), params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, compute_dtype=jnp.bfloat16, remat=use_remat))

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
    return batch_size * iters / dt


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    combos = sys.argv[1:] or ["none:1024:1"]
    for combo in combos:
        policy, bs, unroll = combo.split(":")
        t0 = time.perf_counter()
        try:
            ips = run_one(policy, int(bs), int(unroll))
            print(json.dumps({"policy": policy, "batch": int(bs), "unroll": int(unroll),
                              "img_per_sec": round(ips, 1),
                              "wall_incl_compile_s": round(time.perf_counter() - t0, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping past compiler OOMs
            print(json.dumps({"policy": policy, "batch": int(bs), "unroll": int(unroll),
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)
