"""Batch/unroll frontier probe for any suite config's train step on the real TPU.

Generalizes scripts/bench_sweep.py (which is ViT-B-32-only) so the per-chip batch
frontier can be swept for the other suite models. Each combo is timed like
bench.py; compile failures (compiler OOM at large saved-activation footprints)
are caught and reported so the sweep continues.

Usage: python scripts/bench_frontier.py model=ViT-L-14 loss=clip ctx=77 vocab=49408 \
           [iters=5] combo... where combo = batch:unroll

Suite mode probes any bench.py suite entry through its exact bench code path
(model/optimizer/batch builder included) at overridden batch sizes:

    python scripts/bench_frontier.py suite=vit_h14 32 48 96
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(model: str, loss: str, ctx: int, vocab: int, batch_size: int,
            unroll: int, iters: int, policy: str = "none") -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models import blocks
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step

    blocks.SCAN_UNROLL = unroll
    blocks.REMAT_POLICY = policy
    cfg = parse_model_cfg(model)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0), params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    step = jit_train_step(make_train_step(cfg, opt, loss_type=loss,
                                          compute_dtype=jnp.bfloat16, remat=True))

    rng = np.random.default_rng(0)
    image_size = cfg.vision_cfg.image_size
    batch = {
        "image": jnp.asarray(rng.standard_normal((batch_size, image_size, image_size, 3)), dtype=jnp.bfloat16),
        "text": jnp.asarray(rng.integers(0, vocab - 1, size=(batch_size, ctx)), dtype=jnp.int32),
    }
    keys = [jax.random.PRNGKey(i) for i in range(iters + 2)]
    for i in range(2):
        state, metrics = step(state, batch, keys[i])
        _ = np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, keys[2 + i])
    loss_val = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss_val)
    return batch_size * iters / dt


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    kw = {"model": "ViT-L-14", "loss": "clip", "ctx": 77, "vocab": 49408, "iters": 5,
          "policy": "none"}
    combos = []
    for arg in sys.argv[1:]:
        if "=" in arg:
            k, v = arg.split("=", 1)
            kw[k] = int(v) if k in ("ctx", "vocab", "iters") else v
        else:
            combos.append(arg)
    combos = combos or ["256:1"]

    if "suite" in kw:
        import bench

        fn = bench.SUITE[kw["suite"]]
        for combo in combos:
            bs = int(combo.split(":")[0])
            try:
                res = fn(bs=bs)
                print(json.dumps({"suite": kw["suite"], "batch": bs,
                                  "value": res["value"], "unit": res["unit"],
                                  **{k: res[k] for k in ("mfu", "hfu") if k in res}}),
                      flush=True)
            except Exception as e:  # noqa: BLE001 — keep sweeping past compiler OOMs
                print(json.dumps({"suite": kw["suite"], "batch": bs,
                                  "error": f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)
        sys.exit(0)
    for combo in combos:
        bs, unroll = (combo.split(":") + ["1"])[:2]
        t0 = time.perf_counter()
        try:
            ips = run_one(kw["model"], kw["loss"], kw["ctx"], kw["vocab"], int(bs), int(unroll),
                          kw["iters"], kw["policy"])
            print(json.dumps({"model": kw["model"], "policy": kw["policy"],
                              "batch": int(bs), "unroll": int(unroll),
                              "img_per_sec": round(ips, 1),
                              "wall_incl_compile_s": round(time.perf_counter() - t0, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping past compiler OOMs
            print(json.dumps({"model": kw["model"], "batch": int(bs), "unroll": int(unroll),
                              "error": f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)
