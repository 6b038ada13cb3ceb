"""Round-2 perf probe on the real TPU: remat-policy x batch sweep for ViT-B-32 train.

Usage: python scripts/perf_probe2.py [config ...]
Configs: matmul base1024 names1024 names512 noremat1024 noremat512 noremat256 fwd1024
Each prints one line: name img/s (and TFLOP/s where meaningful). Errors are caught
per-config so one compiler failure doesn't kill the sweep.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

VIT_B32_TRAIN_GFLOP_PER_IMG = 14.78  # fwd (img+txt) per image, reference model_profile.csv


def sync(x):
    return np.asarray(x)


def timeit(fn, n_warm=2, n_iter=10):
    for _ in range(n_warm):
        out = fn()
        sync(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    sync(out)
    dt = time.perf_counter() - t0
    return dt / n_iter


def run_matmul():
    import jax
    import jax.numpy as jnp

    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    f = jax.jit(lambda a, b: (a @ b).sum())
    t = timeit(lambda: f(a, b))
    tflops = 2 * n**3 / t / 1e12
    print(f"RESULT matmul: {tflops:.1f} TFLOP/s bf16 {n}x{n}", flush=True)


def run_train(name, batch_size, remat, policy):
    import jax
    import jax.numpy as jnp

    import open_clip_tpu  # noqa
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models import blocks
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import create_train_state, jit_train_step, make_train_step

    blocks.SCAN_UNROLL = 2
    blocks.REMAT_POLICY = policy

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
    keys = [jax.random.PRNGKey(i) for i in range(20)]
    i = [0]

    def one():
        nonlocal state
        i[0] += 1
        state, metrics = step(state, batch, keys[i[0] % 20])
        return metrics["loss"]

    # state is donated; must re-thread it, handled via nonlocal
    t = timeit(one)
    img_s = batch_size / t
    flop_mult = 4.0 if (remat and policy == "none") else 3.0
    tflops = img_s * VIT_B32_TRAIN_GFLOP_PER_IMG * flop_mult / 1e3
    print(
        f"RESULT {name}: {img_s:.1f} img/s  ({t*1e3:.1f} ms/step, ~{tflops:.0f} TFLOP/s at x{flop_mult})",
        flush=True,
    )


CONFIGS = {
    "matmul": run_matmul,
    "base1024": lambda: run_train("base1024", 1024, True, "none"),
    "names1024": lambda: run_train("names1024", 1024, True, "names"),
    "names512": lambda: run_train("names512", 512, True, "names"),
    "noremat1024": lambda: run_train("noremat1024", 1024, False, "none"),
    "noremat512": lambda: run_train("noremat512", 512, False, "none"),
    "noremat256": lambda: run_train("noremat256", 256, False, "none"),
}


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    names = sys.argv[1:] or ["matmul", "base1024", "names1024", "noremat512", "names512", "noremat256"]
    for n in names:
        t0 = time.perf_counter()
        try:
            CONFIGS[n]()
        except Exception as e:  # noqa: BLE001
            print(f"RESULT {n}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        print(f"  [{n} took {time.perf_counter()-t0:.0f}s total incl. compile]", flush=True)


if __name__ == "__main__":
    main()
