"""Micro-bench attention variants at CLIP shapes on the real chip.

(B, L, H, hd) = (1024, 50, 12, 64): xla dense | pallas flash (existing kernel,
gates bypassed) | fwd+bwd for both.
"""
import functools
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def bench(fn, args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import os
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from open_clip_tpu.ops.attention import dot_product_attention
    from open_clip_tpu.ops.flash_attention import flash_attention

    B, L, H, hd = 1024, 50, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.bfloat16)

    xla = jax.jit(functools.partial(dot_product_attention, impl="xla"))
    fl = jax.jit(lambda a, b, c: flash_attention(a, b, c))

    def loss_x(a, b, c):
        return dot_product_attention(a, b, c, impl="xla").astype(jnp.float32).sum()

    def loss_f(a, b, c):
        return flash_attention(a, b, c).astype(jnp.float32).sum()

    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))

    gf_ms = None
    print(f"xla fwd:   {bench(xla, (q, k, v)):7.2f} ms  (12 layers -> x12)")
    try:
        print(f"flash fwd: {bench(fl, (q, k, v)):7.2f} ms")
    except Exception as e:
        print("flash fwd failed:", repr(e)[:200])
    print(f"xla fwd+bwd:   {bench(gx, (q, k, v)):7.2f} ms")
    try:
        print(f"flash fwd+bwd: {bench(gf, (q, k, v)):7.2f} ms")
    except Exception as e:
        print("flash bwd failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
