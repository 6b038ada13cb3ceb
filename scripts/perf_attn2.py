"""Head-to-head attention impls at the flagship step's exact shapes (real chip).

vision: (256, 50, 12, 64) non-causal — short pallas vs xla dense
text:   (256, 77,  8, 64) causal    — short pallas (in-kernel causal) vs xla
                                      native-causal vs xla additive-bias (current)
fwd and fwd+bwd(sum-loss) for each.
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def bench(fn, args, iters=30, warmup=5):
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
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from open_clip_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(0)

    def qkv(b, l, h, hd):
        return tuple(jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
                     for _ in range(3))

    def report(tag, fn, args):
        try:
            fwd = bench(jax.jit(fn), args)
        except Exception as e:
            print(f"{tag:34s} FAILED: {repr(e)[:120]}")
            return
        def loss(*a):
            return fn(*a).astype(jnp.float32).sum()
        bwd = bench(jax.jit(jax.grad(loss, argnums=(0, 1, 2))), args)
        print(f"{tag:34s} fwd {fwd:7.3f} ms   fwd+bwd {bwd:7.3f} ms")

    NEG = float(jnp.finfo(jnp.float32).min) * 0.5

    print("== vision (256, 50, 12, 64) non-causal ==")
    args = qkv(256, 50, 12, 64)
    report("short pallas", functools.partial(dot_product_attention, impl="short"), args)
    report("xla dense", functools.partial(dot_product_attention, impl="xla"), args)

    print("== text (256, 77, 8, 64) causal ==")
    args = qkv(256, 77, 8, 64)
    report("short pallas causal",
           functools.partial(dot_product_attention, impl="short", causal=True), args)
    report("xla native causal",
           functools.partial(dot_product_attention, impl="xla", causal=True), args)
    bias = jnp.where(jnp.tril(jnp.ones((77, 77), dtype=bool)), 0.0, NEG
                     ).astype(jnp.float32)[None, None]
    report("xla additive bias (current)",
           lambda q, k, v: dot_product_attention(q, k, v, impl="xla", bias=bias), args)


if __name__ == "__main__":
    main()
