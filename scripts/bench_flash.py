"""Flash kernel vs XLA dense attention on real TPU: fwd and fwd+bwd, long seqs.

Usage: python scripts/bench_flash.py [seq ...]   (default 512 1024 2048 4096)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def sync(x):
    return np.asarray(x)


def timeit(fn, n_warm=2, n_iter=10):
    for _ in range(n_warm):
        sync(fn())
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from open_clip_tpu.ops.attention import dot_product_attention
    from open_clip_tpu.ops.flash_attention import flash_attention

    seqs = [int(s) for s in sys.argv[1:]] or [512, 1024, 2048, 4096]
    hd, h = 64, 12
    for l in seqs:
        b = max(1, 2 ** 22 // (l * h * hd))  # keep total elements ~constant
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
        flops_fwd = 4 * b * h * l * l * hd

        for causal in (False, True):
            for name, impl in (("xla", "xla"), ("flash", "flash")):
                def fwd(q=q, k=k, v=v, impl=impl, causal=causal):
                    if impl == "flash":
                        return flash_attention(q, k, v, causal=causal)
                    return dot_product_attention(q, k, v, causal=causal, impl="xla")

                f = jax.jit(lambda q, k, v: fwd(q, k, v).astype(jnp.float32).sum())
                gf = jax.jit(jax.grad(lambda q, k, v: fwd(q, k, v).astype(jnp.float32).sum(),
                                      argnums=(0, 1, 2)))
                try:
                    tf = timeit(lambda: f(q, k, v))
                    tg = timeit(lambda: gf(q, k, v)[0])
                    print(f"RESULT l={l} b={b} causal={int(causal)} {name}: "
                          f"fwd {tf*1e3:7.2f} ms ({flops_fwd/tf/1e12:5.1f} TF/s)  "
                          f"fwd+bwd {tg*1e3:7.2f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"RESULT l={l} causal={int(causal)} {name}: FAILED {str(e)[:200]}",
                          flush=True)


if __name__ == "__main__":
    main()
