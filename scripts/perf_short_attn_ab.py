"""A/B the short-attention kernel impls (v1 row-stacked vs v2 lane-masked) on chip.

Shapes are the production call sites: ViT-B-32 vision (L=50, W=768), CLIP text
(L=77, W=512, causal), SigLIP-B-16 vision (L=196), ViT-L-14 vision (L=257,
W=1024 — the tiled-grid path). fwd and fwd+bwd (jax.grad) per impl.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    import open_clip_tpu.ops.short_attention as sa

    rng = np.random.default_rng(0)

    def timeit(fn, args, iters=50, warmup=5):
        for _ in range(warmup):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / iters * 1e3

    shapes = [
        ("vision B256 L50  H12 hd64", 256, 50, 12, 64, False),
        ("text   B256 L77  H8  hd64", 256, 77, 8, 64, True),
        ("siglip B128 L196 H12 hd64", 128, 196, 12, 64, False),
        ("vit-l  B64  L257 H16 hd64", 64, 257, 16, 64, False),
    ]
    for tag, b, l, h, hd, causal in shapes:
        q, k, v = (jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.bfloat16)
                   for _ in range(3))
        print(f"== {tag}")
        outs = {}
        for impl in ("v1", "v2"):
            sa._IMPL = impl
            fwd = jax.jit(lambda q, k, v: sa.short_attention(q, k, v, causal=causal))
            grad = jax.jit(jax.grad(
                lambda q, k, v: (sa.short_attention(q, k, v, causal=causal)
                                 .astype(jnp.float32) ** 2).sum(), argnums=(0, 1, 2)))
            tf = timeit(fwd, (q, k, v))
            tg = timeit(grad, (q, k, v))
            outs[impl] = (np.asarray(fwd(q, k, v), np.float32),
                          [np.asarray(g, np.float32) for g in grad(q, k, v)])
            print(f"  {impl}  fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms")
        d = np.max(np.abs(outs["v1"][0] - outs["v2"][0]))
        dg = max(np.max(np.abs(a - b_)) for a, b_ in zip(outs["v1"][1], outs["v2"][1]))
        print(f"  max|v1-v2| fwd {d:.2e}  grad {dg:.2e}")


if __name__ == "__main__":
    main()
