"""Component-level timing probe for the ViT-B-32 train step on the real chip.

Times: image tower fwd / fwd+bwd, text tower fwd / fwd+bwd, full step at two batch
sizes (dispatch-latency check). Usage: python scripts/perf_probe.py [probe ...]
"""
import sys
import time

import numpy as np


def bench(fn, args, iters=10, warmup=2, sync=None):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000


def _force(out):
    leaf = None
    import jax
    for x in jax.tree.leaves(out):
        leaf = x
    if leaf is not None:
        np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


def main():
    import os
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import init_clip, clip_forward
    from open_clip_tpu.models.vit import apply_vision_tower
    from open_clip_tpu.models.text import apply_text_tower
    from open_clip_tpu.models import blocks

    blocks.SCAN_UNROLL = 2
    which = set(sys.argv[1:]) or {"img_fwd", "img_bwd", "txt_fwd", "txt_bwd", "small_batch"}

    cfg = parse_model_cfg("ViT-B-32")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    B = 1024
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), dtype=jnp.bfloat16)
    txt = jnp.asarray(rng.integers(0, 49407, size=(B, 77)), dtype=jnp.int32)

    act = "quick_gelu" if cfg.quick_gelu else "gelu"

    @jax.jit
    def img_fwd(p, x):
        pooled, _ = apply_vision_tower(p["visual"], cfg.vision_cfg, x,
                                       compute_dtype=jnp.bfloat16, act=act)
        return pooled.sum()

    @jax.jit
    def img_bwd(p, x):
        def f(pp):
            pooled, _ = apply_vision_tower(pp["visual"], cfg.vision_cfg, x,
                                           compute_dtype=jnp.bfloat16, remat=True, act=act)
            return pooled.astype(jnp.float32).sum()
        return jax.grad(f)(p)

    

    @jax.jit
    def txt_fwd(p, t):
        pooled, _ = apply_text_tower(p["text"], cfg.text_cfg, t, compute_dtype=jnp.bfloat16)
        return pooled.sum()

    @jax.jit
    def txt_bwd(p, t):
        def f(pp):
            pooled, _ = apply_text_tower(pp["text"], cfg.text_cfg, t,
                                         compute_dtype=jnp.bfloat16, remat=True)
            return pooled.astype(jnp.float32).sum()
        return jax.grad(f)(p)

    GF_IMG_FWD = 4.37 * B  # GFLOPs per fwd at batch B (open_clip profile)
    GF_TXT_FWD = 2.93 * B

    if "img_fwd" in which:
        ms = bench(img_fwd, (params, img))
        print(f"img_fwd:  {ms:7.1f} ms  {GF_IMG_FWD / ms:6.1f} TF/s-equiv")
    if "img_bwd" in which:
        ms = bench(img_bwd, (params, img))
        print(f"img_bwd(remat): {ms:7.1f} ms  {GF_IMG_FWD * 4 / ms:6.1f} TF/s-equiv(4x)")
    if "txt_fwd" in which:
        ms = bench(txt_fwd, (params, txt))
        print(f"txt_fwd:  {ms:7.1f} ms  {GF_TXT_FWD / ms:6.1f} TF/s-equiv")
    if "txt_bwd" in which:
        ms = bench(txt_bwd, (params, txt))
        print(f"txt_bwd(remat): {ms:7.1f} ms  {GF_TXT_FWD * 4 / ms:6.1f} TF/s-equiv(4x)")

    if "small_batch" in which:
        img256 = img[:256]
        ms = bench(img_fwd, (params, img256))
        print(f"img_fwd@256: {ms:7.1f} ms (dispatch-latency check; expect ~1/4 of @1024)")


if __name__ == "__main__":
    main()
