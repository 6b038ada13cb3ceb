"""Ablate the ViT-B-32 image-tower forward to find the non-matmul time sink.

Variants: full | noattn (attention core = identity on v) | noln (layer_norm = cast only)
| relu (act=relu) | noattn_noln. Usage: python scripts/perf_ablate.py [variant ...]
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np


def main():
    import os
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import init_clip
    from open_clip_tpu.models.vit import apply_vision_tower
    from open_clip_tpu.models import blocks as Bmod
    from open_clip_tpu.ops import attention as attn_mod

    Bmod.SCAN_UNROLL = 2
    variants = sys.argv[1:] or ["full", "noattn", "noln", "relu", "noattn_noln"]

    cfg = parse_model_cfg("ViT-B-32")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    B = 1024
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), dtype=jnp.bfloat16)

    real_dpa = attn_mod.dot_product_attention
    real_ln = None
    import open_clip_tpu.ops.layers as layers_mod
    real_ln = layers_mod.layer_norm

    def fake_dpa(q, k, v, **kw):
        return v

    def fake_ln(x, scale, bias, eps=1e-5):
        return x

    def run(variant):
        act = "gelu"
        if "noattn" in variant:
            attn_mod.dot_product_attention = fake_dpa
        if "noln" in variant:
            layers_mod.layer_norm = fake_ln
            Bmod.layer_norm = fake_ln
            import open_clip_tpu.models.vit as vit_mod
            vit_mod.layer_norm = fake_ln
            attn_mod.layer_norm = fake_ln
        if variant == "relu":
            act = "relu"
        try:
            @jax.jit
            def fwd(p, x):
                pooled, _ = apply_vision_tower(p["visual"], cfg.vision_cfg, x,
                                               compute_dtype=jnp.bfloat16, act=act)
                return pooled.sum()

            for _ in range(2):
                out = fwd(params, img)
            np.asarray(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(params, img)
            np.asarray(out)
            ms = (time.perf_counter() - t0) / 10 * 1000
            print(f"{variant:14s}: {ms:7.1f} ms")
        finally:
            attn_mod.dot_product_attention = real_dpa
            layers_mod.layer_norm = real_ln
            Bmod.layer_norm = real_ln
            import open_clip_tpu.models.vit as vit_mod
            vit_mod.layer_norm = real_ln
            attn_mod.layer_norm = real_ln

    for v in variants:
        run(v)


if __name__ == "__main__":
    main()
