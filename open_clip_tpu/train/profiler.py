"""Static model profiler: params + FLOPs per model (reference ``src/open_clip_train/profiler.py``).

FLOPs come from XLA's own cost analysis of the lowered forward (the compiler's count,
strictly more faithful than the reference's fvcore/flop_counter estimates); params are
counted from the tree. Emits the same CSV schema as the reference's model_profile.csv.
"""

from __future__ import annotations

import csv
import io
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))


def abstract_params(model_name: str):
    """Shape-only params via eval_shape — no memory or RNG cost even for ViT-bigG."""
    from ..config import parse_model_cfg
    from ..models.clip import init_clip

    cfg = parse_model_cfg(model_name)
    shapes = jax.eval_shape(lambda k: init_clip(k, cfg), jax.random.PRNGKey(0))
    return cfg, shapes


def _flops_of(fn, *args) -> Optional[float]:
    from ..models import blocks as B

    # fully unroll scanned depth loops so every layer's FLOPs are counted
    prev = B.SCAN_UNROLL
    B.SCAN_UNROLL = 64
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.cost_analysis()
        if analysis is None:  # some backends only expose post-compile analysis
            analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:  # noqa: BLE001 — cost analysis is backend-dependent
        return None
    finally:
        B.SCAN_UNROLL = prev


def profile_model(model_name: str, batch_size: int = 1, force_custom_text: bool = False) -> Dict[str, Any]:
    """-> {model, image_size, image_width, text_width, embed_dim, params_m, image_params_m,
    text_params_m, gflops, image_gflops, text_gflops} (reference profiler.py:131-208)."""
    from ..models.clip import encode_image, encode_text

    cfg, params = abstract_params(model_name)

    row: Dict[str, Any] = {"model": model_name}
    total_p = count_params(params)
    row["params (M)"] = round(total_p / 1e6, 2)

    img_gflops = txt_gflops = None
    if getattr(cfg, "vision_cfg", None) is not None and "visual" in params:
        vcfg = cfg.vision_cfg
        size = vcfg.image_size if isinstance(vcfg.image_size, int) else vcfg.image_size[0]
        row["image_size"] = size
        row["image params (M)"] = round(count_params(params["visual"]) / 1e6, 2)
        img = jnp.zeros((batch_size, size, size, 3), jnp.float32)
        img_gflops = _flops_of(lambda p, x: encode_image(p, cfg, x), params, img)
    if getattr(cfg, "text_cfg", None) is not None and "text" in params:
        tcfg = cfg.text_cfg
        row["text params (M)"] = round(count_params(params["text"]) / 1e6, 2)
        txt = jnp.ones((batch_size, tcfg.context_length), jnp.int32)
        txt_gflops = _flops_of(lambda p, t: encode_text(p, cfg, t), params, txt)

    # CoCa-style models run a multimodal decoder on top of the two towers; the
    # reference's total comes from the FULL forward (profiler.py:200-202 profiles
    # ``model(image, text)``), so sum-of-towers undercounts. Profile the full
    # coca_forward for the total in that case (round-3 fix: coca_ViT-B-32 is
    # 33.3 GF total, not the 15.4 GF tower sum).
    total_gflops = None
    if "text_decoder" in params and img_gflops is not None and txt_gflops is not None:
        from ..models.coca import coca_forward

        size = row["image_size"]
        img = jnp.zeros((batch_size, size, size, 3), jnp.float32)
        txt = jnp.ones((batch_size, cfg.text_cfg.context_length), jnp.int32)
        total_gflops = _flops_of(
            lambda p, x, t: coca_forward(p, cfg, x, t), params, img, txt
        )
    if total_gflops is None and img_gflops is not None and txt_gflops is not None:
        total_gflops = img_gflops + txt_gflops

    if img_gflops is not None:
        row["image GFLOPs"] = round(img_gflops / 1e9 / batch_size, 2)
    if txt_gflops is not None:
        row["text GFLOPs"] = round(txt_gflops / 1e9 / batch_size, 2)
    if total_gflops is not None:
        row["GFLOPs"] = round(total_gflops / 1e9 / batch_size, 2)
    row["embed_dim"] = getattr(cfg, "embed_dim", None)
    return row


def profile_models(model_names, out_csv: Optional[str] = None) -> str:
    rows = []
    for name in model_names:
        try:
            rows.append(profile_model(name))
        except Exception as e:  # noqa: BLE001 — skip unbuildable configs, keep profiling
            rows.append({"model": name, "error": str(e)[:80]})
    cols: list = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    buf = io.StringIO()
    w = csv.DictWriter(buf, fieldnames=cols)
    w.writeheader()
    for r in rows:
        w.writerow(r)
    out = buf.getvalue()
    if out_csv:
        with open(out_csv, "w") as fh:
            fh.write(out)
    return out


if __name__ == "__main__":
    import sys

    names = sys.argv[1:] or ["ViT-B-32", "ViT-B-16", "ViT-L-14"]
    print(profile_models(names))
