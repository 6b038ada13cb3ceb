"""Generate docs/model_profile.csv (params + XLA-counted GFLOPs per model),
mirroring the reference's docs/model_profile.csv artifact.

Usage: python scripts/gen_model_profile.py [model ...]
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from open_clip_tpu.train.profiler import profile_models  # noqa: E402

DEFAULT = [
    "ViT-S-32", "ViT-B-32", "ViT-B-16", "ViT-L-14", "ViT-L-14-336",
    "ViT-H-14", "ViT-g-14", "ViT-bigG-14",
    "RN50", "RN101",
    "ViT-B-16-SigLIP", "ViT-SO400M-14-SigLIP",
    "coca_ViT-B-32", "coca_ViT-L-14",
    "moderntext-ViT-B-32-256",
    "naflexgenlip_b16",
    "CLAP-HTSAT-tiny",
    "MobileCLIP2-S0", "MobileCLIP-S2", "MobileCLIP-B",
    "ViTamin-S", "ViTamin-B", "ViTamin-L", "ViTamin-XL-256",
    "PE-Core-B-16", "PE-Core-L-14-336", "PE-Core-bigG-14-448",
    "EVA02-L-14", "convnext_base",
]

if __name__ == "__main__":
    names = sys.argv[1:] or DEFAULT
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "model_profile.csv")
    print(profile_models(names, out_csv=out))
