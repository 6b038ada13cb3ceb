"""Extract the reference's pretrained-weights table into pretrained_data.json.

The (model, tag) -> {hub location, preprocess overrides} mapping is a constants
table (reference src/open_clip/pretrained.py:456-768); we carry it as data, keyed
the same way, with hub/url fields split from preprocess overrides.
"""

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/reference/src")

from reference_stubs import install_reference  # noqa: E402

install_reference()

from open_clip import pretrained as ref  # noqa: E402

NON_PREPROCESS = {"url", "hf_hub"}

out = {}
for model, tags in ref._PRETRAINED.items():
    out[model] = {}
    for tag, cfg in tags.items():
        entry = {}
        if cfg.get("hf_hub"):
            entry["hf_hub"] = cfg["hf_hub"]
        if cfg.get("url"):
            entry["url"] = cfg["url"]
        pp = {k: v for k, v in cfg.items() if k not in NON_PREPROCESS and v is not None}
        entry["preprocess_cfg"] = pp
        out[model][tag] = entry

path = "/root/repo/open_clip_tpu/pretrained_data.json"
with open(path, "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=False)
n_models = len(out)
n_tags = sum(len(v) for v in out.values())
print(f"wrote {path}: {n_models} models, {n_tags} (model, tag) pairs")
