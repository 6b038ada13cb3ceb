"""Extract model-architecture config data from the reference's model_configs/*.json
into a single combined JSON data file for the registry.

These are architecture hyperparameters (public data, required for pretrained-checkpoint
compatibility), merged into one file keyed by model name.

Usage: python scripts/gen_model_configs.py [ref_dir] [out_file]
"""

import json
import sys
from pathlib import Path

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/src/open_clip/model_configs")
OUT = Path(
    sys.argv[2] if len(sys.argv) > 2 else Path(__file__).parent.parent / "open_clip_tpu" / "model_configs_data.json"
)


def main():
    combined = {}
    for f in sorted(REF.glob("*.json")):
        with open(f) as fh:
            combined[f.stem] = json.load(fh)
    OUT.write_text(json.dumps(combined, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(combined)} model configs -> {OUT}")


if __name__ == "__main__":
    main()
