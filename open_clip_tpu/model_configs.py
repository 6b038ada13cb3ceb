"""Built-in model-config registry data.

Architecture hyperparameters for the full model inventory (same registry surface as the
reference's ``model_configs/`` directory scan, reference ``src/open_clip/factory.py:46-72``),
stored as one combined JSON data file. Models whose towers are not yet implemented natively
raise a clear error at build time, not at registry time.
"""

import json
from pathlib import Path

_DATA_FILE = Path(__file__).parent / "model_configs_data.json"

with open(_DATA_FILE) as _fh:
    BUILTIN_MODEL_CONFIGS = json.load(_fh)
