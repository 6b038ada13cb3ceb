"""Zero-shot metadata: ImageNet-1k classnames + OpenAI prompt templates.

Public prompt-engineering data (originally from openai/CLIP), stored as JSON
(``zero_shot_metadata_data.json``). Equivalent content to reference
``src/open_clip/zero_shot_metadata.py``; templates are stored with a ``{c}``
placeholder and exposed as callables to match the reference API.
"""

import json
from pathlib import Path

with open(Path(__file__).parent / "zero_shot_metadata_data.json") as _fh:
    _DATA = json.load(_fh)

IMAGENET_CLASSNAMES = tuple(_DATA["imagenet_classnames"])


def _to_callable(template: str):
    return lambda c, _t=template: _t.replace("{c}", c)


OPENAI_IMAGENET_TEMPLATES = tuple(_to_callable(t) for t in _DATA["openai_imagenet_templates"])
SIMPLE_IMAGENET_TEMPLATES = tuple(_to_callable(t) for t in _DATA["simple_imagenet_templates"])
