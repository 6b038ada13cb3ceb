"""Make the read-only reference (torch) package importable on this machine.

The reference soft-depends on ftfy/torchvision which are absent here; model math does
not touch them, so light stubs suffice for building reference models on CPU to generate
parity fixtures. Test-support code only — the framework itself never imports this.
"""

import importlib.machinery
import sys
import types

REFERENCE_SRC = "/root/reference/src"


def _mkmod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


def install_reference():
    if "open_clip" in sys.modules:
        return sys.modules["open_clip"]

    import torch

    if "ftfy" not in sys.modules:
        ftfy = _mkmod("ftfy")
        ftfy.fix_text = lambda x: x

    if "torchvision" not in sys.modules:
        tv = _mkmod("torchvision")
        ops = _mkmod("torchvision.ops")
        misc = _mkmod("torchvision.ops.misc")

        class FrozenBatchNorm2d(torch.nn.Module):
            pass

        misc.FrozenBatchNorm2d = FrozenBatchNorm2d
        tv.ops = ops
        ops.misc = misc

        class _Any:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return a[0] if a else None

            def __getattr__(self, n):
                return _Any()

        tvt = _mkmod("torchvision.transforms")
        tv.transforms = tvt
        for n in [
            "Normalize", "Compose", "RandomResizedCrop", "ToTensor", "Resize",
            "CenterCrop", "ColorJitter", "Grayscale", "RandomApply", "RandomGrayscale",
            "ToPILImage", "Lambda",
        ]:
            setattr(tvt, n, _Any())

        class InterpolationMode:
            BICUBIC = "bicubic"
            BILINEAR = "bilinear"
            NEAREST = "nearest"
            RANDOM = "random"

        tvt.InterpolationMode = InterpolationMode
        tvtf = _mkmod("torchvision.transforms.functional")
        tvt.functional = tvtf
        for n in ["resize", "center_crop", "pad", "crop", "to_tensor", "normalize"]:
            setattr(tvtf, n, _Any())

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import open_clip  # noqa: F401

    return sys.modules["open_clip"]
