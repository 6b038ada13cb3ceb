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

    if "torchlibrosa" not in sys.modules:
        _install_torchlibrosa_stub(torch)

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import open_clip  # noqa: F401

    return sys.modules["open_clip"]


def _install_torchlibrosa_stub(torch):
    """Functional torchlibrosa equivalents (Spectrogram / LogmelFilterBank /
    SpecAugmentation) built on torch.stft + our own librosa-convention mel filterbank,
    so the reference HTSAT runs for parity tests. The mel-frontend math itself is
    validated separately (tests/test_audio_ops.py)."""
    import numpy as np

    tl = _mkmod("torchlibrosa")
    stft_mod = _mkmod("torchlibrosa.stft")
    aug_mod = _mkmod("torchlibrosa.augmentation")
    tl.stft = stft_mod
    tl.augmentation = aug_mod

    from open_clip_tpu.ops.audio import mel_filter_bank

    class Spectrogram(torch.nn.Module):
        def __init__(self, n_fft=1024, hop_length=480, win_length=None, window="hann",
                     center=True, pad_mode="reflect", power=2.0, freeze_parameters=True):
            super().__init__()
            self.n_fft, self.hop, self.win = n_fft, hop_length, win_length or n_fft
            self.center, self.pad_mode, self.power = center, pad_mode, power

        def forward(self, x):
            spec = torch.stft(
                x, self.n_fft, self.hop, win_length=self.win,
                window=torch.hann_window(self.win), center=self.center,
                pad_mode=self.pad_mode, return_complex=True,
            )
            mag = spec.abs() ** self.power  # (B, F, T)
            return mag.transpose(1, 2)[:, None]  # (B, 1, T, F)

    class LogmelFilterBank(torch.nn.Module):
        def __init__(self, sr=48000, n_fft=1024, n_mels=64, fmin=50, fmax=14000,
                     ref=1.0, amin=1e-10, top_db=None, freeze_parameters=True):
            super().__init__()
            self.melW = torch.from_numpy(
                np.ascontiguousarray(mel_filter_bank(sr, n_fft, n_mels, fmin, fmax).T)
            )
            self.ref, self.amin, self.top_db = ref, amin, top_db

        def forward(self, x):
            mel = torch.matmul(x, self.melW.to(x.dtype))
            db = 10.0 * torch.log10(torch.clamp(mel, min=self.amin))
            db -= 10.0 * np.log10(max(self.amin, self.ref))
            if self.top_db is not None:
                db = torch.clamp(db, min=db.max().item() - self.top_db)
            return db

    class SpecAugmentation(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()

        def forward(self, x):
            return x  # train-only; parity tests run eval

    stft_mod.Spectrogram = Spectrogram
    stft_mod.LogmelFilterBank = LogmelFilterBank
    aug_mod.SpecAugmentation = SpecAugmentation
