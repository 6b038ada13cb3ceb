"""End-to-end training smoke tests through the real CLI with synthetic data
(reference tests/test_training_simple.py:11-64)."""

import os

import numpy as np
import pytest

import open_clip_tpu as oct
from open_clip_tpu.train.main import main

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32, "heads": 2, "layers": 2},
}


@pytest.fixture(scope="module", autouse=True)
def tiny_model():
    if "tiny-smoke-vit" not in oct.list_models():
        oct.add_model_config(dict(TINY), name="tiny-smoke-vit")


def test_training_synthetic_smoke(tmp_path):
    state = main(
        [
            "--model", "tiny-smoke-vit",
            "--dataset-type", "synthetic",
            "--train-num-samples", "32",
            "--batch-size", "8",
            "--epochs", "2",
            "--lr", "1e-3",
            "--warmup", "2",
            "--precision", "fp32",
            "--logs", str(tmp_path),
            "--name", "smoke",
            "--save-frequency", "1",
            "--zeroshot-frequency", "100",
        ]
    )
    assert int(state.step) == 8  # 4 steps/epoch x 2 epochs
    assert (tmp_path / "smoke" / "checkpoints" / "epoch_2").exists()
    assert (tmp_path / "smoke" / "params.txt").exists()


def test_training_resume_latest(tmp_path):
    common = [
        "--model", "tiny-smoke-vit",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "8",
        "--lr", "1e-3",
        "--warmup", "1",
        "--precision", "fp32",
        "--logs", str(tmp_path),
        "--name", "resume-test",
        "--zeroshot-frequency", "100",
    ]
    main(common + ["--epochs", "1"])
    state = main(common + ["--epochs", "2", "--resume", "latest"])
    assert int(state.step) == 4  # resumed from epoch 1 (2 steps), +2 more


def test_training_siglip_and_accum(tmp_path):
    state = main(
        [
            "--model", "tiny-smoke-vit",
            "--dataset-type", "synthetic",
            "--train-num-samples", "16",
            "--batch-size", "8",
            "--epochs", "1",
            "--lr", "1e-3",
            "--warmup", "1",
            "--precision", "fp32",
            "--logs", str(tmp_path),
            "--name", "smoke-accum",
            "--accum-freq", "2",
            "--grad-checkpointing",
            "--zeroshot-frequency", "100",
        ]
    )
    assert int(state.step) == 2


def test_training_naflex_synthetic(tmp_path):
    """NaFlex token-budget training end-to-end through the CLI (variable seq buckets
    compile to a small closed shape set)."""
    if "tiny-smoke-naflex" not in oct.list_models():
        oct.add_model_config(
            {
                "embed_dim": 32,
                "custom_text": True,
                "vision_cfg": {
                    "image_size": 64,
                    "timm_model_name": "naflexvit_tiny_patch16_map",
                    "timm_model_kwargs": {"pos_embed_grid_size": [4, 4]},
                },
                "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 32, "heads": 2, "layers": 2},
            },
            name="tiny-smoke-naflex",
        )
    state = main(
        [
            "--model", "tiny-smoke-naflex",
            "--dataset-type", "synthetic-naflex",
            "--train-num-samples", "32",
            "--batch-size", "8",
            "--naflex-seq-lens", "16", "32",
            "--naflex-max-tokens", "256",
            "--naflex-batch-divisor", "8",
            "--epochs", "1",
            "--lr", "1e-3",
            "--warmup", "1",
            "--precision", "fp32",
            "--logs", str(tmp_path),
            "--name", "smoke-naflex",
            "--zeroshot-frequency", "100",
        ]
    )
    assert int(state.step) == 4
