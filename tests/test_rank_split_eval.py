"""Rank-split evaluation (VERDICT r3 item 4): 2 processes each evaluate HALF the
val/imagenet data and reach the same global metrics as a single-process run.

The reference replicates eval on every rank (or sampler-splits + all_reduce,
src/open_clip_train/zero_shot.py:54-109); here the loaders stride-split by
``process_index`` (``CsvDataset``/``make_imagenet_val``), the scalar sums cross
with ``host_psum`` and the paired feature matrices reassemble in global order
with ``host_gather_stride`` before retrieval ranking.
"""

import json
import re
import socket
import subprocess
import sys
import textwrap
from types import SimpleNamespace

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16,
                   "head_width": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 32,
                 "heads": 2, "layers": 2},
}

EVAL_BODY = textwrap.dedent("""
    import numpy as np
    import open_clip_tpu as oct
    from open_clip_tpu.data.datasets import get_data, make_imagenet_val
    from open_clip_tpu.train.train_loop import evaluate
    from open_clip_tpu.train.zero_shot import run_zero_shot_classifier
    from types import SimpleNamespace

    oct.add_model_config({cfg}, name="rse-tiny")
    model, _, pp_val = oct.create_model_and_transforms("rse-tiny", precision="fp32")
    tok = oct.get_tokenizer("rse-tiny")
    args = {{"val_data": DATA + "/val.csv", "dataset_type": "csv", "batch_size": 4,
             "world_size": WORLD, "rank": RANK, "seed": 0}}
    data = get_data(args, (None, pp_val), tokenizer=tok)
    metrics = evaluate(model, data, 1, SimpleNamespace(val_retrieval_chunk_size=None))

    info = make_imagenet_val(DATA + "/imagenet", pp_val, 4,
                             world_size=WORLD, rank=RANK)
    clf = np.random.default_rng(5).standard_normal((32, 2)).astype(np.float32)
    clf /= np.linalg.norm(clf, axis=0, keepdims=True)
    zs = run_zero_shot_classifier(model, clf, info.dataloader)
    out = {{k: float(v) for k, v in {{**metrics, **zs}}.items()}}
    import json as _json
    print("METRICS " + _json.dumps(out), flush=True)
""")

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from open_clip_tpu.parallel.distributed import init_distributed
    RANK, WORLD = init_distributed({coord!r}, 2, int(sys.argv[1]))
    DATA = sys.argv[2]
""")


def _make_data(root):
    from PIL import Image

    rng = np.random.default_rng(0)
    (root / "imgs").mkdir()
    rows = ["filepath\ttitle"]
    for i in range(22):  # odd batch tail on purpose (22 = 5*4 + 2)
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        p = root / "imgs" / f"{i:03d}.png"
        Image.fromarray(arr).save(p)
        rows.append(f"{p}\ta photo number {i}")
    (root / "val.csv").write_text("\n".join(rows) + "\n")
    for ci, cls in enumerate(["n01", "n02"]):
        d = root / "imagenet" / cls
        d.mkdir(parents=True)
        for j in range(6 + ci):  # unequal class sizes -> ragged rank slices
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{j}.png")


def _single_process_metrics(root):
    import open_clip_tpu as oct
    from open_clip_tpu.data.datasets import get_data, make_imagenet_val
    from open_clip_tpu.train.train_loop import evaluate
    from open_clip_tpu.train.zero_shot import run_zero_shot_classifier

    if "rse-tiny" not in oct.list_models():
        oct.add_model_config(TINY_CFG, name="rse-tiny")
    model, _, pp_val = oct.create_model_and_transforms("rse-tiny", precision="fp32")
    tok = oct.get_tokenizer("rse-tiny")
    args = {"val_data": str(root / "val.csv"), "dataset_type": "csv",
            "batch_size": 4, "world_size": 1, "rank": 0, "seed": 0}
    data = get_data(args, (None, pp_val), tokenizer=tok)
    metrics = evaluate(model, data, 1, SimpleNamespace(val_retrieval_chunk_size=None))
    info = make_imagenet_val(str(root / "imagenet"), pp_val, 4)
    clf = np.random.default_rng(5).standard_normal((32, 2)).astype(np.float32)
    clf /= np.linalg.norm(clf, axis=0, keepdims=True)
    zs = run_zero_shot_classifier(model, clf, info.dataloader)
    return {k: float(v) for k, v in {**metrics, **zs}.items()}


@pytest.mark.slow
def test_two_process_eval_matches_single(tmp_path):
    _make_data(tmp_path)
    expect = _single_process_metrics(tmp_path)
    assert expect["num_samples"] == 22

    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo="/root/repo", coord=coord)
                      + EVAL_BODY.format(cfg=json.dumps(TINY_CFG)))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"

    got = []
    for out in outs:
        m = re.search(r"METRICS (\{.*\})", out)
        assert m, out[-2000:]
        got.append(json.loads(m.group(1)))

    # both ranks report identical (global) metrics
    assert set(got[0]) == set(got[1]) == set(expect)
    for k in got[0]:
        assert got[0][k] == pytest.approx(got[1][k], abs=1e-9), (k, got)
    # and they match the single-process run: counts exactly, ranking metrics
    # exactly (same per-sample features in reassembled global order), float
    # losses to numerical tolerance (summation order differs)
    for k, v in expect.items():
        tol = 1e-5 if "loss" in k or "rank" in k else 1e-6
        assert got[0][k] == pytest.approx(v, abs=tol), (k, got[0][k], v)
