"""A/B: host-float RandomResizedCrop tier vs --device-preprocess uint8 tier.

VERDICT r3 weak #5: the device train tier crops from the 256-px canvas with
non-antialiased bilinear instead of reference RRC on the original image; the val
tier is bit-exact but the train-tier distribution shift had no empirical
evidence. This script trains the SAME model/config/seed twice through the real
CLI — once per tier — on synthetic webdataset shards whose crops carry signal
(per-sample textures over a gradient), then compares the loss trajectories and
an image<->text retrieval eval on held-out pairs using the bit-exact val tier.

Usage: python scripts/ab_device_rrc.py [--epochs 30] [--samples 2048]
Writes docs/ab_device_rrc.json and prints a table.
"""
import argparse
import io
import json
import os
import sys
import tarfile

sys.path.insert(0, "/root/repo")
import numpy as np


def make_shards(root, n_train=2048, n_val=256, side=320):
    """Photo-like synthetic pairs. Larger-than-canvas originals (320 px) so the
    host tier's crop-from-original vs device tier's crop-from-256-canvas
    geometry actually differs."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, ".done")
    train_url = os.path.join(root, "train-{00000..00003}.tar")
    val_url = os.path.join(root, "val-00000.tar")
    if os.path.exists(done):
        return train_url, val_url
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:side, 0:side]

    def sample(i):
        base = np.stack([yy * (i % 7 + 1) % 256, xx * (i % 5 + 1) % 256,
                         (yy + xx) * (i % 3 + 1) % 256], -1).astype(np.float32)
        arr = np.clip(base + rng.normal(0, 30, (side, side, 3)), 0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=88)
        cap = f"texture pattern number {i} with frequency {i % 7} {i % 5} {i % 3}".encode()
        return buf.getvalue(), cap

    idx = 0
    for si in range(4):
        with tarfile.open(os.path.join(root, f"train-{si:05d}.tar"), "w") as tf:
            for _ in range(n_train // 4):
                img, cap = sample(idx)
                for name, data in ((f"{idx:06d}.jpg", img), (f"{idx:06d}.txt", cap)):
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
                idx += 1
    with tarfile.open(os.path.join(root, "val-00000.tar"), "w") as tf:
        for j in range(n_val):
            img, cap = sample(100000 + j)
            for name, data in ((f"v{j:06d}.jpg", img), (f"v{j:06d}.txt", cap)):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    open(done, "w").write("ok")
    return train_url, val_url


MODEL = "ViT-S-32"


def run_tier(tag, train_url, n_samples, epochs, logs, device_tier):
    from open_clip_tpu.train.main import main

    # Sized so the loss actually LEAVES chance (a vacuous A/B proves nothing):
    # ViT-S-32, batch 128 -> 16 steps/epoch x 30 epochs = 480 steps of
    # memorization on 2048 distinct pairs. A ViT-B-32/batch-256/64-step run was
    # measured flat at ln(256) with chance retrieval — too short to compare.
    args = [
        "--model", MODEL,
        "--train-data", train_url,
        "--dataset-type", "webdataset",
        "--train-num-samples", str(n_samples),
        "--batch-size", "128",
        "--workers", "1",
        "--grad-checkpointing", "--remat-policy", "names_mm",
        # tunnel D2H measures ~28 MiB/s on this box: per-epoch checkpoints cost
        # minutes, so save only the final epoch (main() also returns the live
        # state, which is what retrieval_eval consumes)
        "--save-frequency", "999",
        "--log-every-n-steps", "16",
        "--epochs", str(epochs),
        # lr 2e-3 measured to collapse the representation at warmup's end (loss
        # snaps to exactly ln(B) and freezes); 5e-4 memorizes stably
        "--lr", "5e-4", "--warmup", "48",
        "--precision", "amp_bf16",
        "--seed", "0",
        "--logs", logs,
        "--name", f"ab-{tag}",
        "--zeroshot-frequency", "1000",
    ]
    from open_clip_tpu import transform

    transform.NATIVE_DECODE = device_tier != "device_pil"
    if device_tier == "device":
        args += ["--device-preprocess", "--native-decode-threads", "1"]
    elif device_tier == "device_pil":  # isolate the native C++ decode stage
        args += ["--device-preprocess"]
    state = main(args)
    # loss trajectory from the jsonl log
    losses = []
    log_path = os.path.join(logs, f"ab-{tag}", "results.jsonl")
    if os.path.exists(log_path):
        for line in open(log_path):
            rec = json.loads(line)
            if "train/loss" in rec:
                losses.append(round(rec["train/loss"], 4))
    ckpt_dir = os.path.join(logs, f"ab-{tag}", "checkpoints")
    return losses, ckpt_dir, state


def retrieval_eval(params, val_url, n_val=256):
    """Held-out image<->text R@1/R@5 with the (tier-independent, bit-exact) val
    transform."""
    import jax.numpy as jnp
    from PIL import Image

    import open_clip_tpu as oct
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import clip_forward
    from open_clip_tpu.tokenizer import tokenize
    from open_clip_tpu.transform import image_transform_v2, PreprocessCfg

    cfg = parse_model_cfg(MODEL)
    pp = image_transform_v2(PreprocessCfg(size=(224, 224)), is_train=False)
    imgs, caps = [], []
    with tarfile.open(val_url.replace("{00000..00003}", "00000")) as tf:
        members = sorted(tf.getmembers(), key=lambda m: m.name)
        for m in members:
            data = tf.extractfile(m).read()
            if m.name.endswith(".jpg"):
                imgs.append(np.asarray(pp(Image.open(io.BytesIO(data)).convert("RGB"))))
            else:
                caps.append(data.decode())
    x = jnp.asarray(np.stack(imgs))
    t = jnp.asarray(tokenize(caps))
    fi, ft = [], []
    for s in range(0, len(imgs), 64):
        out = clip_forward(params, cfg, x[s:s + 64], t[s:s + 64],
                           compute_dtype=jnp.float32)
        fi.append(np.asarray(out["image_features"]))
        ft.append(np.asarray(out["text_features"]))
    fi, ft = np.concatenate(fi), np.concatenate(ft)
    sim = fi @ ft.T
    ranks_i2t = (-sim).argsort(1).argsort(1)[np.arange(len(sim)), np.arange(len(sim))]
    ranks_t2i = (-sim.T).argsort(1).argsort(1)[np.arange(len(sim)), np.arange(len(sim))]
    return {
        "i2t_r1": float((ranks_i2t < 1).mean()), "i2t_r5": float((ranks_i2t < 5).mean()),
        "t2i_r1": float((ranks_t2i < 1).mean()), "t2i_r5": float((ranks_t2i < 5).mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--samples", type=int, default=2048)
    ap.add_argument("--logs", default="/tmp/ab_rrc_logs")
    ap.add_argument("--tiers", default="host,device",
                    help="comma list of tiers to (re)run; existing results for "
                         "other tiers in docs/ab_device_rrc.json are kept")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # a wedged TPU tunnel blocks jax.devices() in C forever (see bench._require_device);
    # fail fast with retries instead of hanging the whole A/B
    from bench import _require_device

    for attempt in range(3):
        try:
            _require_device(180)
            break
        except RuntimeError as e:
            print(f"device probe failed (attempt {attempt + 1}/3): {e}", flush=True)
            if attempt == 2:
                os._exit(2)  # the stuck init thread would block a normal exit
            import time

            time.sleep(60)

    train_url, val_url = make_shards("/root/repo/.ab_rrc_data", n_train=args.samples)
    print("shards ready", flush=True)

    out_path = "/root/repo/docs/ab_device_rrc.json"
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    run = [t.strip() for t in args.tiers.split(",") if t.strip()]
    for tag in ("host", "device", "device_pil"):
        device_tier = False if tag == "host" else tag
        if tag not in run:
            continue
        losses, ckpt_dir, state = run_tier(tag, train_url, args.samples,
                                           args.epochs, args.logs, device_tier)
        from open_clip_tpu.checkpoint import load_native
        import glob

        ck = sorted(glob.glob(os.path.join(ckpt_dir, "epoch_*")))
        params = state.params if hasattr(state, "params") else None
        if params is None and ck:
            params = load_native(ck[-1])["params"]
        ret = retrieval_eval(params, val_url)
        results[tag] = {"losses": losses, "retrieval": ret}
        print(tag, "losses:", losses[-6:], "retrieval:", ret, flush=True)

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
