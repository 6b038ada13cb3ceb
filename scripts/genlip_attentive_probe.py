"""Attentive-probe (AttentionPoolLatent) ImageNet evaluation of a frozen GenLIP image
encoder (reference scripts/genlip_attentive_probe.py).

GenLIP has no [CLS] token, so this follows the AIM/DINOv2-style frozen-backbone
protocol: freeze the trunk, extract last-layer patch features (post-ln_post) ONCE per
image, then train a small attention-pooling head (a learnable latent query
cross-attending the patch tokens, padding-masked) + BN(affine=False) + linear
classifier on the cached features. No train-time augmentation.

TPU-native: the frozen extraction and every head train/eval step are single jitted
programs over fixed shapes; the head (latent cross-attention, BN with running stats,
classifier) is pure JAX/optax defined in this script, as the reference defines its
torch ProbeHead in-script.

Example:
    python scripts/genlip_attentive_probe.py \
        --model naflexgenlip_b16 --checkpoint /path/epoch_32 \
        --imagenet-train /data/imagenet/train --imagenet-val /data/imagenet/val \
        --seq-len 256 --train-per-class 100 --epochs 20 --lr 1e-3 --precision bf16
"""
import argparse
import functools
import os
import time
from collections import defaultdict

import numpy as np

from _common import load_trained_weights  # noqa: E402  (adds repo root to sys.path)


def list_imagefolder(root, per_class, seed):
    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    by_class = defaultdict(list)
    exts = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(exts):
                by_class[ci].append(os.path.join(cdir, fn))
    rng = np.random.default_rng(seed)
    samples = []
    for ci, paths in by_class.items():
        if per_class:
            idx = rng.permutation(len(paths))[:per_class]
            paths = [paths[i] for i in idx]
        samples.extend((p, ci) for p in paths)
    return samples, classes


# ---------------------------------------------------------------------------
# probe head: AttentionPoolLatent-style latent cross-attention + BN + linear
# ---------------------------------------------------------------------------

def init_head(key, dim, num_classes, num_heads, q_proj, mlp_ratio, use_bn, bn_affine):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 8)
    trunc = lambda k, shape, std=0.02: std * jax.random.truncated_normal(k, -2, 2, shape)
    p = {
        "latent": trunc(ks[0], (1, dim)),
        "kv": {"kernel": trunc(ks[1], (dim, 2 * dim)), "bias": jnp.zeros((2 * dim,))},
        "proj": {"kernel": trunc(ks[2], (dim, dim)), "bias": jnp.zeros((dim,))},
        "fc": {"kernel": jnp.zeros((dim, num_classes)), "bias": jnp.zeros((num_classes,))},
    }
    if q_proj:
        p["q"] = {"kernel": trunc(ks[3], (dim, dim)), "bias": jnp.zeros((dim,))}
    if mlp_ratio > 0:
        hidden = int(dim * mlp_ratio)
        p["mlp_norm"] = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
        p["mlp"] = {
            "fc1": {"kernel": trunc(ks[4], (dim, hidden)), "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": trunc(ks[5], (hidden, dim)), "bias": jnp.zeros((dim,))},
        }
    if use_bn and bn_affine:
        p["bn"] = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    stats = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))} if use_bn else None
    return p, stats


def head_forward(p, stats, feats, valid, *, num_heads, train):
    """feats (B, N, D) float32, valid (B, N) -> (logits (B, C), batch_stats or None)."""
    import jax
    import jax.numpy as jnp

    b, n, d = feats.shape
    hd = d // num_heads
    latent = p["latent"]
    q = latent @ p["q"]["kernel"] + p["q"]["bias"] if "q" in p else latent
    q = jnp.broadcast_to(q.reshape(1, 1, num_heads, hd), (b, 1, num_heads, hd))
    kv = feats @ p["kv"]["kernel"] + p["kv"]["bias"]
    k, v = jnp.split(kv.reshape(b, n, 2, num_heads, hd), 2, axis=2)
    k, v = k[:, :, 0], v[:, :, 0]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    pooled = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, d)
    pooled = pooled @ p["proj"]["kernel"] + p["proj"]["bias"]
    if "mlp" in p:
        h = (pooled - pooled.mean(-1, keepdims=True)) / jnp.sqrt(
            pooled.var(-1, keepdims=True) + 1e-6)
        h = h * p["mlp_norm"]["scale"] + p["mlp_norm"]["bias"]
        h = jax.nn.gelu(h @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"])
        pooled = pooled + (h @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"])
    batch_stats = None
    if stats is not None:
        if train:
            mu, var = pooled.mean(0), pooled.var(0)
            batch_stats = {"mean": mu, "var": var}
        else:
            mu, var = stats["mean"], stats["var"]
        pooled = (pooled - mu) / jnp.sqrt(var + 1e-5)
        if "bn" in p:
            pooled = pooled * p["bn"]["scale"] + p["bn"]["bias"]
    return pooled @ p["fc"]["kernel"] + p["fc"]["bias"], batch_stats


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--model", default="naflexgenlip_b16")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--imagenet-train", required=True)
    ap.add_argument("--imagenet-val", required=True)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--train-per-class", type=int, default=100,
                    help="Images/class to cache for training (0=all).")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--pool-num-heads", type=int, default=12)
    ap.add_argument("--no-q-proj", dest="q_proj", action="store_false",
                    help="AIM-style: latent used directly as Q.")
    ap.add_argument("--mlp-ratio", type=float, default=0.0,
                    help=">0 adds the MAP-head residual MLP.")
    ap.add_argument("--no-bn", dest="use_bn", action="store_false")
    ap.add_argument("--bn-affine", action="store_true")
    ap.add_argument("--head-batch", type=int, default=512)
    ap.add_argument("--extract-batch", type=int, default=128)
    ap.add_argument("--precision", default="bf16", choices=("fp32", "bf16"))
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from open_clip_tpu.factory import create_model
    from open_clip_tpu.data.naflex import NaFlexTransform
    from open_clip_tpu.models import genlip as G

    print(f"Building {args.model} (frozen backbone) ...")
    model = create_model(args.model, precision=args.precision, load_weights=False)
    load_trained_weights(model, args.checkpoint, use_ema=args.use_ema)
    cfg, params = model.cfg, model.params
    dim = cfg.trunk_cfg.width
    transform = NaFlexTransform(args.seq_len, args.patch_size)

    extract = jax.jit(functools.partial(
        G.patch_features, params, cfg, compute_dtype=model.compute_dtype))

    def cache_split(root, per_class, tag):
        samples, classes = list_imagefolder(root, per_class, args.seed)
        n = len(samples)
        feats = np.empty((n, args.seq_len, dim), dtype=np.float16)
        valid = np.empty((n, args.seq_len), dtype=bool)
        labels = np.empty((n,), dtype=np.int64)
        t0 = time.time()
        eb = args.extract_batch
        for start in range(0, n, eb):
            batch = samples[start:start + eb]
            ds = [transform(Image.open(p)) for p, _ in batch]
            img = {k: jnp.asarray(np.stack([d[k] for d in ds])) for k in ds[0]}
            x = np.asarray(extract(img), dtype=np.float16)
            feats[start:start + len(batch)] = x[:len(batch)]
            valid[start:start + len(batch)] = np.stack([d["patch_valid"] for d in ds])
            labels[start:start + len(batch)] = [ci for _, ci in batch]
            if (start // eb) % 50 == 0:
                done = start + len(batch)
                print(f"  [{tag}] cached {done}/{n}  ({done / (time.time() - t0):.0f} img/s)",
                      flush=True)
        return feats, valid, labels, len(classes)

    print(f"Caching features (dim={dim}, seq_len={args.seq_len}) ...")
    tr_feats, tr_valid, tr_labels, n_classes = cache_split(
        args.imagenet_train, args.train_per_class, "train")
    va_feats, va_valid, va_labels, n_val_classes = cache_split(args.imagenet_val, 0, "val")
    if n_classes != n_val_classes:
        raise SystemExit(f"train has {n_classes} classes, val {n_val_classes}")
    print(f"  train: {len(tr_labels)} | val: {len(va_labels)} | classes: {n_classes}")

    key = jax.random.PRNGKey(args.seed)
    head, bn_stats = init_head(key, dim, n_classes, args.pool_num_heads, args.q_proj,
                               args.mlp_ratio, args.use_bn, args.bn_affine)
    n_head = sum(x.size for x in jax.tree.leaves(head))
    print(f"Head: latent-pool(q_proj={args.q_proj}, mlp_ratio={args.mlp_ratio}) + "
          f"{'BN' if args.use_bn else 'noBN'} + Linear  ({n_head / 1e6:.2f}M params)")

    steps_per_epoch = max(1, len(tr_labels) // args.head_batch)
    sched = optax.cosine_decay_schedule(args.lr, args.epochs * steps_per_epoch)
    opt = optax.adamw(sched, weight_decay=args.wd)
    opt_state = opt.init(head)

    @jax.jit
    def train_step(head, opt_state, bn_stats, feats, valid, labels):
        def loss_fn(h):
            logits, batch_stats = head_forward(
                h, bn_stats, feats, valid, num_heads=args.pool_num_heads, train=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            return loss, batch_stats

        (loss, batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(head)
        updates, opt_state = opt.update(grads, opt_state, head)
        head = optax.apply_updates(head, updates)
        if bn_stats is not None and batch_stats is not None:
            bn_stats = jax.tree.map(lambda r, b: 0.9 * r + 0.1 * b, bn_stats, batch_stats)
        return head, opt_state, bn_stats, loss

    @jax.jit
    def eval_logits(head, bn_stats, feats, valid):
        logits, _ = head_forward(head, bn_stats, feats, valid,
                                 num_heads=args.pool_num_heads, train=False)
        return logits

    def evaluate(head, bn_stats):
        hb, top1, top5 = args.head_batch, 0, 0
        n = len(va_labels)
        for i in range(0, n, hb):
            f = jnp.asarray(va_feats[i:i + hb], jnp.float32)
            v = jnp.asarray(va_valid[i:i + hb])
            logits = np.asarray(eval_logits(head, bn_stats, f, v))
            pred = np.argsort(logits, axis=-1)[:, ::-1][:, :5]
            y = va_labels[i:i + hb]
            top1 += (pred[:, 0] == y).sum()
            top5 += (pred == y[:, None]).any(1).sum()
        return 100 * top1 / n, 100 * top5 / n

    rng = np.random.default_rng(args.seed)
    best1 = 0.0
    for epoch in range(args.epochs):
        perm = rng.permutation(len(tr_labels))
        t0, loss = time.time(), None
        for i in range(0, len(perm) - args.head_batch + 1, args.head_batch):
            idx = np.sort(perm[i:i + args.head_batch])
            head, opt_state, bn_stats, loss = train_step(
                head, opt_state, bn_stats,
                jnp.asarray(tr_feats[idx], jnp.float32), jnp.asarray(tr_valid[idx]),
                jnp.asarray(tr_labels[idx]))
        top1, top5 = evaluate(head, bn_stats)
        best1 = max(best1, top1)
        print(f"epoch {epoch + 1:2d}/{args.epochs} | loss {float(loss):.3f} | "
              f"val top1 {top1:.2f}% top5 {top5:.2f}% | {time.time() - t0:.1f}s", flush=True)

    print(f"\n=== {args.model} attentive probe (epochs={args.epochs}, "
          f"{args.train_per_class}/class) ===")
    print(f"  best val top-1: {best1:.2f}%")


if __name__ == "__main__":
    main()
