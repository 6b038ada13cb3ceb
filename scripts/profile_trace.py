"""Capture a jax.profiler trace of the flagship train step on the real chip and
attribute device wall time per HLO op / category.

Usage: python scripts/profile_trace.py [outdir] [--policy names] [--batch 256]

Writes the raw xplane under <outdir> and prints a sorted per-op table plus a
category rollup (fusion kinds, convolution, custom-call/pallas, all-reduce,
copy, idle gaps) so the MFU attack targets measured slices, not guesses.
"""
import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(policy, batch, model="ViT-B-32"):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models import blocks
    from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer
    from open_clip_tpu.train.scheduler import const_lr
    from open_clip_tpu.train.train_step import (create_train_state, jit_train_step,
                                                make_train_step)
    from open_clip_tpu.models.clip import init_clip

    blocks.REMAT_POLICY = policy
    blocks.SCAN_UNROLL = 1
    rng = np.random.default_rng(0)

    if model.startswith("naflexgenlip"):
        # bench_genlip protocol: 1024 image tokens + 128 text, prefix-LM + fused CE
        from open_clip_tpu.factory import create_model

        m = create_model(model, load_weights=False)
        cfg, params = m.cfg, m.params
        opt = create_optimizer(OptimizerCfg(lr=1e-4, wd=0.1, grad_clip_norm=1.0),
                               params, const_lr(1e-4, 0))
        state = create_train_state(params, opt)
        step = jit_train_step(make_train_step(cfg, opt, loss_type="genlip",
                                              compute_dtype=jnp.bfloat16, remat=True))
        bs, ni, lt = batch, 1024, 128
        grid32 = np.stack(np.meshgrid(np.arange(32), np.arange(32), indexing="ij"), -1)
        b = {
            "image": {
                "patches": jnp.asarray(rng.standard_normal((bs, ni, 768)), jnp.bfloat16),
                "patch_coord": jnp.asarray(grid32.reshape(1, ni, 2).repeat(bs, 0), jnp.int32),
                "patch_valid": jnp.ones((bs, ni), bool),
            },
            "text": jnp.asarray(rng.integers(1, 1000, size=(bs, lt)), jnp.int32),
        }
        return state, step, b

    cfg = parse_model_cfg(model)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    opt = create_optimizer(OptimizerCfg(lr=5e-4, wd=0.2, grad_clip_norm=1.0),
                           params, const_lr(5e-4, 0))
    state = create_train_state(params, opt)
    from open_clip_tpu.task import loss_type_for

    loss_type = loss_type_for(cfg, siglip=cfg.init_logit_bias is not None)
    step = jit_train_step(make_train_step(cfg, opt, loss_type=loss_type,
                                          compute_dtype=jnp.bfloat16, remat=True))
    ctx = getattr(cfg.text_cfg, "context_length", 77)  # coca configs already say 76
    b = {"text": jnp.asarray(rng.integers(0, 49407, size=(batch, ctx)), jnp.int32)}
    if cfg.audio_cfg is not None:
        b["audio"] = {"waveform": jnp.asarray(
            rng.standard_normal((batch, 480000)) * 0.1, jnp.float32)}
    elif model.startswith("naflex"):
        # bench_naflex protocol: one 16384-token budget bucket (seq 1024 @ p16)
        seq = 1024
        b["image"] = {
            "patches": jnp.asarray(rng.standard_normal((batch, seq, 16 * 16 * 3)), jnp.bfloat16),
            "patch_coord": jnp.asarray(
                np.stack(np.meshgrid(np.arange(32), np.arange(32), indexing="ij"), -1)
                .reshape(1, seq, 2).repeat(batch, 0), jnp.int32),
            "patch_valid": jnp.ones((batch, seq), bool),
        }
    else:
        sz = cfg.vision_cfg.image_size
        sz = sz if isinstance(sz, int) else sz[0]
        b["image"] = jnp.asarray(rng.standard_normal((batch, sz, sz, 3)), jnp.bfloat16)
    return state, step, b


def parse_xplane(outdir):
    """Per-op device SELF-time table from the captured xplane protobuf.

    XLA-op events nest (a ``while`` spans its body ops; async copy/slice spans
    overlap compute), so a flat duration sum double-counts. We reconstruct the
    nesting per timeline line from (start, duration) intervals and attribute
    each op its self time = duration - sum(direct children). Busy time is the
    interval union of top-level events.
    """
    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", outdir)
        return None
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as fh:
        xs.ParseFromString(fh.read())
    self_time = {}
    busy_ps = 0
    async_busy_ps = 0
    span = [None, None]
    is_async = lambda n: ("copy-start" in n or "slice-start" in n or "async-start" in n
                          or "copy-done" in n or "slice-done" in n or "async-done" in n)
    async_intervals = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            all_evs = [(ev.offset_ps, ev.duration_ps, ev_meta[ev.metadata_id].name)
                       for ev in line.events]
            async_intervals += [(s, s + d) for s, d, n in all_evs if is_async(n)]
            evs = sorted(((s, d, n) for s, d, n in all_evs if not is_async(n)),
                         key=lambda t: (t[0], -t[1]))
            # stack-based nesting: child iff start within parent's [start, end)
            stack = []  # (start, end, name, child_dur_accum index into selfs)
            tops = []   # top-level (start, end)
            for start, dur, name in evs:
                end = start + dur
                while stack and start >= stack[-1][1]:
                    s0, e0, n0, child = stack.pop()
                    self_time[n0] = self_time.get(n0, 0) + (e0 - s0) - child
                    if stack:
                        stack[-1][3] += e0 - s0
                    else:
                        tops.append((s0, e0))
                stack.append([start, end, name, 0])
            while stack:
                s0, e0, n0, child = stack.pop()
                self_time[n0] = self_time.get(n0, 0) + (e0 - s0) - child
                if stack:
                    stack[-1][3] += e0 - s0
                else:
                    tops.append((s0, e0))
            # union of top-level intervals
            tops.sort()
            cur_s = cur_e = None
            for s, e in tops:
                if span[0] is None or s < span[0]:
                    span[0] = s
                if span[1] is None or e > span[1]:
                    span[1] = e
                if cur_s is None:
                    cur_s, cur_e = s, e
                elif s <= cur_e:
                    cur_e = max(cur_e, e)
                else:
                    busy_ps += cur_e - cur_s
                    cur_s, cur_e = s, e
            if cur_s is not None:
                busy_ps += cur_e - cur_s
    # union of async DMA windows (overlap compute; separate engine)
    async_intervals.sort()
    cur_s = cur_e = None
    for s, e in async_intervals:
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            async_busy_ps += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        async_busy_ps += cur_e - cur_s
    wall_ps = (span[1] - span[0]) if span[0] is not None else 0
    return path, self_time, busy_ps, wall_ps, async_busy_ps


CATEGORIES = [
    ("flash/pallas", lambda n: "custom-call" in n or "flash" in n or "pallas" in n),
    ("conv", lambda n: n.startswith("%convolution") or "convolution" in n),
    ("fusion", lambda n: "fusion" in n),
    ("dot", lambda n: n.startswith("%dot") or ".dot" in n),
    ("copy/transpose", lambda n: "copy" in n or "transpose" in n),
    ("dynamic-slice/update", lambda n: "dynamic" in n),
    ("all-reduce", lambda n: "all-reduce" in n or "reduce-scatter" in n or "all-gather" in n),
    ("other", lambda n: True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/flagship_trace")
    ap.add_argument("--policy", default="names")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--model", default="ViT-B-32")
    args = ap.parse_args()

    if not args.parse_only:
        import jax
        state, step, batch = build_step(args.policy, args.batch, args.model)
        keys = [jax.random.PRNGKey(i) for i in range(4 + args.steps)]
        for i in range(4):  # warmup/compile
            state, m = step(state, batch, keys[i])
            _ = np.asarray(m["loss"])
        t0 = time.perf_counter()
        with jax.profiler.trace(args.outdir):
            for i in range(args.steps):
                state, m = step(state, batch, keys[4 + i])
            _ = np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        print(f"traced {args.steps} steps, {dt*1e3:.1f} ms/step, "
              f"{args.batch/dt:.1f} img/s")

    res = parse_xplane(args.outdir)
    if res is None:
        return
    path, by_op, busy_ps, wall_ps, async_busy_ps = res
    print("parsed", path, f"({len(by_op)} distinct ops)")
    total = sum(by_op.values())
    print(f"sync compute self-time sum: {total/1e9:.2f} ms; sync busy union: "
          f"{busy_ps/1e9:.2f} ms; async-DMA busy union: {async_busy_ps/1e9:.2f} ms; "
          f"window: {wall_ps/1e9:.2f} ms "
          f"(compute-idle {100*(1-busy_ps/max(wall_ps,1)):.1f}%)")
    # category rollup
    cat_tot = {}
    for name, dur in by_op.items():
        for cat, pred in CATEGORIES:
            if pred(name):
                cat_tot[cat] = cat_tot.get(cat, 0) + dur
                break
    print("\n== category rollup ==")
    for cat, dur in sorted(cat_tot.items(), key=lambda kv: -kv[1]):
        print(f"{dur/total*100:6.2f}%  {dur/1e12*1e3:8.2f} ms  {cat}")
    print("\n== top 40 ops ==")
    for name, dur in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/total*100:6.2f}%  {dur/1e12*1e3:8.2f} ms  {name[:140]}")
    with open(os.path.join(args.outdir, "op_table.json"), "w") as fh:
        json.dump({"total_ps": total,
                   "categories": cat_tot,
                   "ops": sorted(by_op.items(), key=lambda kv: -kv[1])},
                  fh, indent=1)


if __name__ == "__main__":
    main()
