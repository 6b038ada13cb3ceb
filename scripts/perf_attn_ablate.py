"""Cost attribution INSIDE the short-attention kernel (real chip).

The flagship trace attributes ~16 ms/step to ops/short_attention.py kernels
(~7% of MXU peak — latency/VPU-bound, ROUND4.md). Before redesigning, measure
where the time goes by benching math-WRONG but cost-representative ablations
of the fwd/bwd kernel bodies at the exact flagship shapes:

  full        — the real kernel (baseline)
  no-stack    — head stacking rolls removed (uses tile[:, :hd] twice): cost of
                _stack_heads/_unstack_heads lane/sublane rotations
  no-softmax  — softmax replaced by a scale (matmuls + data movement only)
  no-mask     — softmax kept, the where(mask) dropped
  matmul-only — stacking + matmuls, no mask/softmax (pure MXU + movement)
  stack2      — STACK=2 (4 heads -> (256, 256) tiles, fewer/larger ops)

Each variant is a separate pallas_call built from the same body template.
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

NEG_INF = -1e30


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from open_clip_tpu.ops import short_attention as sa

    rng = np.random.default_rng(0)

    def timeit(fn, args, iters=50, warmup=5):
        for _ in range(warmup):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / iters * 1e3

    def fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, seq_len, hd,
                   stack, do_stack, do_mask, do_softmax):
        gb, lp, w = q_ref.shape
        per = max(min(stack * sa.LANES // hd, w // hd), 1)
        tw = per * hd
        mask = sa._pair_mask(lp, per, seq_len, causal)
        idx = [(g, base) for g in range(gb) for base in range(0, w, tw)]

        def stk(tile):
            if do_stack:
                return sa._stack_heads(tile, per, hd)
            # cost-ablated: same output shape, no rotations (WRONG math)
            return jnp.concatenate([tile[:, :hd]] * per, axis=0)

        def unstk(stacked):
            if do_stack:
                return sa._unstack_heads(stacked, per, lp, hd)
            return jnp.concatenate([stacked[:lp]] * per, axis=1)

        for chunk in sa._stage_chunks(idx, per * lp):
            qs = [stk(q_ref[g, :, b:b + tw]) for g, b in chunk]
            ks = [stk(k_ref[g, :, b:b + tw]) for g, b in chunk]
            vs = [sa._row_clean(stk(v_ref[g, :, b:b + tw]), lp, seq_len) for g, b in chunk]
            ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  for qp, kp in zip(qs, ks)]
            ps = []
            for s in ss:
                if do_softmax:
                    if do_mask:
                        s = jnp.where(mask, s * scale, NEG_INF)
                    else:
                        s = s * scale
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    ps.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(q_ref.dtype))
                else:
                    ps.append((s * scale).astype(q_ref.dtype))
            os_ = [jax.lax.dot_general(p, vp, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                   for p, vp in zip(ps, vs)]
            for (g, b), o in zip(chunk, os_):
                o_ref[g, :, b:b + tw] = unstk(o).astype(o_ref.dtype)

    def bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                   scale, causal, seq_len, hd, stack, do_stack, do_mask, do_softmax):
        gb, lp, w = q_ref.shape
        per = max(min(stack * sa.LANES // hd, w // hd), 1)
        tw = per * hd
        mask = sa._pair_mask(lp, per, seq_len, causal)
        idx = [(g, base) for g in range(gb) for base in range(0, w, tw)]
        in_dt = q_ref.dtype

        def stk(tile):
            if do_stack:
                return sa._stack_heads(tile, per, hd)
            return jnp.concatenate([tile[:, :hd]] * per, axis=0)

        def unstk(stacked):
            if do_stack:
                return sa._unstack_heads(stacked, per, lp, hd)
            return jnp.concatenate([stacked[:lp]] * per, axis=1)

        for chunk in sa._stage_chunks(idx, per * lp, bwd=True):
            qs = [sa._row_clean(stk(q_ref[g, :, b:b + tw]), lp, seq_len) for g, b in chunk]
            ks = [sa._row_clean(stk(k_ref[g, :, b:b + tw]), lp, seq_len) for g, b in chunk]
            vs = [sa._row_clean(stk(v_ref[g, :, b:b + tw]), lp, seq_len) for g, b in chunk]
            dos = [sa._row_clean(stk(do_ref[g, :, b:b + tw]), lp, seq_len) for g, b in chunk]
            ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  for qp, kp in zip(qs, ks)]
            ps32, ps = [], []
            for s in ss:
                if do_softmax:
                    if do_mask:
                        s = jnp.where(mask, s * scale, NEG_INF)
                    else:
                        s = s * scale
                    m = jnp.max(s, axis=-1, keepdims=True)
                    p = jnp.exp(s - m)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                else:
                    p = s * scale
                ps32.append(p)
                ps.append(p.astype(in_dt))
            dvs = [jax.lax.dot_general(p, dop, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                   for p, dop in zip(ps, dos)]
            dps = [jax.lax.dot_general(dop, vp, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                   for dop, vp in zip(dos, vs)]
            if do_softmax:
                dss = [(p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))).astype(in_dt)
                       for p32, dp in zip(ps32, dps)]
            else:
                dss = [dp.astype(in_dt) for dp in dps]
            dqs = [jax.lax.dot_general(ds, kp, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32) * scale
                   for ds, kp in zip(dss, ks)]
            dks = [jax.lax.dot_general(ds, qp, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32) * scale
                   for ds, qp in zip(dss, qs)]
            for (g, b), dq, dk, dv in zip(chunk, dqs, dks, dvs):
                dq_ref[g, :, b:b + tw] = unstk(dq).astype(dq_ref.dtype)
                dk_ref[g, :, b:b + tw] = unstk(dk).astype(dk_ref.dtype)
                dv_ref[g, :, b:b + tw] = unstk(dv).astype(dv_ref.dtype)

    def make_fwd(b, l, w, hd, causal, **abl):
        lp = sa._round_up(l, 16)
        stack = abl.get("stack", 1)
        grid, spec, sem = sa._grid_and_spec(b, lp, w, hd, sa._FWD_BUDGET)
        return pl.pallas_call(
            functools.partial(fwd_kernel, scale=hd ** -0.5, causal=causal, seq_len=l,
                              hd=hd, stack=stack,
                              do_stack=abl.get("do_stack", True),
                              do_mask=abl.get("do_mask", True),
                              do_softmax=abl.get("do_softmax", True)),
            out_shape=jax.ShapeDtypeStruct((b, l, w), jnp.bfloat16),
            grid=grid, in_specs=[spec] * 3, out_specs=spec,
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        )

    def make_bwd(b, l, w, hd, causal, **abl):
        lp = sa._round_up(l, 16)
        stack = abl.get("stack", 1)
        grid, spec, sem = sa._grid_and_spec(b, lp, w, hd, sa._BWD_BUDGET)
        shape = jax.ShapeDtypeStruct((b, l, w), jnp.bfloat16)
        return pl.pallas_call(
            functools.partial(bwd_kernel, scale=hd ** -0.5, causal=causal, seq_len=l,
                              hd=hd, stack=stack,
                              do_stack=abl.get("do_stack", True),
                              do_mask=abl.get("do_mask", True),
                              do_softmax=abl.get("do_softmax", True)),
            out_shape=(shape, shape, shape),
            grid=grid, in_specs=[spec] * 4, out_specs=(spec, spec, spec),
            compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        )

    shapes = [("vision B256 L50 H12 hd64", 256, 50, 768, 64, False),
              ("text   B256 L77 H8  hd64", 256, 77, 512, 64, True)]
    variants = [
        ("full", {}),
        ("no-stack", {"do_stack": False}),
        ("no-mask", {"do_mask": False}),
        ("no-softmax", {"do_softmax": False}),
        ("matmul-only", {"do_softmax": False, "do_stack": False}),
        ("stack2", {"stack": 2}),
    ]
    for tag, b, l, w, hd, causal in shapes:
        q = jnp.asarray(rng.standard_normal((b, l, w)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, l, w)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, l, w)), jnp.bfloat16)
        do = jnp.asarray(rng.standard_normal((b, l, w)), jnp.bfloat16)
        print(f"== {tag}")
        for name, abl in variants:
            try:
                tf = timeit(jax.jit(make_fwd(b, l, w, hd, causal, **abl)), (q, k, v))
            except Exception as e:
                print(f"  {name:12s} fwd FAILED {repr(e)[:90]}")
                continue
            try:
                tb = timeit(jax.jit(make_bwd(b, l, w, hd, causal, **abl)), (q, k, v, do))
            except Exception as e:
                print(f"  {name:12s} fwd {tf:7.3f} ms   bwd FAILED {repr(e)[:90]}")
                continue
            print(f"  {name:12s} fwd {tf:7.3f} ms   bwd {tb:7.3f} ms")


if __name__ == "__main__":
    main()
