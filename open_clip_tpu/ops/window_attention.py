"""Fused window attention — Pallas TPU kernel for Swin towers (HTSAT audio,
timm-Swin vision; reference ``src/open_clip/timm_model.py:25`` towers and the
HTSAT encoder the CLAP family uses).

Why not XLA: the dense formulation splits heads out of the qkv projection
(``(B*nW, N, 3, H, hd)`` with hd=24/32) and XLA materializes every relayout in
HBM. The CLAP-HTSAT train-step trace at batch 128 attributed ~30% of device
time to pure copy/transpose ops on ``bf16[8192,64,3,4,24]``-shaped tensors and
another ~25% to f32 ``(8192,4,64,64)`` logit/softmax fusions — layout churn
and HBM round-trips around what is arithmetically a tiny attention problem.

Kernel design:
- q/k/v stay in the tower's native ``(B*nW, N, C)`` flattened layout (the qkv
  matmul's own output layout) — zero HBM relayouts, zero head transposes.
- **Masked head isolation**: head h's q/k/v are obtained by multiplying with a
  static 0/1 lane mask instead of slicing lanes. Because different heads
  occupy disjoint lanes, a full-width ``(N, C) @ (C, N)`` matmul of masked
  operands contracts to exactly that head's logits — no lane rolls, no
  reshapes, just one MXU pass over a wider-than-needed K.
- **Head pairing** (``ph=2`` when H is even): two masked head copies are
  row-stacked so every matmul and softmax runs at 128+ rows; cross-head row
  blocks contract disjoint lanes and are therefore exactly zero, and the
  additive bias block keeps them at -inf through the softmax.
- The per-window additive bias (relative-position bias + shifted-window mask,
  ``(nW, H, N, N)``) rides in as a differentiable input; the fused backward
  accumulates dbias across the batch grid dimension (sequential revisits of
  the same output block), so the learned relative-position table trains.

Backward recomputes the softmax in-kernel (single block, no saved probs) and
emits dq/dk/dv/dbias in one kernel — exact gradients; the only residuals are
q/k/v and the bias itself.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min) * 0.5

_INTERPRET = False  # flipped by tests to run kernels off-TPU

# dispatch switch: models/htsat.py (and the Swin vision tower through it) route
# window attention here when True and the shape is supported; False falls back
# to the dense XLA formulation (A/B lever, and an escape hatch off-TPU)
WINDOW_ATTN_KERNEL = True

# VMEM-budget knobs (bytes of live fp32 (ph*lp, ph*lp) logits per staged chunk)
_FWD_CHUNK_BYTES = 4 << 20
_BWD_CHUNK_BYTES = 1 << 20


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _lane_mask(shape: Tuple[int, int], lo: int, hi: int) -> jnp.ndarray:
    """(rows, C) bool: lane index within [lo, hi) — built from iota in-kernel
    (Pallas forbids captured array constants)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (lanes >= lo) & (lanes < hi)


def _valid_mask(ph: int, lp: int, n: int) -> jnp.ndarray:
    """(ph*lp, ph*lp) bool: same head block-diagonal & row/col within the true
    window length. Everything outside is forced to NEG_INF *by where()* so
    garbage VMEM rows (block reads past N) can never leak NaNs into the
    softmax."""
    t = ph * lp
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    m = (rows // lp) == (cols // lp)
    return m & ((rows % lp) < n) & ((cols % lp) < n)


def _row_clean(tile: jnp.ndarray, lp: int, n: int) -> jnp.ndarray:
    """Zero rows past the true window length in a (ph*lp, C) stacked tile —
    rows past N come from out-of-bounds block reads and may hold NaNs."""
    if n % lp == 0:
        return tile
    rows = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
    return jnp.where((rows % lp) < n, tile, 0)


def _stage_chunks(idx, n_stacked: int, budget: int):
    """Split the (window, head-group) list into chunks whose staged fp32
    (n, n) logits fit a VMEM budget — independent same-shape ops pipeline
    within a chunk instead of serializing dot->softmax->dot chains."""
    per = max(n_stacked * n_stacked * 4, 1)
    k = max(1, budget // per)
    return [idx[i:i + k] for i in range(0, len(idx), k)]


def _stack(ref_row: jnp.ndarray, g: int, ph: int, lp: int, n: int,
           hd: int) -> jnp.ndarray:
    """(N, C) window tile -> (ph*lp, C) row-stacked masked head copies: row
    block j keeps only head (g*ph+j)'s lanes. Disjoint lanes mean a full-width
    matmul of two stacks contracts to exactly the per-head result, with
    cross-head row blocks identically zero."""
    parts = []
    for j in range(ph):
        hh = g * ph + j
        t = jnp.where(_lane_mask(ref_row.shape, hh * hd, (hh + 1) * hd),
                      ref_row, 0)
        if lp != n:
            t = jnp.pad(t, ((0, lp - n), (0, 0)))
        parts.append(t)
    return parts[0] if ph == 1 else jnp.concatenate(parts, axis=0)


def _unstack_sum(stacked: jnp.ndarray, ph: int, lp: int, n: int) -> jnp.ndarray:
    """(ph*lp, C) -> (N, C): sum the row blocks. Each block holds one head's
    disjoint lanes (v/k were masked), so the sum is a lane-wise scatter."""
    out = stacked[0:n]
    for j in range(1, ph):
        out = out + stacked[j * lp:j * lp + n]
    return out


def _comb_bias(bias_ref, w: int, g: int, ph: int, lp: int) -> jnp.ndarray:
    """(ph*lp, ph*lp) block-diagonal additive bias from the (gb, H, lp, lp)
    bias block: head g*ph+j's (lp, lp) tile at diagonal position j. All parts
    sit at lane offset 0 (concat-friendly); off-diagonal filler value is
    irrelevant — the valid mask overrides it with NEG_INF."""
    if ph == 1:
        return bias_ref[w, g]
    zero = jnp.zeros((lp, lp), jnp.float32)
    rows = []
    for j in range(ph):
        tiles = [bias_ref[w, g * ph + j] if jj == j else zero for jj in range(ph)]
        rows.append(jnp.concatenate(tiles, axis=1))
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float, n: int,
                heads: int, ph: int, bshared: bool):
    gb, _, c = q_ref.shape
    hd = c // heads
    lp = _round_up(n, 8)
    valid = _valid_mask(ph, lp, n)
    idx = [(w, g) for w in range(gb) for g in range(heads // ph)]
    acc = [None] * gb
    for chunk in _stage_chunks(idx, ph * lp, _FWD_CHUNK_BYTES):
        qs = [_stack(q_ref[w], g, ph, lp, n, hd) for w, g in chunk]
        ks = [_stack(k_ref[w], g, ph, lp, n, hd) for w, g in chunk]
        vs = [_row_clean(_stack(v_ref[w], g, ph, lp, n, hd), lp, n)
              for w, g in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for qp, kp in zip(qs, ks)]
        ps = []
        for (w, g), s in zip(chunk, ss):
            bw = 0 if bshared else w
            s = jnp.where(valid, s * scale + _comb_bias(bias_ref, bw, g, ph, lp),
                          NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            ps.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(q_ref.dtype))
        os_ = [jax.lax.dot_general(p, vp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for p, vp in zip(ps, vs)]
        for (w, g), o in zip(chunk, os_):
            part = _unstack_sum(o, ph, lp, n)
            acc[w] = part if acc[w] is None else acc[w] + part
    for w in range(gb):
        o_ref[w] = acc[w].astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                scale: float, n: int, heads: int, ph: int, bshared: bool):
    gb, _, c = q_ref.shape
    hd = c // heads
    lp = _round_up(n, 8)
    valid = _valid_mask(ph, lp, n)
    in_dt = q_ref.dtype

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    idx = [(w, g) for w in range(gb) for g in range(heads // ph)]
    dq_acc = [None] * gb
    dk_acc = [None] * gb
    dv_acc = [None] * gb
    for chunk in _stage_chunks(idx, ph * lp, _BWD_CHUNK_BYTES):
        qs = [_row_clean(_stack(q_ref[w], g, ph, lp, n, hd), lp, n)
              for w, g in chunk]
        ks = [_row_clean(_stack(k_ref[w], g, ph, lp, n, hd), lp, n)
              for w, g in chunk]
        vs = [_row_clean(_stack(v_ref[w], g, ph, lp, n, hd), lp, n)
              for w, g in chunk]
        dos = [_row_clean(_stack(do_ref[w], g, ph, lp, n, hd), lp, n)
               for w, g in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for qp, kp in zip(qs, ks)]
        ps32, ps = [], []
        for (w, g), s in zip(chunk, ss):
            bw = 0 if bshared else w
            s = jnp.where(valid, s * scale + _comb_bias(bias_ref, bw, g, ph, lp),
                          NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ps32.append(p)
            ps.append(p.astype(in_dt))
        dvs = [jax.lax.dot_general(p, dop, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for p, dop in zip(ps, dos)]
        dps = [jax.lax.dot_general(dop, vp, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for dop, vp in zip(dos, vs)]
        dss = [p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
               for p32, dp in zip(ps32, dps)]
        for (w, g), ds in zip(chunk, dss):
            # dbias: the diagonal (lp, lp) blocks of ds (off-diagonal blocks are
            # exactly zero — p is zero there). Accumulated across the batch grid
            # dim (sequential revisits of this output block).
            bw = 0 if bshared else w
            for j in range(ph):
                blk = ds[j * lp:(j + 1) * lp, j * lp:(j + 1) * lp] if ph > 1 else ds
                dbias_ref[bw, g * ph + j] += blk
        dsb = [ds.astype(in_dt) for ds in dss]
        dqs = [jax.lax.dot_general(ds, kp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for ds, kp in zip(dsb, ks)]
        dks = [jax.lax.dot_general(ds, qp, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for ds, qp in zip(dsb, qs)]
        for (w, g), dq, dk, dv in zip(chunk, dqs, dks, dvs):
            for accs, val in ((dq_acc, dq), (dk_acc, dk), (dv_acc, dv)):
                part = _unstack_sum(val, ph, lp, n)
                accs[w] = part if accs[w] is None else accs[w] + part
    for w in range(gb):
        dq_ref[w] = dq_acc[w].astype(dq_ref.dtype)
        dk_ref[w] = dk_acc[w].astype(dk_ref.dtype)
        dv_ref[w] = dv_acc[w].astype(dv_ref.dtype)


def _pick_gb(b: int, nw: int, n: int, c: int) -> int:
    budget = max(1, (512 * 1024) // max(n * c * 2, 1))  # ~0.5 MB of q rows/block
    for gb in (16, 8, 4, 2, 1):
        if gb > budget:
            continue
        if nw > 1 and nw % gb == 0 and b % gb == 0:
            return gb
        if nw == 1 and b % gb == 0:
            return gb
    return 1


def _ph_for(heads: int) -> int:
    return 2 if heads % 2 == 0 else 1


def _fwd_call(q, k, v, bias, scale):
    b, n, c = q.shape
    nw, heads, lp, _ = bias.shape
    ph = _ph_for(heads)
    gb = _pick_gb(b, nw, n, c)
    jwin = (nw // gb) if nw > 1 else 1
    spec = pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((gb if nw > 1 else 1, heads, lp, lp),
                         lambda i, jw=jwin: (i % jw, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n=n, heads=heads, ph=ph,
                          bshared=nw == 1),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        grid=(b // gb,),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * ph * lp * lp * c,
            bytes_accessed=4 * b * n * c * q.dtype.itemsize + bias.size * 4,
            transcendentals=b * heads * ph * lp * lp,
        ),
        interpret=_INTERPRET,
    )(q, k, v, bias)


def _bwd_call(q, k, v, bias, do, scale):
    b, n, c = q.shape
    nw, heads, lp, _ = bias.shape
    ph = _ph_for(heads)
    gb = _pick_gb(b, nw, n, c)
    jwin = (nw // gb) if nw > 1 else 1
    t_steps = b // gb // jwin
    spec = pl.BlockSpec((gb, n, c), lambda j, t, jw=jwin: (t * jw + j, 0, 0))
    bspec = pl.BlockSpec((gb if nw > 1 else 1, heads, lp, lp),
                         lambda j, t: (j, 0, 0, 0))
    shape = jax.ShapeDtypeStruct((b, n, c), q.dtype)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n=n, heads=heads, ph=ph,
                          bshared=nw == 1),
        out_shape=(shape, shape, shape,
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        grid=(jwin, t_steps),
        in_specs=[spec, spec, spec, bspec, spec],
        out_specs=(spec, spec, spec, bspec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * heads * ph * lp * lp * c,
            bytes_accessed=7 * b * n * c * q.dtype.itemsize + 2 * bias.size * 4,
            transcendentals=b * heads * ph * lp * lp,
        ),
        interpret=_INTERPRET,
    )(q, k, v, bias, do)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _window_attn(q, k, v, bias, scale):
    return _fwd_call(q, k, v, bias, scale)


def _wa_fwd(q, k, v, bias, scale):
    return _fwd_call(q, k, v, bias, scale), (q, k, v, bias)


def _wa_bwd(scale, res, g):
    q, k, v, bias = res
    return _bwd_call(q, k, v, bias, g, scale)


_window_attn.defvjp(_wa_fwd, _wa_bwd)


def enabled() -> bool:
    """Kernel dispatch gate: on a real TPU, or under interpret mode (tests)."""
    if not WINDOW_ATTN_KERNEL:
        return False
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def supports(n: int, heads: int, c: int, b: int, nw: int) -> bool:
    """Can the kernel serve this window-attention shape?"""
    if n > 128 or c > 1024 or c % heads != 0:
        return False
    gb = _pick_gb(b, nw, n, c)
    if nw > 1 and (nw % gb != 0 or b % (gb * (nw // gb)) != 0):
        return False
    return b % gb == 0


def window_attention(
    q: jax.Array,  # (B*nW, N, C) — window-minor flattened windows
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (nW, H, N, N) additive (rel-pos + shift mask), differentiable
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused Swin window attention. ``bias`` broadcasts over samples: row b of
    q/k/v uses bias window ``b % nW`` (pass ``nW=1`` when every window shares
    the bias, e.g. unshifted blocks). Differentiable in q/k/v/bias."""
    b, n, c = q.shape
    nw, heads, bn, _ = bias.shape
    assert bn == n and q.shape == k.shape == v.shape
    assert nw == 1 or b % nw == 0
    if scale is None:
        scale = (c // heads) ** -0.5
    lp = _round_up(n, 8)
    if lp != n:
        # pad the bias tiles once per trace to the sublane-aligned size; padded
        # values are irrelevant — the kernel's valid mask forces every padded
        # row/col to NEG_INF before the softmax
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, lp - n), (0, lp - n)))
    out = _window_attn(q, k, v, bias.astype(jnp.float32), scale)
    return out
