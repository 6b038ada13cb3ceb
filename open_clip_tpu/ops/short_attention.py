"""Fused short-sequence attention — Pallas TPU kernel for CLIP-length towers.

The reference runs attention through ``F.scaled_dot_product_attention`` (reference
``src/open_clip/transformer.py:223``). At CLIP sequence lengths (50-257 tokens) XLA's
path is pathologically slow on TPU — measured at B=1024, L=50, H=12, hd=64:
4.3 ms for the batched logit matmuls (~0.9 TF/s effective), 4.2 ms for softmax on the
(B, H, 50, 50) fp32 tensor (50 lanes < the 128-lane VPU width), plus 1.8 ms per
(B, L, H, hd) <-> (B, H, L, hd) relayout. ~7.3 ms/layer against a ~0.3 ms compute bound.

Kernel design:
- q/k/v stay in the tower's native (B, L, H*hd) flattened layout — no HBM relayouts.
- A group of samples is processed per grid step with every (L, L) tile in VMEM;
  logits -> masked fp32 softmax -> context run back-to-back, zero HBM round-trips.
- **Head pairing**: with hd=64, two heads share each 128-lane tile. Their q/k/v are
  row-stacked into (2L, hd) and attention runs as ONE (2L, 2L) matmul + softmax with a
  block-diagonal mask — every MXU pass and VPU lane is full-width; the off-diagonal
  cross-head logits are masked to zero and cancel exactly in the AV product and in all
  four backward matmuls (they multiply a zero probability).

Backward recomputes the softmax in-kernel (single block: no saved probs, no lse) and
emits dq/dk/dv in one fused kernel — exact gradients; the only residuals are q/k/v
themselves. Long sequences (NaFlex/GenLIP 1k-4k) tile through ops/flash_attention.py
instead; dispatch lives in ops/attention.py.

v2 body (default; `OCT_SHORT_ATTN_IMPL=v1` restores the row-stacked original):
on-chip ablation (scripts/perf_attn_ablate.py) attributed ~26% of the text fwd to
the head stacking/unstacking lane rotations and ~52% to the (2L, 2L) masked fp32
softmax. v2 removes both:
- k/v are replicated down sublanes (one concat, no lane rolls) and multiplied by a
  block mask so row-block i holds only head i's lanes. Logits are then ONE
  (L, hd·per) x (per·L, hd·per)^T matmul — full 128-lane contraction — giving
  (L, per·L) with head i's scores in column segment i: half the fp32 softmax area
  of the stacked (per·L, per·L) layout and no cross-head mask term.
- softmax stability uses the row-global max: it is constant across each column
  segment, and segment-wise softmax is invariant to any shift constant within the
  segment, so one max serves all heads exactly.
- per-segment denominators come from e @ blockmap — a matmul against the same
  {0,1} block mask — which lands each head's sum directly in that head's output
  lanes, so o = (e @ V_stack) / d needs no unstack: the context matmul's output
  is already in the tower's native (L, H*hd) lane layout.
The backward keeps the same masked-stack operands; dv/dk come out block-stacked
(per·L, hd·per) and fold back with per-1 sublane slice-adds (no rotations).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min) * 0.5

# max sequence length this kernel targets; beyond it the flash kernel tiles better
MAX_SEQ = 288  # covers ViT-L/H-14 at 257 tokens; beyond this the flash kernel tiles better
LANES = 128

# heads stacked per matmul = STACK * (LANES // hd): 1 fills each 128-lane tile's worth
# of heads (2 at hd=64); higher values stack multiple lane-tiles into one taller
# matmul — fewer, larger MXU ops (waste grows with the off-diagonal mask area but the
# per-op issue overhead shrinks). Tuned on-chip.
STACK = 1


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pair_mask(lp: int, per: int, seq_len: int, causal: bool) -> jnp.ndarray:
    """(per*lp, per*lp) mask: block-diagonal (same head) & key within seq (& causal)."""
    n = per * lp
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    mask = (rows // lp) == (cols // lp)
    mask = mask & ((cols % lp) < seq_len) & ((rows % lp) < seq_len)
    if causal:
        mask = mask & ((rows % lp) >= (cols % lp))
    return mask


def _stack_heads(tile: jnp.ndarray, per: int, hd: int) -> jnp.ndarray:
    """(Lp, per*hd) lane-tiled heads -> (per*Lp, hd) row-stacked.

    Mosaic can't concatenate vectors whose lane offsets differ, so each head is
    rotated to lane offset 0 before the sublane concat."""
    if per == 1:
        return tile
    parts = [tile[:, :hd]]
    for i in range(1, per):
        parts.append(jnp.roll(tile, -i * hd, axis=1)[:, :hd])
    return jnp.concatenate(parts, axis=0)


def _unstack_heads(stacked: jnp.ndarray, per: int, lp: int, hd: int) -> jnp.ndarray:
    """(per*Lp, hd) row-stacked -> (Lp, per*hd) lane-tiled (roll to sublane offset 0
    before the lane concat, mirroring _stack_heads)."""
    if per == 1:
        return stacked
    parts = [stacked[:lp]]
    for i in range(1, per):
        parts.append(jnp.roll(stacked, -i * lp, axis=0)[:lp])
    return jnp.concatenate(parts, axis=1)


def _row_clean(tile: jnp.ndarray, lp: int, seq_len: int) -> jnp.ndarray:
    """Zero rows past seq_len in a (per*lp, hd) stacked tile: rows past the true
    sequence come from out-of-bounds block reads and hold undefined values."""
    if seq_len % lp == 0:
        return tile
    rows = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
    return jnp.where((rows % lp) < seq_len, tile, 0)


def _stage_chunks(idx, n_stacked: int, bwd: bool = False):
    """Split the (sample, tile) list into chunks whose staged fp32 (n, n) logits fit a
    VMEM budget: independent ops still pipeline within a chunk, but peak live
    intermediates stay bounded at big Lp (ViT-L: Lp=272 -> (544, 544) tiles)."""
    # the bwd stages ~4 live (n, n) fp32 tensors per tile (s, p32, dp, ds) vs ~1.5
    # for the fwd, so its per-chunk logit budget is much smaller
    budget = 1 << 20 if bwd else 4 << 20  # bytes of live (n, n) fp32 logits per chunk
    per_tile = max(n_stacked * n_stacked * 4, 1)
    k = max(1, budget // per_tile)
    return [idx[i:i + k] for i in range(0, len(idx), k)]


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, seq_len: int,
                hd: int):
    gb, lp, w = q_ref.shape
    per = max(min(STACK * LANES // hd, w // hd), 1)
    tw = per * hd
    mask = _pair_mask(lp, per, seq_len, causal)
    # staged phases: all logit dots, then all softmaxes, then all AV dots — each
    # phase is a run of independent same-shape ops the scheduler can pipeline,
    # instead of 48 serialized dot->softmax->dot latency chains
    # dtype discipline: inputs stay bf16 into the MXU (bf16 x bf16 -> f32 accumulate;
    # fp32 operands would run the MXU at a fraction of peak), softmax math in f32,
    # probabilities cast back to the input dtype for the AV matmul
    idx = [(g, base) for g in range(gb) for base in range(0, w, tw)]
    for chunk in _stage_chunks(idx, per * lp):
        qs = [_stack_heads(q_ref[g, :, b:b + tw], per, hd) for g, b in chunk]
        ks = [_stack_heads(k_ref[g, :, b:b + tw], per, hd) for g, b in chunk]
        vs = [_row_clean(_stack_heads(v_ref[g, :, b:b + tw], per, hd), lp, seq_len)
              for g, b in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) for qp, kp in zip(qs, ks)]
        ps = []
        for s in ss:
            s = jnp.where(mask, s * scale, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            ps.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(q_ref.dtype))
        os_ = [jax.lax.dot_general(p, vp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) for p, vp in zip(ps, vs)]
        for (g, b), o in zip(chunk, os_):
            o_ref[g, :, b:b + tw] = _unstack_heads(o, per, lp, hd).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, causal: bool, seq_len: int, hd: int):
    """Fused dq/dk/dv with in-kernel softmax recompute. The block-diagonal mask zeroes
    p off-diagonal, so cross-head terms vanish from every product below."""
    gb, lp, w = q_ref.shape
    per = max(min(STACK * LANES // hd, w // hd), 1)
    tw = per * hd
    mask = _pair_mask(lp, per, seq_len, causal)
    # same staged-phase structure as the forward; one (g, tile) at a time would
    # serialize eight dependent ops per iteration
    idx = [(g, base) for g in range(gb) for base in range(0, w, tw)]
    in_dt = q_ref.dtype
    for chunk in _stage_chunks(idx, per * lp, bwd=True):
        qs = [_row_clean(_stack_heads(q_ref[g, :, b:b + tw], per, hd), lp, seq_len)
              for g, b in chunk]
        ks = [_row_clean(_stack_heads(k_ref[g, :, b:b + tw], per, hd), lp, seq_len)
              for g, b in chunk]
        vs = [_row_clean(_stack_heads(v_ref[g, :, b:b + tw], per, hd), lp, seq_len)
              for g, b in chunk]
        dos = [_row_clean(_stack_heads(do_ref[g, :, b:b + tw], per, hd), lp, seq_len)
              for g, b in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) for qp, kp in zip(qs, ks)]
        ps32, ps = [], []
        for s in ss:
            s = jnp.where(mask, s * scale, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            ps32.append(p)
            ps.append(p.astype(in_dt))
        dvs = [jax.lax.dot_general(p, dop, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) for p, dop in zip(ps, dos)]
        dps = [jax.lax.dot_general(dop, vp, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32) for dop, vp in zip(dos, vs)]
        dss = [(p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))).astype(in_dt)
               for p32, dp in zip(ps32, dps)]
        dqs = [jax.lax.dot_general(ds, kp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for ds, kp in zip(dss, ks)]
        dks = [jax.lax.dot_general(ds, qp, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for ds, qp in zip(dss, qs)]
        for (g, b), dq, dk, dv in zip(chunk, dqs, dks, dvs):
            dq_ref[g, :, b:b + tw] = _unstack_heads(dq, per, lp, hd).astype(dq_ref.dtype)
            dk_ref[g, :, b:b + tw] = _unstack_heads(dk, per, lp, hd).astype(dk_ref.dtype)
            dv_ref[g, :, b:b + tw] = _unstack_heads(dv, per, lp, hd).astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# v2 kernel body: lane-masked k/v stacks, (L, per*L) logits, roll-free fold.
# ---------------------------------------------------------------------------

def _seg_masks(lp: int, per: int, tw: int, hd: int, seq_len: int, causal: bool):
    """(kv_mask (n, tw), smask (lp, n)) for the v2 layout.

    kv_mask: row-block i keeps only head i's lanes AND rows within seq_len —
    one mask both selects the contraction lanes and row-cleans OOB key/value rows.
    smask: key position (col % lp) valid (& causal vs the query row)."""
    n = per * lp
    r = jax.lax.broadcasted_iota(jnp.int32, (n, tw), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, tw), 1)
    kv = ((r // lp) == (c // hd)) & ((r % lp) < seq_len)
    qr = jax.lax.broadcasted_iota(jnp.int32, (lp, n), 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, (lp, n), 1)
    kpos = kc % lp
    sm = kpos < seq_len
    if causal:
        sm = sm & (qr >= kpos)
    return kv, sm


def _expand_kv(tile: jnp.ndarray, per: int, kv_mask: jnp.ndarray) -> jnp.ndarray:
    """(Lp, tw) -> (per*Lp, tw): replicate down sublanes (no lane rolls), then mask
    so row-block i holds only head i's lanes (other heads' lanes zero)."""
    if per > 1:
        tile = jnp.concatenate([tile] * per, axis=0)
    return jnp.where(kv_mask, tile, 0)


def _fold_blocks(x: jnp.ndarray, per: int, lp: int, kv_maskf) -> jnp.ndarray:
    """(per*Lp, tw) block-stacked grads -> (Lp, tw) native lanes: mask off the
    cross-head blocks, then sum the per sublane slices (no rotations)."""
    x = x * kv_maskf
    if per == 1:
        return x
    out = x[0:lp]
    for i in range(1, per):
        out = out + x[i * lp:(i + 1) * lp]
    return out


def _stage_chunks_bytes(idx, per_tile_bytes: int, bwd: bool = False):
    """Like _stage_chunks but budgeted on the actual live fp32 bytes per tile
    (v2 logits are (Lp, per*Lp) — half the stacked layout's (per*Lp)^2)."""
    budget = 1 << 20 if bwd else 4 << 20
    k = max(1, budget // max(per_tile_bytes, 1))
    return [idx[i:i + k] for i in range(0, len(idx), k)]


def _fwd_kernel_v2(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
                   seq_len: int, hd: int):
    gb, lp, w = q_ref.shape
    per = max(min(LANES // hd, w // hd), 1)
    tw = per * hd
    n = per * lp
    kv_mask, smask = _seg_masks(lp, per, tw, hd, seq_len, causal)
    # blockmap (n, tw): e @ blockmap puts each column segment's row-sum into the
    # matching head's output lanes — the denominator lands pre-broadcast
    blockmap = kv_mask.astype(jnp.float32)
    in_dt = q_ref.dtype
    idx = [(g, base) for g in range(gb) for base in range(0, w, tw)]
    for chunk in _stage_chunks_bytes(idx, lp * n * 4):
        qs = [q_ref[g, :, b:b + tw] for g, b in chunk]
        ks = [_expand_kv(k_ref[g, :, b:b + tw], per, kv_mask) for g, b in chunk]
        vs = [_expand_kv(v_ref[g, :, b:b + tw], per, kv_mask) for g, b in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for qp, kp in zip(qs, ks)]
        es, ds = [], []
        for s in ss:
            s = jnp.where(smask, s * scale, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)  # row-global: exact per segment
            e = jnp.exp(s - m)
            ds.append(jax.lax.dot_general(e, blockmap, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32))
            es.append(e.astype(in_dt))
        os_ = [jax.lax.dot_general(e, vp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for e, vp in zip(es, vs)]
        for (g, b), o, d in zip(chunk, os_, ds):
            o_ref[g, :, b:b + tw] = (o / d).astype(o_ref.dtype)


def _bwd_kernel_v2(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                   scale: float, causal: bool, seq_len: int, hd: int):
    gb, lp, w = q_ref.shape
    per = max(min(LANES // hd, w // hd), 1)
    tw = per * hd
    n = per * lp
    kv_mask, smask = _seg_masks(lp, per, tw, hd, seq_len, causal)
    kv_maskf = kv_mask.astype(jnp.float32)
    # (n, n) segment map for broadcasting row-sums back over the logit columns
    jr = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jc = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    segmap = ((jr // lp) == (jc // lp)).astype(jnp.float32)
    in_dt = q_ref.dtype
    idx = [(g, base) for g in range(gb) for base in range(0, w, tw)]
    for chunk in _stage_chunks_bytes(idx, lp * n * 4, bwd=True):
        # q and do need explicit row-cleaning: garbage rows would otherwise enter
        # the axis-0 contractions below (k/v rows are cleaned inside _expand_kv)
        qs = [_row_clean(q_ref[g, :, b:b + tw], lp, seq_len) for g, b in chunk]
        ks = [_expand_kv(k_ref[g, :, b:b + tw], per, kv_mask) for g, b in chunk]
        vs = [_expand_kv(v_ref[g, :, b:b + tw], per, kv_mask) for g, b in chunk]
        dos = [_row_clean(do_ref[g, :, b:b + tw], lp, seq_len) for g, b in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for qp, kp in zip(qs, ks)]
        ps32, ps = [], []
        for s in ss:
            s = jnp.where(smask, s * scale, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            d = jax.lax.dot_general(e, segmap, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p = e / d
            ps32.append(p)
            ps.append(p.astype(in_dt))
        dps = [jax.lax.dot_general(dop, vp, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for dop, vp in zip(dos, vs)]
        dss = []
        for p32, dp in zip(ps32, dps):
            r = jax.lax.dot_general(dp * p32, segmap, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            dss.append((p32 * (dp - r) * scale).astype(in_dt))
        dqs = [jax.lax.dot_general(ds, kp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for ds, kp in zip(dss, ks)]
        dvs = [jax.lax.dot_general(p, dop, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for p, dop in zip(ps, dos)]
        dks = [jax.lax.dot_general(ds, qp, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for ds, qp in zip(dss, qs)]
        for (g, b), dq, dk, dv in zip(chunk, dqs, dks, dvs):
            dq_ref[g, :, b:b + tw] = dq.astype(dq_ref.dtype)
            dk_ref[g, :, b:b + tw] = _fold_blocks(dk, per, lp, kv_maskf).astype(dk_ref.dtype)
            dv_ref[g, :, b:b + tw] = _fold_blocks(dv, per, lp, kv_maskf).astype(dv_ref.dtype)


# v2 (lane-masked stacks, roll-free) is the default; v1 kept for A/B benching.
_IMPL = os.environ.get("OCT_SHORT_ATTN_IMPL", "v2")

_INTERPRET = False  # flipped by tests to run kernels off-TPU

# samples per grid step, scaled so VMEM stays within budget: measured safe points are
# GROUP=8 fwd / GROUP=4 bwd at (Lp=64, W=768) — (GROUP=8 bwd measured 17.7M scoped
# vmem > the 16M limit). Larger Lp*W (ViT-L: 272x1024) shrinks the group
# proportionally.
_FWD_BUDGET = 8 * 64 * 768
_BWD_BUDGET = 4 * 64 * 768  # GROUP=8 bwd OOMs the compile at ViT-L/SigLIP shapes


def _pick_group(b: int, lp: int, w: int, budget: int) -> int:
    limit = max(1, budget // (lp * w))
    for gb in (16, 8, 4, 2, 1):
        if gb <= limit and b % gb == 0:
            return gb
    return 1


def _pad(x, lp):
    if x.shape[1] == lp:
        return x
    return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))


def _grid_and_spec(b, lp, w, hd, budget):
    """Full-width blocks when they fit VMEM (best in-program pipelining); otherwise
    grid over head tiles too (ViT-L/H: 272x1024 blocks exceed the fused-bwd budget)."""
    per = max(min(STACK * LANES // hd, w // hd), 1)
    tw = per * hd
    if lp * w > MAX_BLOCK and w > tw:
        gb = _pick_group(b, lp, tw, budget)
        return (b // gb, w // tw), pl.BlockSpec((gb, lp, tw), lambda i, j: (i, 0, j)), ("parallel", "parallel")
    gb = _pick_group(b, lp, w, budget)
    return (b // gb,), pl.BlockSpec((gb, lp, w), lambda i: (i, 0, 0)), ("parallel",)


def _fwd_call(q, k, v, causal, scale, hd):
    b, l, w = q.shape
    lp = _round_up(l, 16)
    # no host-side pad/slice: the (gb, lp, w) block spec over the l-row arrays makes
    # Pallas mask the out-of-bounds rows itself — saves two full q/k/v-sized HBM
    # copies per call (the pad and the out[:, :l] slice). Rows past l are garbage in
    # VMEM but every use is masked: logit cols are masked by seq_len, softmax rows
    # are independent, and garbage output rows are never stored (OOB store mask).
    grid, spec, sem = _grid_and_spec(b, lp, w, hd, _FWD_BUDGET)
    body = _fwd_kernel_v2 if _IMPL == "v2" else _fwd_kernel
    out = pl.pallas_call(
        functools.partial(body, scale=scale, causal=causal, seq_len=l, hd=hd),
        out_shape=jax.ShapeDtypeStruct((b, l, w), q.dtype),
        grid=grid,
        in_specs=[spec] * 3,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * lp * lp * w,
            bytes_accessed=4 * b * lp * w * q.dtype.itemsize,
            transcendentals=b * (w // hd) * lp * lp,
        ),
        interpret=_INTERPRET,
    )(q, k, v)
    return out


def _bwd_call(q, k, v, do, causal, scale, hd):
    b, l, w = q.shape
    lp = _round_up(l, 16)
    grid, spec, sem = _grid_and_spec(b, lp, w, hd, _BWD_BUDGET)
    shape = jax.ShapeDtypeStruct((b, l, w), q.dtype)
    body = _bwd_kernel_v2 if _IMPL == "v2" else _bwd_kernel
    dq, dk, dv = pl.pallas_call(
        functools.partial(body, scale=scale, causal=causal, seq_len=l, hd=hd),
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        compiler_params=pltpu.CompilerParams(dimension_semantics=sem),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * lp * lp * w,
            bytes_accessed=7 * b * lp * w * q.dtype.itemsize,
            transcendentals=b * (w // hd) * lp * lp,
        ),
        interpret=_INTERPRET,
    )(q, k, v, do)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _short_attn(q, k, v, causal, scale, hd):
    return _fwd_call(q, k, v, causal, scale, hd)


def _short_fwd(q, k, v, causal, scale, hd):
    return _fwd_call(q, k, v, causal, scale, hd), (q, k, v)


def _short_bwd(causal, scale, hd, res, g):
    q, k, v = res
    return _bwd_call(q, k, v, g, causal, scale, hd)


_short_attn.defvjp(_short_fwd, _short_bwd)


# largest Lp * (H*hd) block the fused bwd fits in VMEM (empirical: SigLIP-B-16's
# 208x768 compiles; ViT-L-14's 272x1024 needs 17.4M scoped vmem > the 16M limit)
MAX_BLOCK = 208 * 768


def supports(l: int, h: int, hd: int, bias) -> bool:
    """Can this kernel serve the given attention shape?"""
    if bias is not None or l > MAX_SEQ:
        return False
    if hd not in (32, 64, 128):
        return False
    per_tile = max(min(STACK * LANES // hd, h), 1)
    return h % per_tile == 0


def short_attention(
    q: jax.Array,  # (B, L, H, hd)
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused single-block attention for L <= MAX_SEQ. Differentiable (fused Pallas
    backward, exact gradients). Self-attention only (Lq == Lk)."""
    assert q.shape == k.shape == v.shape, "short_attention assumes self-attention shapes"
    b, l, h, hd = q.shape
    assert l <= MAX_SEQ
    if scale is None:
        scale = hd ** -0.5
    flat = lambda x: x.reshape(b, l, h * hd)  # contiguous: free reshape, no relayout
    out = _short_attn(flat(q), flat(k), flat(v), causal, scale, hd)
    return out.reshape(b, l, h, hd)
