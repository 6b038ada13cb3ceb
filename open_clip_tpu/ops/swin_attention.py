"""Panel window attention — Pallas TPU kernel that folds Swin's window
partition/reverse into the attention kernel itself.

Round-5 CLAP trace (docs/ROUND5.md): after the first fused window-attention
kernel (ops/window_attention.py) the remaining step cost concentrated at the
kernel *boundaries* — ``window_partition``/``window_reverse`` transposes and
their ``transpose_jvp`` twins (~14 ms/step on ``bf16[8192,64,96]``), plus
materialized ``{2,1,0}<->{0,2,1}`` relayout copies around every kernel call
(~6-8 ms) and the scheduling stalls in front of each. All of that is data
movement created by handing the kernel *pre-partitioned* ``(B*nW, N, C)``
windows.

This kernel removes the partitioned form entirely:

- q/k/v arrive in the tower's native ``(B, H*W, C)`` token layout — the
  qkv/proj matmuls' own layout, so there is nothing for XLA to relayout.
- The grid walks (sample-block, window-row): each step sees a ``(gb, ws*W, C)``
  panel — ``ws`` full image rows. A window's ``N = ws*ws`` tokens are ``ws``
  *static* sublane slices of the panel (``rows r*W + wx*ws .. +ws``),
  assembled by one VMEM concat — the partition transpose becomes register
  traffic instead of an HBM pass.
- Outputs scatter straight back to the panel rows, so ``window_reverse``
  disappears too; the windows of a panel tile it exactly, every row is
  written once.
- The shifted-window roll stays *outside* (``jnp.roll`` over the (H, W) view
  is layout-preserving concat/slice copies — the trace showed transposes, not
  rolls, were the cost).
- The attention math reuses the masked-head-stacking design of
  ``ops/window_attention.py`` (disjoint-lane head isolation, ph=2 row
  pairing, additive (nW, H, N, N) bias with a differentiable backward that
  accumulates dbias across the sample grid dimension).

Reference semantics: HTSAT window attention
``/root/reference/src/open_clip/audio/htsat.py:342-430`` and timm Swin
(``src/open_clip/timm_model.py:25`` towers); the partition/reverse being
folded here is ``htsat.py:254-274``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention import (
    NEG_INF,
    _comb_bias,
    _lane_mask,
    _stage_chunks,
    _unstack_sum,
)

_INTERPRET = False  # flipped by tests to run kernels off-TPU

# dispatch: models/htsat.py prefers this kernel when the shape qualifies
# (ws == 8 panels), falling back to ops/window_attention.py and then dense.
SWIN_PANEL_KERNEL = True

_FWD_CHUNK_BYTES = 4 << 20
_BWD_CHUNK_BYTES = 1 << 20


def _stack_tile(tile: jnp.ndarray, g: int, ph: int, hd: int) -> jnp.ndarray:
    """(N, C) assembled window -> (ph*N, C) row-stacked masked head copies
    (window_attention._stack without the row padding: panels have no garbage
    rows, N is sublane-aligned by supports())."""
    parts = []
    for j in range(ph):
        hh = g * ph + j
        parts.append(jnp.where(_lane_mask(tile.shape, hh * hd, (hh + 1) * hd),
                               tile, 0))
    return parts[0] if ph == 1 else jnp.concatenate(parts, axis=0)


def _diag_mask(ph: int, n: int) -> Optional[jnp.ndarray]:
    """(ph*n, ph*n) same-head block-diagonal mask; None when ph == 1 (no
    cross-head blocks and no padded rows to clean)."""
    if ph == 1:
        return None
    t = ph * n
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return (rows // n) == (cols // n)


def _gather_window(ref, g: int, wx: int, ws: int, wr: int):
    """Assemble window wx's (ws*ws, C) tile from ``ws`` static sublane slices
    of the (gb, ws*W, C) panel block. wr = W (panel row stride)."""
    chunks = [ref[g, r * wr + wx * ws:r * wr + wx * ws + ws, :]
              for r in range(ws)]
    return chunks[0] if ws == 1 else jnp.concatenate(chunks, axis=0)


def _scatter_window(ref, tile: jnp.ndarray, g: int, wx: int, ws: int, wr: int):
    """Write a (ws*ws, C) window tile back to its panel rows."""
    for r in range(ws):
        ref[g, r * wr + wx * ws:r * wr + wx * ws + ws, :] = (
            tile[r * ws:(r + 1) * ws].astype(ref.dtype))


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                ws: int, wr: int, heads: int, ph: int, bshared: bool):
    gb, _, c = q_ref.shape
    hd = c // heads
    n = ws * ws
    nwx = wr // ws
    diag = _diag_mask(ph, n)
    in_dt = q_ref.dtype
    idx = [(g, wx, hg) for g in range(gb) for wx in range(nwx)
           for hg in range(heads // ph)]
    tiles = {}

    def _win(ref, tag, g, wx):
        key = (tag, g, wx)
        if key not in tiles:
            tiles[key] = _gather_window(ref, g, wx, ws, wr)
        return tiles[key]

    acc = {}
    for chunk in _stage_chunks(idx, ph * n, _FWD_CHUNK_BYTES):
        qs = [_stack_tile(_win(q_ref, 0, g, wx), hg, ph, hd)
              for g, wx, hg in chunk]
        ks = [_stack_tile(_win(k_ref, 1, g, wx), hg, ph, hd)
              for g, wx, hg in chunk]
        vs = [_stack_tile(_win(v_ref, 2, g, wx), hg, ph, hd)
              for g, wx, hg in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for qp, kp in zip(qs, ks)]
        ps = []
        for (g, wx, hg), s in zip(chunk, ss):
            bw = 0 if bshared else wx
            s = s * scale + _comb_bias(bias_ref, bw, hg, ph, n)
            if diag is not None:
                s = jnp.where(diag, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            ps.append((p / jnp.sum(p, axis=-1, keepdims=True)).astype(in_dt))
        os_ = [jax.lax.dot_general(p, vp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               for p, vp in zip(ps, vs)]
        for (g, wx, hg), o in zip(chunk, os_):
            part = _unstack_sum(o, ph, n, n)
            key = (g, wx)
            acc[key] = part if key not in acc else acc[key] + part
    for (g, wx), tile in acc.items():
        _scatter_window(o_ref, tile, g, wx, ws, wr)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale: float,
                ws: int, wr: int, heads: int, ph: int, bshared: bool):
    gb, _, c = q_ref.shape
    hd = c // heads
    n = ws * ws
    nwx = wr // ws
    diag = _diag_mask(ph, n)
    in_dt = q_ref.dtype

    if bshared:
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)
    else:
        @pl.when(pl.program_id(1) == 0)
        def _init():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    idx = [(g, wx, hg) for g in range(gb) for wx in range(nwx)
           for hg in range(heads // ph)]
    tiles = {}

    def _win(ref, tag, g, wx):
        key = (tag, g, wx)
        if key not in tiles:
            tiles[key] = _gather_window(ref, g, wx, ws, wr)
        return tiles[key]

    dq_acc, dk_acc, dv_acc = {}, {}, {}
    for chunk in _stage_chunks(idx, ph * n, _BWD_CHUNK_BYTES):
        qs = [_stack_tile(_win(q_ref, 0, g, wx), hg, ph, hd)
              for g, wx, hg in chunk]
        ks = [_stack_tile(_win(k_ref, 1, g, wx), hg, ph, hd)
              for g, wx, hg in chunk]
        vs = [_stack_tile(_win(v_ref, 2, g, wx), hg, ph, hd)
              for g, wx, hg in chunk]
        dos = [_stack_tile(_win(do_ref, 3, g, wx), hg, ph, hd)
               for g, wx, hg in chunk]
        ss = [jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for qp, kp in zip(qs, ks)]
        ps32, ps = [], []
        for (g, wx, hg), s in zip(chunk, ss):
            bw = 0 if bshared else wx
            s = s * scale + _comb_bias(bias_ref, bw, hg, ph, n)
            if diag is not None:
                s = jnp.where(diag, s, NEG_INF)
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
        for (g, wx, hg), ds in zip(chunk, dss):
            bw = 0 if bshared else wx
            for j in range(ph):
                blk = ds[j * n:(j + 1) * n, j * n:(j + 1) * n] if ph > 1 else ds
                dbias_ref[bw, hg * ph + j] += blk
        dsb = [ds.astype(in_dt) for ds in dss]
        dqs = [jax.lax.dot_general(ds, kp, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for ds, kp in zip(dsb, ks)]
        dks = [jax.lax.dot_general(ds, qp, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
               for ds, qp in zip(dsb, qs)]
        for (g, wx, hg), dq, dk, dv in zip(chunk, dqs, dks, dvs):
            key = (g, wx)
            for accs, val in ((dq_acc, dq), (dk_acc, dk), (dv_acc, dv)):
                part = _unstack_sum(val, ph, n, n)
                accs[key] = part if key not in accs else accs[key] + part
    for (g, wx), tile in dq_acc.items():
        _scatter_window(dq_ref, tile, g, wx, ws, wr)
        _scatter_window(dk_ref, dk_acc[(g, wx)], g, wx, ws, wr)
        _scatter_window(dv_ref, dv_acc[(g, wx)], g, wx, ws, wr)


def _pick_gb(b: int, panel_bytes: int, bwd: bool) -> int:
    # cap the per-operand panel block (4 operands fwd / 7 bwd, double-buffered
    # by the pipeline) so total blocked VMEM stays ~2-4 MB
    budget = (256 << 10) if bwd else (512 << 10)
    for gb in (8, 4, 2, 1):
        if b % gb == 0 and gb * panel_bytes <= budget:
            return gb
    return 1


def _ph_for(heads: int) -> int:
    return 2 if heads % 2 == 0 else 1


def _fwd_call(q, k, v, bias, scale, h, w, ws):
    b, l, c = q.shape
    nw_b, heads, n, _ = bias.shape
    ph = _ph_for(heads)
    nwy, nwx = h // ws, w // ws
    gb = _pick_gb(b, ws * w * c * q.dtype.itemsize, bwd=False)
    spec = pl.BlockSpec((gb, ws * w, c), lambda i, j: (i, j, 0))
    bspec = pl.BlockSpec((nwx if nw_b > 1 else 1, heads, n, n),
                         lambda i, j: ((j if nw_b > 1 else 0), 0, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, ws=ws, wr=w, heads=heads,
                          ph=ph, bshared=nw_b == 1),
        out_shape=jax.ShapeDtypeStruct((b, l, c), q.dtype),
        grid=(b // gb, nwy),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nwy * nwx * heads * ph * n * n * c,
            bytes_accessed=4 * b * l * c * q.dtype.itemsize + bias.size * 4,
            transcendentals=b * nwy * nwx * heads * ph * n * n,
        ),
        interpret=_INTERPRET,
    )(q, k, v, bias)


def _bwd_call(q, k, v, bias, do, scale, h, w, ws):
    b, l, c = q.shape
    nw_b, heads, n, _ = bias.shape
    ph = _ph_for(heads)
    nwy, nwx = h // ws, w // ws
    gb = _pick_gb(b, ws * w * c * q.dtype.itemsize, bwd=True)
    spec = pl.BlockSpec((gb, ws * w, c), lambda j, t: (t, j, 0))
    bspec = pl.BlockSpec((nwx if nw_b > 1 else 1, heads, n, n),
                         lambda j, t: ((j if nw_b > 1 else 0), 0, 0, 0))
    shape = jax.ShapeDtypeStruct((b, l, c), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, ws=ws, wr=w, heads=heads,
                          ph=ph, bshared=nw_b == 1),
        out_shape=(shape, shape, shape,
                   jax.ShapeDtypeStruct(bias.shape, jnp.float32)),
        grid=(nwy, b // gb),
        in_specs=[spec, spec, spec, bspec, spec],
        out_specs=(spec, spec, spec, bspec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * nwy * nwx * heads * ph * n * n * c,
            bytes_accessed=7 * b * l * c * q.dtype.itemsize + 2 * bias.size * 4,
            transcendentals=b * nwy * nwx * heads * ph * n * n,
        ),
        interpret=_INTERPRET,
    )(q, k, v, bias, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _panel_attn(q, k, v, bias, scale, h, w, ws):
    return _fwd_call(q, k, v, bias, scale, h, w, ws)


def _pa_fwd(q, k, v, bias, scale, h, w, ws):
    return _fwd_call(q, k, v, bias, scale, h, w, ws), (q, k, v, bias)


def _pa_bwd(scale, h, w, ws, res, g):
    q, k, v, bias = res
    return _bwd_call(q, k, v, bias, g, scale, h, w, ws)


_panel_attn.defvjp(_pa_fwd, _pa_bwd)


def enabled() -> bool:
    """Kernel dispatch gate: real TPU, or interpret mode (tests)."""
    if not SWIN_PANEL_KERNEL:
        return False
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def supports(h: int, w: int, ws: int, heads: int, c: int, b: int) -> bool:
    """Panel kernel shape gate: ws==8 keeps every slice sublane-aligned and
    n = 64 garbage-free (HTSAT stages; Swin-vision's ws=7 keeps the windowed
    kernel). Panels must tile the map and C must stay within one lane tile
    group."""
    if ws != 8 or h % ws or w % ws or c % heads or c > 1024:
        return False
    n = ws * ws
    if c // heads < 8:  # lane-mask head isolation wants >=8-lane heads
        return False
    return n * _ph_for(heads) <= 256 and b >= 1


def panel_attention(
    q: jax.Array,  # (B, H*W, C) — native token layout, NOT partitioned
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,  # (nW, H, N, N) additive (rel-pos + shift mask) or (1, ...)
    *,
    hw: Tuple[int, int],
    ws: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """Fused Swin window attention over the un-partitioned token map. Window
    (wy, wx) of sample b attends within itself under ``bias[wy*nWx+wx]``
    (or ``bias[0]`` when shared); output rows land back in token order."""
    h, w = hw
    b, l, c = q.shape
    nw_b, heads, n, _ = bias.shape
    assert l == h * w and n == ws * ws
    assert nw_b == 1 or nw_b == (h // ws) * (w // ws)
    if scale is None:
        scale = (c // heads) ** -0.5
    return _panel_attn(q, k, v, bias.astype(jnp.float32), scale, h, w, ws)
