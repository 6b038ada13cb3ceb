"""Flash attention for TPU — Pallas forward AND backward kernels.

Tiled online-softmax attention replacing the reference's
``F.scaled_dot_product_attention`` (reference ``src/open_clip/transformer.py:223``) on
the TPU hot path. Forward is a Pallas kernel: per (batch*head, q-block) program, K/V
stream through VMEM in blocks with fp32 running max/sum accumulators (the standard
flash construction), so the L x L score matrix never materializes in HBM. The forward
additionally emits the per-row logsumexp; backward recomputes block softmax from
(q, k, lse) inside two Pallas kernels (dq; dk/dv) — exact gradients with O(L) memory,
never an (L, L) intermediate.

Masks live in-kernel: a (B, L) key-validity vector (the NaFlex ``patch_valid``
contract) and a static ``prefix_len`` (GenLIP prefix-LM: first ``prefix_len`` keys
bidirectional, rest causal) — neither ever materializes as a (B, 1, S, S) bias.
Operands flow at their native (bf16) dtype into the MXU with fp32 accumulation;
blocks default to 512x1024 (measured 4.7x over 128x128 at L=1024).

Long-sequence towers (NaFlex / GenLIP at 1k-4k tokens) are the target; at classic CLIP
lengths (50-288) the fused short-sequence kernel wins (measured 2-5x; see
ops/short_attention.py and the dispatch in ops/attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Large-negative instead of -inf so exp(masked - masked) never hits NaN.
NEG_INF = float(jnp.finfo(jnp.float32).min) * 0.5


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fa_fwd_kernel(q_ref, k_ref, v_ref, kv_ref, o_ref, lse_ref, *, scale: float,
                   causal: bool, block_k: int, seq_len: int, prefix_len: int = 0):
    """One program: one q block (block_q, hd) vs all k/v blocks of this batch-head."""
    block_q = q_ref.shape[1]
    hd = q_ref.shape[2]
    qi = pl.program_id(1)

    # dtype discipline (same as ops/short_attention.py): inputs stay in their native
    # (bf16) dtype into the MXU — fp32 operands run the MXU at a fraction of peak —
    # with fp32 accumulation; softmax math in fp32; probabilities cast back for PV
    q = q_ref[0]  # (bq, hd), native dtype

    num_kb = pl.cdiv(seq_len, block_k)
    if causal and not prefix_len:
        # only blocks up to (and including) the diagonal contribute
        num_kb_eff = pl.cdiv((qi + 1) * block_q, block_k)
        num_kb_eff = jnp.minimum(num_kb_eff, num_kb)
    elif causal:
        # prefix-LM: blocks covering the bidirectional prefix also contribute
        num_kb_eff = jnp.maximum(
            jnp.minimum(pl.cdiv((qi + 1) * block_q, block_k), num_kb),
            pl.cdiv(prefix_len, block_k))
    else:
        num_kb_eff = num_kb

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]  # (bk, hd)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk) f32
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            allowed = rows >= cols
            if prefix_len:
                allowed = allowed | (cols < prefix_len)
            s = jnp.where(allowed, s, NEG_INF)
        # mask k-padding beyond seq_len and invalid keys (NaFlex patch_valid)
        kvb = kv_ref[0, 0, pl.ds(ki * block_k, block_k)]  # (bk,) f32 1/0
        s = jnp.where((cols < seq_len) & (kvb[None, :] > 0), s, NEG_INF)

        m_cur = jnp.max(s, axis=-1)  # (bq,)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])  # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)  # (bq,)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, hd), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb_eff, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(l_safe)


def _flash_forward(
    qb: jax.Array,  # (BH, Lp, hd), already padded to block multiples
    kb: jax.Array,
    vb: jax.Array,
    kvb: jax.Array,  # (BH, 1, Lp) f32 key-validity
    *,
    causal: bool,
    scale: float,
    seq_len: int,
    block_q: int,
    block_k: int,
    prefix_len: int = 0,
    interpret: bool = False,
):
    bh, lq_pad, hd = qb.shape
    lk_pad = kb.shape[1]
    grid = (bh, lq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_fa_fwd_kernel, scale=scale, causal=causal, block_k=block_k,
                          seq_len=seq_len, prefix_len=prefix_len),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, hd), qb.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lk_pad, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, lk_pad, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, lk_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_pad * lk_pad * hd,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(qb, kb, vb, kvb)
    return out, lse


# ---------------------------------------------------------------------------
# backward: dq kernel (per q block, loop over k blocks)
# ---------------------------------------------------------------------------

def _fa_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, kv_ref, dq_ref, *,
                      scale: float, causal: bool, block_k: int, seq_len: int,
                      prefix_len: int = 0):
    block_q = q_ref.shape[1]
    hd = q_ref.shape[2]
    qi = pl.program_id(1)

    q = q_ref[0]  # (bq, hd) native dtype — bf16 into the MXU, f32 accumulation
    do = do_ref[0]  # (bq, hd)
    lse = lse_ref[0, 0]  # (bq,)
    di = di_ref[0, 0]  # (bq,)
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    num_kb = pl.cdiv(seq_len, block_k)
    if causal and not prefix_len:
        num_kb_eff = jnp.minimum(pl.cdiv((qi + 1) * block_q, block_k), num_kb)
    elif causal:
        num_kb_eff = jnp.maximum(
            jnp.minimum(pl.cdiv((qi + 1) * block_q, block_k), num_kb),
            pl.cdiv(prefix_len, block_k))
    else:
        num_kb_eff = num_kb

    def body(ki, dq):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        kvb = kv_ref[0, 0, pl.ds(ki * block_k, block_k)]
        mask = (cols < seq_len) & (kvb[None, :] > 0)
        if causal:
            allowed = rows >= cols
            if prefix_len:
                allowed = allowed | (cols < prefix_len)
            mask = mask & allowed
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)  # (bq, bk) f32
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = (p * (dp - di[:, None])).astype(k.dtype)
        return dq + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_kb_eff, body, jnp.zeros((block_q, hd), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# backward: dk/dv kernel (per k block, loop over q blocks)
# ---------------------------------------------------------------------------

def _fa_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, kv_ref,
                       dk_ref, dv_ref, *,
                       scale: float, causal: bool, block_q: int, seq_len: int,
                       prefix_len: int = 0):
    block_k = k_ref.shape[1]
    hd = k_ref.shape[2]
    ki = pl.program_id(1)

    k = k_ref[0]  # (bk, hd) native dtype
    v = v_ref[0]
    cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    lq_pad = q_ref.shape[1]
    num_qb = lq_pad // block_q
    if causal and not prefix_len:
        # only q blocks at/after this k block's diagonal contribute
        first_qb = (ki * block_k) // block_q
    elif causal:
        # prefix keys are visible to every q row; traced with a concrete ki is fine
        # (python int arithmetic on grid ids is static per program)
        first_qb = jnp.where(ki * block_k < prefix_len, 0, (ki * block_k) // block_q)
    else:
        first_qb = 0

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :]  # native dtype
        do = do_ref[0, pl.ds(qi * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)]
        di = di_ref[0, 0, pl.ds(qi * block_q, block_q)]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk) f32
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        kvb = kv_ref[0, 0]  # (bk,) validity of this k block
        mask = (cols < seq_len) & (rows < seq_len) & (kvb[None, :] > 0)
        if causal:
            allowed = rows >= cols
            if prefix_len:
                allowed = allowed | (cols < prefix_len)
            mask = mask & allowed
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        pb = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(
            pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, hd)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        ds = (p * (dp - di[:, None])).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, hd) — `scale` applied once on store below
        return dk, dv

    dk0 = jnp.zeros((block_k, hd), jnp.float32)
    dv0 = jnp.zeros((block_k, hd), jnp.float32)
    dk, dv = jax.lax.fori_loop(first_qb, num_qb, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dq(qb, kb, vb, dob, lse, di, kvb, *, causal, scale, seq_len, block_q, block_k,
            prefix_len=0, interpret=False):
    bh, lq_pad, hd = qb.shape
    lk_pad = kb.shape[1]
    grid = (bh, lq_pad // block_q)
    return pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, scale=scale, causal=causal,
                          block_k=block_k, seq_len=seq_len, prefix_len=prefix_len),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, hd), qb.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lk_pad, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, lk_pad, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, lk_pad), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda b, i: (b, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * lq_pad * lk_pad * hd,
            bytes_accessed=(qb.size * 3 + kb.size * 2) * qb.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(qb, kb, vb, dob, lse, di, kvb)


def _bwd_dkv(qb, kb, vb, dob, lse, di, kvb, *, causal, scale, seq_len, block_q, block_k,
             prefix_len=0, interpret=False):
    bh, lq_pad, hd = qb.shape
    lk_pad = kb.shape[1]
    grid = (bh, lk_pad // block_k)
    return pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, scale=scale, causal=causal,
                          block_q=block_q, seq_len=seq_len, prefix_len=prefix_len),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk_pad, hd), kb.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, hd), vb.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, lq_pad, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lq_pad, hd), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, lq_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, lq_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i: (b, 0, i)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda b, i: (b, i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * lq_pad * lk_pad * hd,
            bytes_accessed=(qb.size * 3 + kb.size * 2) * qb.dtype.itemsize,
            transcendentals=bh * lq_pad * lk_pad,
        ),
        interpret=interpret,
    )(qb, kb, vb, dob, lse, di, kvb)


def _reference_attention(q, k, v, *, causal, scale):
    """Dense einsum attention (testing oracle only — materializes (L, L))."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        lq, lk = q.shape[1], k.shape[1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool), k=lk - lq)
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# custom VJP wiring
# ---------------------------------------------------------------------------

_INTERPRET = False  # flipped by tests to run kernels off-TPU


def _blocks_for(seq_len: int, block_q: int, block_k: int):
    """Clamp blocks so they DIVIDE the 128-padded sequence — the grid covers
    lq_pad/block_q programs, so a non-dividing block would silently drop rows."""
    lp = _round_up(seq_len, 128)
    bq = next(c for c in (block_q, 512, 384, 256, 128) if c <= lp and lp % c == 0)
    bk = next(c for c in (block_k, 1024, 512, 384, 256, 128) if c <= lp and lp % c == 0)
    return bq, bk


def _to_bh(x):
    b, l, h, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, l, hd)


def _from_bh(x, b, h):
    bh, l, hd = x.shape
    return x.reshape(b, h, l, hd).transpose(0, 2, 1, 3)


def _pad_seq(x, lp):
    if x.shape[1] == lp:
        return x
    return jnp.pad(x, ((0, 0), (0, lp - x.shape[1]), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, kvalid, causal, scale, block_q, block_k, prefix_len):
    out, _ = _flash_fwd_impl(q, k, v, kvalid, causal, scale, block_q, block_k, prefix_len)
    return out


def _kv_to_bh(kvalid, h, lp):
    """(B, Lk) f32 validity -> (B*H, 1, Lp), padding rows invalid."""
    b, l = kvalid.shape
    kvb = jnp.repeat(kvalid[:, None, None, :], h, axis=1).reshape(b * h, 1, l)
    if l != lp:
        kvb = jnp.pad(kvb, ((0, 0), (0, 0), (0, lp - l)))
    return kvb


def _flash_fwd_impl(q, k, v, kvalid, causal, scale, block_q, block_k, prefix_len=0):
    b, l, h, hd = q.shape
    assert k.shape[1] == l, "flash kernel assumes self-attention lengths"
    bq, bk = _blocks_for(l, block_q, block_k)
    lp = _round_up(l, 128)
    qb = _pad_seq(_to_bh(q), lp)
    kb = _pad_seq(_to_bh(k), lp)
    vb = _pad_seq(_to_bh(v), lp)
    kvb = _kv_to_bh(kvalid, h, lp)
    ob, lse = _flash_forward(qb, kb, vb, kvb, causal=causal, scale=scale, seq_len=l,
                             block_q=bq, block_k=bk, prefix_len=prefix_len,
                             interpret=_INTERPRET)
    out = _from_bh(ob[:, :l], b, h)
    return out, (qb, kb, vb, kvb, ob, lse)


def _flash_fwd(q, k, v, kvalid, causal, scale, block_q, block_k, prefix_len):
    out, res = _flash_fwd_impl(q, k, v, kvalid, causal, scale, block_q, block_k, prefix_len)
    return out, (res, q.shape)


def _flash_bwd(causal, scale, block_q, block_k, prefix_len, res_shape, g):
    (qb, kb, vb, kvb, ob, lse), (b, l, h, hd) = res_shape
    bq, bk = _blocks_for(l, block_q, block_k)
    dob = _pad_seq(_to_bh(g), qb.shape[1])
    # di = rowsum(o * do) in fp32 — tiny fused elementwise reduce, O(L) memory
    di = jnp.sum(ob.astype(jnp.float32) * dob.astype(jnp.float32), axis=-1)[:, None, :]
    dq = _bwd_dq(qb, kb, vb, dob, lse, di, kvb, causal=causal, scale=scale, seq_len=l,
                 block_q=bq, block_k=bk, prefix_len=prefix_len, interpret=_INTERPRET)
    dk, dv = _bwd_dkv(qb, kb, vb, dob, lse, di, kvb, causal=causal, scale=scale, seq_len=l,
                      block_q=bq, block_k=bk, prefix_len=prefix_len, interpret=_INTERPRET)
    return (_from_bh(dq[:, :l], b, h), _from_bh(dk[:, :l], b, h),
            _from_bh(dv[:, :l], b, h), jnp.zeros((b, l), jnp.float32))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    key_valid: Optional[jax.Array] = None,  # (B, Lk) bool/float key-padding mask
    prefix_len: int = 0,  # static: first `prefix_len` keys bidirectional (prefix-LM)
) -> jax.Array:
    """(B, L, H, hd) x3 -> (B, L, H, hd). Differentiable; fwd and bwd are Pallas
    kernels with O(L) memory (no (L, L) intermediate ever hits HBM).
    ``key_valid`` masks padded keys in-kernel (the NaFlex ``patch_valid`` contract)
    without ever forming a (B, 1, 1, L) bias.

    Default blocks are large (512 x 1024, clamped to the padded sequence): the
    per-k-block loop overhead dominates at small blocks — measured at
    (B16, L1024, H12, hd64): 128x128 blocks run 10 TF/s, 512x1024 run 47.6 TF/s
    (4.7x), fwd+bwd 9.4 -> 2.3 ms/layer."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    lq = _round_up(q.shape[1], 128)
    lk = _round_up(k.shape[1], 128)
    if block_q is None:
        block_q = min(512, lq)
    if block_k is None:
        block_k = min(1024, lk)
    if key_valid is None:
        kvalid = jnp.ones((q.shape[0], k.shape[1]), jnp.float32)
    else:
        kvalid = key_valid.astype(jnp.float32)
    if prefix_len:
        assert causal, "prefix_len implies the causal (prefix-LM) mask"
    return _flash(q, k, v, kvalid, causal, scale, block_q, block_k, int(prefix_len))
