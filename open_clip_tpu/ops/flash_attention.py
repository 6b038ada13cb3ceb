"""Flash attention for TPU — Pallas kernel.

Tiled online-softmax attention replacing the reference's
``F.scaled_dot_product_attention`` (reference ``src/open_clip/transformer.py:223``) on
the TPU hot path. Forward is a Pallas kernel: per (batch*head, q-block) program, K/V
stream through VMEM in blocks with fp32 running max/sum accumulators (the standard
flash construction), so the L x L score matrix never materializes in HBM. Backward is
a recompute-based VJP through the einsum formulation (exact gradients; a fused Pallas
backward is a later optimization).

Long-sequence towers (NaFlex / GenLIP at 1k-4k tokens) are the target; at classic CLIP
lengths (50-257) XLA's fused softmax is already fine and dispatch stays on that path
(see ops/attention.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, block_k: int, seq_len: int):
    """One program: one q block (block_q, hd) vs all k/v blocks of this batch-head."""
    block_q = q_ref.shape[1]
    hd = q_ref.shape[2]
    qi = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32) * scale  # (bq, hd)

    num_kb = pl.cdiv(seq_len, block_k)
    if causal:
        # only blocks up to (and including) the diagonal contribute
        num_kb_eff = pl.cdiv((qi + 1) * block_q, block_k)
    else:
        num_kb_eff = num_kb

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)  # (bk, hd)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk)
        if causal:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(rows >= cols, s, NEG_INF)
        # mask k-padding beyond seq_len
        cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(cols < seq_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1)  # (bq,)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])  # (bq, bk)
        alpha = jnp.exp(m_prev - m_new)  # (bq,)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, hd), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb_eff, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _flash_forward(
    q: jax.Array,  # (B, L, H, hd)
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool,
    scale: float,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, lq, h, hd = q.shape
    lk = k.shape[1]
    assert lq == lk, "flash kernel assumes self-attention lengths"

    # (B, L, H, hd) -> (B*H, L, hd)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], hd)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    if lq_pad != lq:
        qb = jnp.pad(qb, ((0, 0), (0, lq_pad - lq), (0, 0)))
    if lk_pad != lk:
        kb = jnp.pad(kb, ((0, 0), (0, lk_pad - lk), (0, 0)))
        vb = jnp.pad(vb, ((0, 0), (0, lk_pad - lk), (0, 0)))

    grid = (b * h, lq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_fa_kernel, scale=scale, causal=causal, block_k=block_k, seq_len=lk),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, lk_pad, hd), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, lk_pad, hd), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bh, i: (bh, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * hd,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :lq].reshape(b, h, lq, hd).transpose(0, 2, 1, 3)
    return out


def _reference_attention(q, k, v, *, causal, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        lq, lk = q.shape[1], k.shape[1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool), k=lk - lq)
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, causal, scale):
    return _flash_forward(q, k, v, causal=causal, scale=scale)


def _flash_fwd(q, k, v, causal, scale):
    return _flash_forward(q, k, v, causal=causal, scale=scale), (q, k, v)


def _flash_bwd(causal, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _reference_attention(a, b, c, causal=causal, scale=scale), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    """(B, L, H, hd) x3 -> (B, L, H, hd). Differentiable."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, causal, scale)
