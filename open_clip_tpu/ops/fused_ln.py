"""Fused LayerNorm backward — Pallas TPU kernel.

The forward stays plain XLA (it fuses into adjacent elementwise/matmul ops and
is bandwidth-optimal there). The BACKWARD is where XLA loses: the flagship
trace shows ~12-14 ms/step of LN-bwd fusions at ~5x off the bandwidth bound —
XLA stages the (rows,) statistics and the cross-row dscale/dbias reductions
through scratch memory in separate passes over the data. This kernel emits dx
and per-block dscale/dbias partials in ONE pass over x/dy per row-block; the
(G, W) partials are summed outside (a trivially fused reduction).

Math (fp32 throughout, matching ops.layers.layer_norm's fp32-stat semantics):
    mu = mean(x); inv = rsqrt(var(x) + eps); xhat = (x - mu) * inv
    g = dy * scale
    dx  = inv * (g - mean(g) - xhat * mean(g * xhat))        [per row]
    dscale = sum_rows(dy * xhat);  dbias = sum_rows(dy)

Dispatch: real TPU, last dim a multiple of 128 (<= 4096), >= 256 rows; every
other shape (qk-norm per-head hd=64, tiny test towers, CPU) falls back to the
autodiff of the plain forward — bitwise-identical semantics, since the kernel
recomputes the same fp32 statistics the forward produced.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests to run the kernel off-TPU

BLOCK_ROWS = 256
MAX_W = 4096


def _bwd_kernel(x_ref, dy_ref, scale_ref, dx_ref, ds_ref, db_ref, *,
                eps: float, n_rows: int, block_rows: int):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    w = x.shape[-1]

    # rows past n_rows in the final block are out-of-bounds garbage: zero their
    # contribution to the partial sums (their dx stores are masked by Pallas)
    row0 = i * block_rows
    rid = row0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = rid < n_rows
    dy = jnp.where(valid, dy, 0.0)
    x = jnp.where(valid, x, 0.0)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv

    scale = scale_ref[...].astype(jnp.float32)
    g = dy * scale[None, :]
    mg = jnp.mean(g, axis=-1, keepdims=True)
    mgx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx = inv * (g - mg - xhat * mgx)

    dx_ref[...] = dx.astype(dx_ref.dtype)
    # partial-sum blocks are (8, W): Mosaic requires the sublane dim of a block
    # to be a multiple of 8, so the per-block row-sum lands in row 0 with zero
    # padding below (the outer .sum(0) over all rows is unaffected)
    pad = jnp.zeros((7, dy.shape[-1]), jnp.float32)
    ds_ref[...] = jnp.concatenate([jnp.sum(dy * xhat, axis=0, keepdims=True), pad])
    db_ref[...] = jnp.concatenate([jnp.sum(dy, axis=0, keepdims=True), pad])


def _ln_bwd_pallas(x2, dy2, scale, eps):
    """x2/dy2: (R, W). -> dx (R, W) in x2.dtype, dscale (W,) f32, dbias (W,) f32."""
    r, w = x2.shape
    br = BLOCK_ROWS
    grid = (r + br - 1) // br
    dx, ds_p, db_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, n_rows=r, block_rows=br),
        out_shape=(
            jax.ShapeDtypeStruct((r, w), x2.dtype),
            jax.ShapeDtypeStruct((grid * 8, w), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, w), jnp.float32),
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((br, w), lambda i: (i, 0)),
            pl.BlockSpec((br, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
        ],
        out_specs=(
            pl.BlockSpec((br, w), lambda i: (i, 0)),
            pl.BlockSpec((8, w), lambda i: (i, 0)),
            pl.BlockSpec((8, w), lambda i: (i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=12 * r * w,
            # x read + dy read + dx write (input dtype) + the two (grid*8, W)
            # f32 partial-sum outputs
            bytes_accessed=3 * r * w * x2.dtype.itemsize + 2 * grid * 8 * w * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x2, dy2, scale)
    return dx, ds_p.sum(axis=0), db_p.sum(axis=0)


def _plain_ln(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _supported(x) -> bool:
    w = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if w % 128 != 0 or w > MAX_W or rows < 256:
        return False
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x, scale, bias, eps, has_bias):
    return _plain_ln(x, scale, bias if has_bias else None, eps)


def _ln_fwd(x, scale, bias, eps, has_bias):
    return _plain_ln(x, scale, bias if has_bias else None, eps), (x, scale)


def _ln_bwd(eps, has_bias, res, dy):
    x, scale = res
    shape = x.shape
    w = shape[-1]
    x2 = x.reshape(-1, w)
    dy2 = dy.reshape(-1, w)
    dx2, ds, db = _ln_bwd_pallas(x2, dy2, scale, eps)
    dbias = db.astype(scale.dtype) if has_bias else jnp.zeros_like(scale)
    return dx2.reshape(shape), ds.astype(scale.dtype), dbias


_ln.defvjp(_ln_fwd, _ln_bwd)


def layer_norm_fused_bwd(
    x: jax.Array, scale: jax.Array, bias: Optional[jax.Array], eps: float = 1e-5
) -> jax.Array:
    """Drop-in for ops.layers.layer_norm with the Pallas fused backward when the
    shape qualifies; plain autodiff otherwise."""
    if not _supported(x):
        return _plain_ln(x, scale, bias, eps)
    if bias is None:
        return _ln(x, scale, jnp.zeros_like(scale), eps, False)
    return _ln(x, scale, bias, eps, True)
