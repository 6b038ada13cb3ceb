"""SwitchBack int8 linear (Pallas).

TPU equivalent of the reference's bitsandbytes int8 SwitchBack linears
(reference ``src/open_clip_train/main.py:301-311``, README "int8 SwitchBack linear:
~10% train speedup on ViT-Huge"): the forward matmul runs in int8 on the MXU
(per-row dynamic activation scales x per-column weight scales), the backward falls
back to bf16/fp32 matmuls — the SwitchBack construction.

The quantize+matmul+dequantize runs as one Pallas kernel (activations quantized on
the fly in VMEM; the int8 weight + column scales are precomputed per step).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_rowwise(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """fp -> (int8 values, per-row fp32 scales): q = round(x / (absmax/127))."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def quantize_colwise(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(in, out) kernel -> int8 + per-output-column scales."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale[0]


def _int8_matmul_kernel(x_ref, w_ref, sx_ref, sw_ref, o_ref, *, block_k: int, k_total: int):
    """One (block_m, block_n) tile: int32 accumulation over int8 k-blocks, then
    dequantize with row x column scales."""
    acc = jnp.zeros(o_ref.shape, jnp.int32)
    num_kb = pl.cdiv(k_total, block_k)

    def body(ki, acc):
        xs = x_ref[:, pl.ds(ki * block_k, block_k)]
        ws = w_ref[pl.ds(ki * block_k, block_k), :]
        return acc + jax.lax.dot_general(
            xs, ws, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    acc = jax.lax.fori_loop(0, num_kb, body, acc)
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]).astype(o_ref.dtype)


def int8_matmul_dequant(
    qx: jax.Array,  # (M, K) int8
    qw: jax.Array,  # (K, N) int8
    sx: jax.Array,  # (M,) fp32 row scales
    sw: jax.Array,  # (N,) fp32 col scales
    out_dtype=jnp.float32,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    m, k = qx.shape
    n = qw.shape[1]

    def rup(v, t):
        return (v + t - 1) // t * t

    block_m = min(block_m, rup(m, 32))
    block_n = min(block_n, rup(n, 128))
    block_k = min(block_k, rup(k, 128))
    mp, np_, kp = rup(m, block_m), rup(n, block_n), rup(k, block_k)
    if (mp, kp) != (m, k):
        qx = jnp.pad(qx, ((0, mp - m), (0, kp - k)))
        sx = jnp.pad(sx, (0, mp - m))
    if (kp, np_) != (k, n):
        qw = jnp.pad(qw, ((0, kp - k), (0, np_ - n)))
        sw = jnp.pad(sw, (0, np_ - n))

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, block_k=block_k, k_total=kp),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, kp), lambda i, j: (i, 0)),
            pl.BlockSpec((kp, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp, bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_, transcendentals=0
        ),
        interpret=interpret,
    )(qx, qw, sx[:, None], sw[None, :])
    return out[:m, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def switchback_linear(x, kernel, bias, interpret=False):
    """y = dequant(int8(x) @ int8(kernel)) + bias — int8 forward, bf16/fp32 backward
    (the SwitchBack construction). x: (..., K); kernel: (K, N)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    qx, sx = quantize_rowwise(x2)
    qw, sw = quantize_colwise(kernel)
    y = int8_matmul_dequant(qx, qw, sx, sw, out_dtype=jnp.float32, interpret=interpret)
    y = y.astype(x.dtype).reshape(*shape[:-1], kernel.shape[1])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _sb_fwd(x, kernel, bias, interpret):
    return switchback_linear(x, kernel, bias, interpret), (x, kernel, bias is not None)


def _sb_bwd(interpret, res, g):
    x, kernel, has_bias = res
    shape = x.shape
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, shape[-1])
    dx = (g2 @ kernel.astype(g2.dtype).T).reshape(shape)
    dw = (x2.astype(jnp.float32).T @ g2.astype(jnp.float32)).astype(kernel.dtype)
    db = g2.sum(axis=0) if has_bias else None
    return dx, dw, db


switchback_linear.defvjp(_sb_fwd, _sb_bwd)
