"""Primitive ops: norms, activations, linear.

TPU-first equivalents of the reference primitives (reference ``src/open_clip/layers.py``):
normalization statistics are always computed in float32 regardless of the compute dtype
(covers both the reference's ``LayerNorm`` and ``LayerNormFp32`` semantics: fp32 math,
output cast back to the input dtype), and activations are written so XLA fuses them into
the adjacent matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# Opt-in: route LayerNorm through the Pallas fused backward (ops/fused_ln.py).
# Measured OFF-better in the full flagship step (2126 -> 1848 img/s) despite a
# 1.5x isolated-microbench win: the custom_vjp pins x/scale residuals, which
# defeats the names_mm remat policy (LN inputs on the residual stream get saved
# instead of recomputed) and blocks XLA's LN-fwd fusion into matmul epilogues.
# Kept for A/B on other shapes/policies; see docs/ROUND4.md.
FUSED_LN_BWD = False


def layer_norm(x: jax.Array, scale: jax.Array, bias: Optional[jax.Array], eps: float = 1e-5) -> jax.Array:
    """LayerNorm with fp32 statistics and affine, output in x.dtype.

    Matches reference ``LayerNormFp32`` (layers.py:11) when compute dtype is bf16/fp16 and
    plain ``LayerNorm`` (layers.py:20) when fp32 — both agree in fp32. With
    ``FUSED_LN_BWD`` the backward runs the one-pass Pallas kernel (ops/fused_ln.py)
    for qualifying shapes on TPU (off by default — see the flag comment).
    """
    if FUSED_LN_BWD:
        from .fused_ln import layer_norm_fused_bwd

        return layer_norm_fused_bwd(x, scale, bias, eps)
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm with fp32 statistics (modern text tower norm flavor)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(ms + eps)
    y = y * scale.astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 * x) — OpenAI CLIP activation (reference layers.py:29)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jax.Array) -> jax.Array:
    """GELU matching torch nn.GELU (erf) at the compute dtype's resolution.

    In fp32 this is the exact erf form. In bf16/fp16 the tanh approximation is
    used instead: its absolute error vs erf is <= 4.8e-4 everywhere, which is at
    or below one bf16 ulp wherever the output is representable, so the low-
    precision results are indistinguishable — while erf costs ~17% of the whole
    ViT-B-32 train step on the TPU VPU and tanh is several times cheaper
    (measured: 1366 -> 1587 img/s/chip). fp32 paths (parity tests, inference
    defaults) keep the exact form."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def relu_squared(x: jax.Array) -> jax.Array:
    """ReLU(x)^2 (reference transformer.py:968)."""
    r = jax.nn.relu(x)
    return r * r


ACT_FNS = {
    "gelu": gelu,
    "gelu_tanh": gelu_tanh,
    "quick_gelu": quick_gelu,
    "relu2": relu_squared,
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
}


def linear(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ kernel (+ bias). Kernel layout is (in_dim, out_dim) — column-major relative
    to torch's (out, in); the checkpoint converter transposes."""
    y = jnp.dot(x, kernel.astype(x.dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
