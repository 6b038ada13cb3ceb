"""Pre-LN residual transformer blocks, stacked for ``lax.scan``.

TPU-first re-design of the reference's per-module block list
(reference ``src/open_clip/transformer.py:274-590``): all layers' parameters are
stacked along a leading layer axis and the depth loop is a single ``lax.scan``,
which compiles once per block instead of once per layer, composes with
``jax.checkpoint`` for rematerialized training, and shards trivially under pjit
(the layer axis stays unsharded; width axes carry the tensor-parallel specs).

Functional semantics match the reference block exactly:
  x = x + ls_1(attn(ln_1(x)));  x = x + ls_2(mlp(ln_2(x)))
with optional qk-norm / head-scale / inner-norm / NormFormer scale_fc /
post-attention norm flavors of ``CustomResidualAttentionBlock``.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.layers import ACT_FNS, layer_norm, linear


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_init(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    """Kernel/bias init matching torch nn.Linear defaults (kaiming_uniform a=sqrt(5))."""
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    kernel = jax.random.uniform(kkey, (in_dim, out_dim), dtype, -bound, bound)
    out = {"kernel": kernel}
    if bias:
        out["bias"] = jax.random.uniform(bkey, (out_dim,), dtype, -bound, bound)
    return out


def normal_init(key, shape, std, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def _ln_params(width):
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


# ---------------------------------------------------------------------------
# block init
# ---------------------------------------------------------------------------

def init_block(
    key,
    width: int,
    heads: int,
    mlp_width: int,
    *,
    ls_init_value: Optional[float] = None,
    init_scheme: str = "vision",
    depth_for_init: int = 12,
    qk_norm: bool = False,
    scaled_cosine: bool = False,
    scale_heads: bool = False,
    scale_attn_inner: bool = False,
    scale_attn: bool = False,
    scale_fc: bool = False,
) -> Dict[str, Any]:
    """One block's params. ``init_scheme``:
    - 'vision': torch-default inits (reference VisionTransformer.init_parameters is a no-op,
      so modules keep nn defaults — xavier for fused qkv, kaiming-uniform linears)
    - 'text': normal(std) scheme of reference TextTransformer.init_parameters:1666-1680
    """
    ks = jax.random.split(key, 8)
    head_dim = width // heads
    p: Dict[str, Any] = {
        "ln_1": _ln_params(width),
        "ln_2": _ln_params(width),
    }
    if init_scheme == "text":
        proj_std = (width ** -0.5) * ((2 * depth_for_init) ** -0.5)
        attn_std = width ** -0.5
        fc_std = (2 * width) ** -0.5
        attn = {
            "qkv": {
                "kernel": normal_init(ks[0], (width, 3 * width), attn_std),
                "bias": jnp.zeros((3 * width,)),
            },
            "out": {
                "kernel": normal_init(ks[1], (width, width), proj_std),
                "bias": jnp.zeros((width,)),
            },
        }
        mlp = {
            "c_fc": {
                "kernel": normal_init(ks[2], (width, mlp_width), fc_std),
                "bias": jnp.zeros((mlp_width,)),
            },
            "c_proj": {
                "kernel": normal_init(ks[3], (mlp_width, width), proj_std),
                "bias": jnp.zeros((width,)),
            },
        }
    else:
        attn = {
            "qkv": {
                "kernel": xavier_uniform(ks[0], (width, 3 * width)),
                "bias": jnp.zeros((3 * width,)),
            },
            "out": torch_linear_init(ks[1], width, width),
        }
        attn["out"]["bias"] = jnp.zeros((width,))
        mlp = {
            "c_fc": torch_linear_init(ks[2], width, mlp_width),
            "c_proj": torch_linear_init(ks[3], mlp_width, width),
        }
    assert not (scaled_cosine and qk_norm), "cannot combine scaled-cosine attn with qk-norm"
    if qk_norm:
        attn["ln_q"] = _ln_params(head_dim)
        attn["ln_k"] = _ln_params(head_dim)
    if scaled_cosine:
        import math as _math

        attn["logit_scale"] = jnp.full((heads,), _math.log(10.0), jnp.float32)
    if scale_heads:
        attn["head_scale"] = jnp.ones((heads,))
    if scale_attn_inner:
        attn["ln_inner"] = _ln_params(width)
    if scale_attn:
        p["ln_attn"] = _ln_params(width)
    if scale_fc:
        mlp["ln"] = _ln_params(mlp_width)
    p["attn"] = attn
    p["mlp"] = mlp
    if ls_init_value is not None:
        p["ls_1"] = jnp.full((width,), ls_init_value)
        p["ls_2"] = jnp.full((width,), ls_init_value)
    return p


def init_block_stack(key, layers: int, width: int, heads: int, mlp_width: int, **kw) -> Dict[str, Any]:
    """Stacked params for ``layers`` blocks: every leaf gets a leading (layers,) axis."""
    keys = jax.random.split(key, layers)
    kw.setdefault("depth_for_init", layers)
    init_one = functools.partial(init_block, width=width, heads=heads, mlp_width=mlp_width, **kw)
    return jax.vmap(init_one)(keys)


# ---------------------------------------------------------------------------
# block apply
# ---------------------------------------------------------------------------

def apply_block(
    p: Dict[str, Any],
    x: jax.Array,
    *,
    heads: int,
    act: str = "gelu",
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    norm_eps: float = 1e-5,
    attn_impl: str = "auto",
    key_valid: Optional[jax.Array] = None,
) -> jax.Array:
    from jax.ad_checkpoint import checkpoint_name

    act_fn = ACT_FNS[act]
    qk_norm_eps = norm_eps if "ln_q" in p["attn"] else None

    h = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"], eps=norm_eps)
    h = checkpoint_name(h, "remat_ln1")
    h = multi_head_attention(
        p["attn"], h, num_heads=heads, bias=bias, causal=causal,
        qk_norm_eps=qk_norm_eps if "ln_q" in p["attn"] else (norm_eps if "ln_inner" in p["attn"] else None),
        impl=attn_impl, key_valid=key_valid,
    )
    if "ln_attn" in p:
        h = layer_norm(h, p["ln_attn"]["scale"], p["ln_attn"]["bias"], eps=norm_eps)
    if "ls_1" in p:
        h = h * p["ls_1"].astype(h.dtype)
    x = x + h

    h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"], eps=norm_eps)
    h = checkpoint_name(h, "remat_ln2")
    h = _mlp_linear(h, p["mlp"]["c_fc"])
    h = checkpoint_name(h, "remat_fc1")
    h = act_fn(h)
    if "ln" in p["mlp"]:
        h = layer_norm(h, p["mlp"]["ln"]["scale"], p["mlp"]["ln"]["bias"], eps=norm_eps)
    h = checkpoint_name(h, "remat_act")
    h = _mlp_linear(h, p["mlp"]["c_proj"])
    if "ls_2" in p:
        h = h * p["ls_2"].astype(h.dtype)
    return x + h


# MLP linear implementation for transformer blocks: "dense" (default) or
# "switchback" — int8 forward / bf16 backward via the Pallas SwitchBack kernel
# (reference --use-bnb-linear SwitchBackLinearGlobal, main.py:301-311). Set by
# the training CLI's --use-switchback flag.
MLP_LINEAR_IMPL: str = "dense"


def _mlp_linear(h: jax.Array, pp: Dict[str, Any]) -> jax.Array:
    if MLP_LINEAR_IMPL == "switchback":
        from ..ops.switchback import switchback_linear

        # pallas runs in interpret mode off-TPU (tests / CPU dryruns)
        return switchback_linear(h, pp["kernel"], pp.get("bias"),
                                 jax.default_backend() == "cpu")
    return linear(h, pp["kernel"], pp.get("bias"))


# Scan unroll factor: 1 = compiled loop (fast compiles, default). The profiler sets
# full unroll so XLA cost analysis counts every layer (a scan body is counted once).
SCAN_UNROLL: int = 1

# Split the transposed (backward) scan into a separate loop so XLA can overlap the
# saved-activation reads of layer i with the gradient math of layer i+1. A/B knob.
SCAN_SPLIT_TRANSPOSE: bool = False

# Rematerialization policy for checkpointed blocks. "none" (full remat, save nothing)
# is the default: saving dot outputs ("dots") keeps every attention-logit/MLP
# intermediate alive and blows HBM at production batch sizes on v5e (verified: the
# compile itself OOMs at ViT-B-32 batch 1024).
#
# "names" saves only the intermediates tagged with ``checkpoint_name`` in
# ``apply_block`` (the inputs of each block matmul), so the backward pass reuses
# them for weight grads instead of recomputing the whole block forward — ~25%
# fewer train FLOPs than full remat at a bounded, explicit memory cost.
REMAT_POLICY: str = "none"

# which named intermediates each "names*" policy keeps (see apply_block /
# multi_head_attention tags). "names" saves the matmul INPUTS (LN outputs);
# "names_mm" saves the block-matmul OUTPUTS (fused qkv, fc1 pre-activation)
# instead, so the backward skips recomputing those matmuls entirely — more
# memory per token (qkv is 3x width) but ~2 fewer matmul recomputes per layer;
# the LN forwards and the activation are recomputed on the VPU, which is cheap.
REMAT_NAME_PRESETS: dict = {
    "names": ("remat_ln1", "remat_attn_ctx", "remat_ln2", "remat_act"),
    "names_mm": ("remat_qkv", "remat_attn_ctx", "remat_fc1"),
}
REMAT_SAVE_NAMES: tuple = REMAT_NAME_PRESETS["names"]


def remat_policy():
    if REMAT_POLICY == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if REMAT_POLICY == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if REMAT_POLICY in REMAT_NAME_PRESETS:
        return jax.checkpoint_policies.save_only_these_names(
            *REMAT_NAME_PRESETS[REMAT_POLICY])
    if REMAT_POLICY == "names_custom":
        return jax.checkpoint_policies.save_only_these_names(*REMAT_SAVE_NAMES)
    return None


def scan_unroll() -> int:
    return SCAN_UNROLL


def apply_transformer(
    stacked: Dict[str, Any],
    x: jax.Array,
    *,
    heads: int,
    act: str = "gelu",
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    norm_eps: float = 1e-5,
    remat: bool = False,
    attn_impl: str = "auto",
    key_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the stacked block parameters over ``x`` with a single ``lax.scan``."""

    def body(carry, p):
        y = apply_block(
            p, carry, heads=heads, act=act, bias=bias, causal=causal,
            norm_eps=norm_eps, attn_impl=attn_impl, key_valid=key_valid,
        )
        return y, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False, policy=remat_policy())
    x, _ = jax.lax.scan(body, x, stacked, unroll=scan_unroll(),
                        _split_transpose=SCAN_SPLIT_TRANSPOSE)
    return x


def apply_transformer_intermediates(
    stacked: Dict[str, Any],
    x: jax.Array,
    *,
    heads: int,
    act: str = "gelu",
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    norm_eps: float = 1e-5,
    take_indices: Optional[list] = None,
    attn_impl: str = "auto",
):
    """Unrolled depth loop returning selected intermediates (feature-extraction API,
    reference transformer.py:436-476). Used for eval/feature paths, not the hot loop."""
    n_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    take = set(range(n_layers)) if take_indices is None else set(take_indices)
    feats = []
    for i in range(n_layers):
        p = jax.tree.map(lambda a: a[i], stacked)
        x = apply_block(
            p, x, heads=heads, act=act, bias=bias, causal=causal,
            norm_eps=norm_eps, attn_impl=attn_impl,
        )
        if i in take:
            feats.append(x)
    return x, feats


def num_layers(stacked: Dict[str, Any]) -> int:
    return jax.tree_util.tree_leaves(stacked)[0].shape[0]
