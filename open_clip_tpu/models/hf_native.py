"""Native JAX forward passes for the HF text-tower architectures.

The reference delegates HF text encoders to torch AutoModel
(``src/open_clip/hf_model.py:104-140``); round 2 of this build delegated to
transformers' *Flax* classes, which upstream deprecated for removal in
transformers v5. This module removes that dependency: it implements the
BERT/RoBERTa/XLM-R encoder family and the T5/mT5 encoder natively over the
**exact HF-Flax parameter layout**, so every existing checkpoint converter and
saved tree keeps loading unchanged, while the forward pass is our own code and
survives any transformers upgrade (transformers is then only needed for config
objects and tokenizers).

Layouts (pinned against FlaxRobertaModel / FlaxMT5EncoderModel on this env):

BERT family::

    embeddings/{word_embeddings,position_embeddings,token_type_embeddings}/embedding
    embeddings/LayerNorm/{scale,bias}
    encoder/layer/<i>/attention/self/{query,key,value}/{kernel,bias}
    encoder/layer/<i>/attention/output/{dense/{kernel,bias},LayerNorm/{scale,bias}}
    encoder/layer/<i>/{intermediate,output}/dense/{kernel,bias}
    encoder/layer/<i>/output/LayerNorm/{scale,bias}
    pooler/dense/{kernel,bias}

T5 family (encoder only)::

    shared/embedding
    encoder/block/<i>/layer/0/SelfAttention/{q,k,v,o}/kernel
    encoder/block/0/layer/0/SelfAttention/relative_attention_bias/embedding
    encoder/block/<i>/layer/<last>/DenseReluDense/{wi|wi_0,wi_1,wo}/kernel
    encoder/block/<i>/layer/<j>/layer_norm/weight
    encoder/final_layer_norm/weight
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NATIVE_BERT_TYPES = ("bert", "roberta", "xlm-roberta", "camembert", "clap")
NATIVE_T5_TYPES = ("t5", "mt5")


def _cfg(config: Any, name: str, default=None):
    """Read a field from a transformers config object or a plain dict."""
    if isinstance(config, dict):
        return config.get(name, default)
    return getattr(config, name, default)


def _dense(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def _layer_norm(x: jax.Array, p: Dict[str, Any], eps: float) -> jax.Array:
    # fp32 statistics regardless of compute dtype (matches flax.linen.LayerNorm)
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _act(name: str):
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_python": lambda x: jax.nn.gelu(x, approximate=False),
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "tanh": jnp.tanh,
    }[name]


# ---------------------------------------------------------------------------
# BERT / RoBERTa / XLM-R encoder
# ---------------------------------------------------------------------------

def bert_encode(
    params: Dict[str, Any],
    config: Any,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    position_ids: Optional[jax.Array] = None,
    token_type_ids: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """-> (last_hidden_state (B, L, W), pooler_output or None).

    Numerics match transformers' Flax BERT/RoBERTa forward in eval mode
    (deterministic; fp32 LayerNorm + softmax)."""
    n_heads = int(_cfg(config, "num_attention_heads"))
    n_layers = int(_cfg(config, "num_hidden_layers"))
    eps = float(_cfg(config, "layer_norm_eps", 1e-12))
    act = _act(_cfg(config, "hidden_act", "gelu"))

    B, L = input_ids.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    if token_type_ids is None:
        token_type_ids = jnp.zeros((B, L), jnp.int32)

    emb = params["embeddings"]
    h = (
        emb["word_embeddings"]["embedding"][input_ids]
        + emb["position_embeddings"]["embedding"][position_ids]
        + emb["token_type_embeddings"]["embedding"][token_type_ids]
    ).astype(compute_dtype)
    h = _layer_norm(h, emb["LayerNorm"], eps)

    # additive attention bias, fp32 (scores are computed in fp32)
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, jnp.float32(-1e10))

    head_dim = h.shape[-1] // n_heads
    scale = 1.0 / np.sqrt(head_dim)
    layers = params["encoder"]["layer"]
    for i in range(n_layers):
        lp = layers[str(i)] if str(i) in layers else layers[i]
        sa = lp["attention"]["self"]
        q = _dense(h, sa["query"]).reshape(B, L, n_heads, head_dim)
        k = _dense(h, sa["key"]).reshape(B, L, n_heads, head_dim)
        v = _dense(h, sa["value"]).reshape(B, L, n_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
        attn_out = _dense(ctx, lp["attention"]["output"]["dense"])
        h = _layer_norm(h + attn_out, lp["attention"]["output"]["LayerNorm"], eps)
        ff = _dense(h, lp["intermediate"]["dense"])
        ff = act(ff.astype(jnp.float32)).astype(compute_dtype)
        ff = _dense(ff, lp["output"]["dense"])
        h = _layer_norm(h + ff, lp["output"]["LayerNorm"], eps)

    pooled = None
    if "pooler" in params:
        pooled = jnp.tanh(_dense(h[:, 0], params["pooler"]["dense"]).astype(jnp.float32))
        pooled = pooled.astype(compute_dtype)
    return h, pooled


def init_bert_params(key, config: Any, *, with_pooler: bool = True) -> Dict[str, Any]:
    """Random init matching HF (normal(0.02) kernels/embeddings, LN ones/zeros)."""
    W = int(_cfg(config, "hidden_size"))
    I = int(_cfg(config, "intermediate_size"))
    V = int(_cfg(config, "vocab_size"))
    P = int(_cfg(config, "max_position_embeddings"))
    T = int(_cfg(config, "type_vocab_size", 1))
    n_layers = int(_cfg(config, "num_hidden_layers"))
    std = float(_cfg(config, "initializer_range", 0.02))

    keys = iter(jax.random.split(key, 6 + 6 * n_layers + 1))

    def nrm(shape):
        return jax.random.normal(next(keys), shape, jnp.float32) * std

    def dense(din, dout):
        return {"kernel": nrm((din, dout)), "bias": jnp.zeros((dout,), jnp.float32)}

    def ln():
        return {"scale": jnp.ones((W,), jnp.float32), "bias": jnp.zeros((W,), jnp.float32)}

    p: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {"embedding": nrm((V, W))},
            "position_embeddings": {"embedding": nrm((P, W))},
            "token_type_embeddings": {"embedding": nrm((T, W))},
            "LayerNorm": ln(),
        },
        "encoder": {"layer": {}},
    }
    for i in range(n_layers):
        p["encoder"]["layer"][str(i)] = {
            "attention": {
                "self": {"query": dense(W, W), "key": dense(W, W), "value": dense(W, W)},
                "output": {"dense": dense(W, W), "LayerNorm": ln()},
            },
            "intermediate": {"dense": dense(W, I)},
            "output": {"dense": dense(I, W), "LayerNorm": ln()},
        }
    if with_pooler:
        p["pooler"] = {"dense": dense(W, W)}
    return p


def torch_bert_to_layout(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """torch BERT/RoBERTa state dict -> the HF-Flax-style tree bert_encode reads.

    Replaces transformers' convert_pytorch_state_dict_to_flax for this family:
    dense ``weight`` transposes to ``kernel``, LayerNorm ``weight`` becomes
    ``scale``, embedding ``weight`` becomes ``embedding``.
    """
    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        parts = k[len(prefix):].split(".")
        if parts[-1] == "weight":
            if "LayerNorm" in parts or "layer_norm" in parts:
                parts[-1] = "scale"
                val = np_(v)
            elif "embeddings" in parts[0] and parts[-2].endswith("embeddings"):
                parts[-1] = "embedding"
                val = np_(v)
            else:
                parts[-1] = "kernel"
                val = np_(v).T
        elif parts[-1] == "bias":
            val = np_(v)
        else:
            continue
        node = out
        for s in parts[:-1]:
            node = node.setdefault(s, {})
        node[parts[-1]] = jnp.asarray(val)
    return out


# ---------------------------------------------------------------------------
# T5 / mT5 encoder
# ---------------------------------------------------------------------------

def _relative_position_bucket(relative_position, num_buckets: int, max_distance: int):
    """T5 bidirectional relative-position bucketing (reference semantics of
    transformers T5Attention._relative_position_bucket with bidirectional=True)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def t5_encode(
    params: Dict[str, Any],
    config: Any,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    *,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """-> last_hidden_state (B, L, d_model). Matches FlaxT5EncoderModel eval
    forward: pre-RMSNorm blocks, unscaled attention scores, shared relative
    position bias from block 0, gated FF for mT5/T5-v1.1."""
    n_heads = int(_cfg(config, "num_heads"))
    d_kv = int(_cfg(config, "d_kv"))
    n_layers = int(_cfg(config, "num_layers"))
    eps = float(_cfg(config, "layer_norm_epsilon", 1e-6))
    num_buckets = int(_cfg(config, "relative_attention_num_buckets", 32))
    max_distance = int(_cfg(config, "relative_attention_max_distance", 128))
    ff_proj = str(_cfg(config, "feed_forward_proj", "relu"))
    gated = ff_proj.startswith("gated-")
    act = _act({"gelu": "gelu_new"}.get(ff_proj.replace("gated-", ""), ff_proj.replace("gated-", "")))

    def rms(x, w):
        xf = x.astype(jnp.float32)
        var = (xf * xf).mean(-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w.astype(x.dtype)

    B, L = input_ids.shape
    h = params["shared"]["embedding"][input_ids].astype(compute_dtype)
    enc = params["encoder"]

    # position bias: computed once (block 0's table), shared by every layer
    pos = jnp.arange(L, dtype=jnp.int32)
    rel = pos[None, :] - pos[:, None]  # (q, k)
    buckets = _relative_position_bucket(rel, num_buckets, max_distance)
    bias_table = enc["block"]["0"]["layer"]["0"]["SelfAttention"]["relative_attention_bias"]["embedding"]
    pos_bias = bias_table[buckets].transpose(2, 0, 1)[None].astype(jnp.float32)  # (1, H, q, k)
    pos_bias = pos_bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, jnp.float32(-1e10))

    for i in range(n_layers):
        blk = enc["block"][str(i)]["layer"]
        sa = blk["0"]["SelfAttention"]
        x = rms(h, blk["0"]["layer_norm"]["weight"])
        q = (x @ sa["q"]["kernel"].astype(x.dtype)).reshape(B, L, n_heads, d_kv)
        k = (x @ sa["k"]["kernel"].astype(x.dtype)).reshape(B, L, n_heads, d_kv)
        v = (x @ sa["v"]["kernel"].astype(x.dtype)).reshape(B, L, n_heads, d_kv)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) + pos_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(compute_dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
        h = h + ctx @ sa["o"]["kernel"].astype(ctx.dtype)

        ff_key = str(len(blk) - 1)  # FF is the block's last sublayer
        ff = blk[ff_key]["DenseReluDense"]
        x = rms(h, blk[ff_key]["layer_norm"]["weight"])
        if gated:
            g = act((x @ ff["wi_0"]["kernel"].astype(x.dtype)).astype(jnp.float32)).astype(compute_dtype)
            u = x @ ff["wi_1"]["kernel"].astype(x.dtype)
            y = g * u
        else:
            y = act((x @ ff["wi"]["kernel"].astype(x.dtype)).astype(jnp.float32)).astype(compute_dtype)
        h = h + y @ ff["wo"]["kernel"].astype(y.dtype)

    return rms(h, params["encoder"]["final_layer_norm"]["weight"])


def init_t5_params(key, config: Any) -> Dict[str, Any]:
    """Random init matching HF T5 (factor-scaled normals)."""
    D = int(_cfg(config, "d_model"))
    F = int(_cfg(config, "d_ff"))
    V = int(_cfg(config, "vocab_size"))
    H = int(_cfg(config, "num_heads"))
    KV = int(_cfg(config, "d_kv"))
    n_layers = int(_cfg(config, "num_layers"))
    num_buckets = int(_cfg(config, "relative_attention_num_buckets", 32))
    factor = float(_cfg(config, "initializer_factor", 1.0))
    gated = str(_cfg(config, "feed_forward_proj", "relu")).startswith("gated-")

    keys = iter(jax.random.split(key, 3 + 8 * n_layers))

    def nrm(shape, std):
        return jax.random.normal(next(keys), shape, jnp.float32) * std

    p: Dict[str, Any] = {
        "shared": {"embedding": nrm((V, D), factor * 1.0)},
        "encoder": {"block": {}, "final_layer_norm": {"weight": jnp.ones((D,), jnp.float32)}},
    }
    for i in range(n_layers):
        sa = {
            "q": {"kernel": nrm((D, H * KV), factor * (D * KV) ** -0.5)},
            "k": {"kernel": nrm((D, H * KV), factor * D ** -0.5)},
            "v": {"kernel": nrm((D, H * KV), factor * D ** -0.5)},
            "o": {"kernel": nrm((H * KV, D), factor * (H * KV) ** -0.5)},
        }
        if i == 0:
            sa["relative_attention_bias"] = {"embedding": nrm((num_buckets, H), factor * D ** -0.5)}
        if gated:
            ff = {
                "wi_0": {"kernel": nrm((D, F), factor * D ** -0.5)},
                "wi_1": {"kernel": nrm((D, F), factor * D ** -0.5)},
                "wo": {"kernel": nrm((F, D), factor * F ** -0.5)},
            }
        else:
            ff = {
                "wi": {"kernel": nrm((D, F), factor * D ** -0.5)},
                "wo": {"kernel": nrm((F, D), factor * F ** -0.5)},
            }
        p["encoder"]["block"][str(i)] = {
            "layer": {
                "0": {"SelfAttention": sa, "layer_norm": {"weight": jnp.ones((D,), jnp.float32)}},
                "1": {"DenseReluDense": ff, "layer_norm": {"weight": jnp.ones((D,), jnp.float32)}},
            }
        }
    return p


def torch_t5_to_layout(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """torch T5/mT5 encoder state dict -> the tree t5_encode reads."""
    def np_(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        parts = k[len(prefix):].split(".")
        if parts[-1] != "weight":
            continue
        leaf = "weight"
        val = np_(v)
        if parts[-2] in ("q", "k", "v", "o", "wi", "wi_0", "wi_1", "wo"):
            leaf = "kernel"
            val = val.T
        elif parts[-2] in ("relative_attention_bias", "shared", "embed_tokens"):
            leaf = "embedding"
            if parts[-2] == "embed_tokens":
                parts = ["shared"]
        node = out
        for s in parts[:-1]:
            node = node.setdefault(s, {})
        node[leaf] = jnp.asarray(val)
    return out
