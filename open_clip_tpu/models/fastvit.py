"""Native FastViT / MCi vision towers (MobileCLIP image encoders), NHWC.

The reference builds its MobileCLIP towers through timm (``fastvit_mci0..4``;
reference ``src/open_clip/timm_model.py:25``, configs
``src/open_clip/model_configs/MobileCLIP*.json``) and converts Apple-format
checkpoints with ``convert_mobile_clip_state_dict``
(reference ``src/open_clip/convert.py:223-261``), which delegates the image trunk
to timm's ``fastvit.checkpoint_filter_fn``.

Here the trunk is implemented natively for TPU:

- **Reparameterized (inference-form) runtime.** FastViT's structural
  over-parameterization (MobileOne multi-branch convs, RepMixer's mixer-norm
  pair, the 7x7+3x3 large-kernel pair, RepCPE's conv+identity) exists to help
  *pretraining*; every block collapses exactly into a single conv by linear
  algebra. The runtime model stores only the collapsed convs — fewer, larger
  HLO ops for XLA, no branch bookkeeping on the hot path. The converter
  performs the collapse when handed training-format (multi-branch) weights and
  passes inference-format (``reparam_conv``) weights straight through; the
  fusion algebra is verified numerically against a torch training-form oracle
  in ``tests/test_parity_fastvit.py``.
- NHWC end to end; pointwise convs are plain matmuls on the MXU; only the
  stem/downsample convs, 3x3 depthwise mixers and 7x7 depthwise MLP convs are
  real convolutions.
- Within a stage all blocks share one shape, so block params are stacked on a
  leading axis and applied with ``lax.scan`` (same layout as the ConvNeXt/ViT
  towers).

Architecture per the FastViT paper (Vasu et al., ICCV 2023) in timm's
``fastvit.py`` layout: a 3-block convolutional stem (stride 4), four stages
(RepMixer token mixing in stages 0-2, attention with a RepCPE conditional
position encoding in stage 3) separated by large-kernel downsample patch
embeds, a final grouped 3x3 conv with SE expanding channels by ``cls_ratio``,
global average pooling and a linear head to ``embed_dim``. The ``mci*`` stage
tables follow the MobileCLIP papers' MCi0/1/2 (and best-effort MCi3/4)
definitions; adjust ``FASTVIT_CFGS`` if a real checkpoint disagrees.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CLIPVisionCfg
from ..ops.layers import linear


@dataclasses.dataclass(frozen=True)
class FastVitCfg:
    depths: Tuple[int, ...]
    dims: Tuple[int, ...]
    mlp_ratios: Tuple[float, ...]
    token_mixers: Tuple[str, ...] = ("repmixer", "repmixer", "repmixer", "attention")
    se_downsamples: Tuple[bool, ...] = (False, False, True, True)
    pos_emb_stage: int = 3  # stage index that carries RepCPE (-1: none)
    cls_ratio: float = 2.0
    image_size: int = 256
    head_dim: int = 32
    ls_init: float = 1e-5


# timm name -> cfg. MCi0/1/2 follow the MobileCLIP paper (Table 1 / Appendix);
# MCi3/4 (MobileCLIP2) are best-effort reconstructions of the same scaling rule.
FASTVIT_CFGS: Dict[str, FastVitCfg] = {
    "fastvit_mci0": FastVitCfg(depths=(2, 6, 10, 2), dims=(64, 128, 256, 512),
                               mlp_ratios=(3.0, 3.0, 3.0, 3.0)),
    "fastvit_mci1": FastVitCfg(depths=(4, 12, 20, 4), dims=(64, 128, 256, 512),
                               mlp_ratios=(3.0, 3.0, 3.0, 3.0)),
    "fastvit_mci2": FastVitCfg(depths=(4, 12, 24, 4), dims=(80, 160, 320, 640),
                               mlp_ratios=(3.0, 3.0, 3.0, 3.0)),
    "fastvit_mci3": FastVitCfg(depths=(4, 12, 24, 4), dims=(96, 192, 384, 768),
                               mlp_ratios=(3.0, 3.0, 3.0, 3.0)),
    "fastvit_mci4": FastVitCfg(depths=(4, 12, 24, 4), dims=(128, 256, 512, 1024),
                               mlp_ratios=(3.0, 3.0, 3.0, 3.0)),
}


def is_fastvit(vcfg: Optional[CLIPVisionCfg]) -> bool:
    name = (getattr(vcfg, "timm_model_name", None) or "").split(".")[0]
    return name in FASTVIT_CFGS


def parse_fastvit_cfg(vcfg: CLIPVisionCfg) -> FastVitCfg:
    name = (vcfg.timm_model_name or "").split(".")[0]
    cfg = FASTVIT_CFGS[name]
    size = vcfg.image_size if isinstance(vcfg.image_size, int) else vcfg.image_size[0]
    return dataclasses.replace(cfg, image_size=size)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin_g, cout) -> Dict[str, Any]:
    """One collapsed conv: HWIO kernel (in already divided by groups) + bias."""
    fan_in = kh * kw * cin_g
    w = jax.random.normal(key, (kh, kw, cin_g, cout)) * (2.0 / fan_in) ** 0.5
    return {"kernel": w, "bias": jnp.zeros((cout,))}


def _se_init(key, dim: int, rd: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": {"kernel": jax.random.normal(k1, (1, 1, dim, rd)) * (2.0 / dim) ** 0.5,
                "bias": jnp.zeros((rd,))},
        "fc2": {"kernel": jax.random.normal(k2, (1, 1, rd, dim)) * (2.0 / rd) ** 0.5,
                "bias": jnp.zeros((dim,))},
    }


def _repmixer_block_init(key, dim: int, hidden: int, ls_init: float) -> Dict[str, Any]:
    km, kc, k1, k2 = jax.random.split(key, 4)
    return {
        "mixer": _conv_init(km, 3, 3, 1, dim),           # depthwise, residual folded in
        "mlp_conv": _conv_init(kc, 7, 7, 1, dim),        # depthwise 7x7 (ConvNormAct)
        "fc1": _conv_init(k1, 1, 1, dim, hidden),
        "fc2": _conv_init(k2, 1, 1, hidden, dim),
        "ls2": jnp.full((dim,), ls_init),
    }


def _attention_block_init(key, dim: int, hidden: int, ls_init: float) -> Dict[str, Any]:
    kq, kp, kc, k1, k2 = jax.random.split(key, 5)
    s = dim ** -0.5
    return {
        "norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,)),
                 "mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))},
        "qkv": {"kernel": jax.random.normal(kq, (dim, 3 * dim)) * s},
        "proj": {"kernel": jax.random.normal(kp, (dim, dim)) * s, "bias": jnp.zeros((dim,))},
        "ls1": jnp.full((dim,), ls_init),
        "mlp_conv": _conv_init(kc, 7, 7, 1, dim),
        "fc1": _conv_init(k1, 1, 1, dim, hidden),
        "fc2": _conv_init(k2, 1, 1, hidden, dim),
        "ls2": jnp.full((dim,), ls_init),
    }


def init_fastvit(key, vcfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    cfg = parse_fastvit_cfg(vcfg)
    keys = jax.random.split(key, 16)
    d0 = cfg.dims[0]
    params: Dict[str, Any] = {
        "stem": [
            _conv_init(keys[0], 3, 3, 3, d0),
            _conv_init(keys[1], 3, 3, 1, d0),   # depthwise
            _conv_init(keys[2], 1, 1, d0, d0),  # pointwise
        ],
        "stages": {},
    }
    for i, (depth, dim, ratio) in enumerate(zip(cfg.depths, cfg.dims, cfg.mlp_ratios)):
        sk = jax.random.fold_in(keys[3], i)
        stage: Dict[str, Any] = {}
        if i > 0:
            din = cfg.dims[i - 1]
            dk1, dk2, dk3 = jax.random.split(jax.random.fold_in(sk, 1000), 3)
            stage["downsample"] = {
                "lkc": _conv_init(dk1, 7, 7, din // din, dim),  # grouped: groups=din
                "pw": _conv_init(dk2, 1, 1, dim, dim),
            }
            if cfg.se_downsamples[i]:
                stage["downsample"]["se"] = _se_init(dk3, dim, max(dim // 16, 4))
        if cfg.token_mixers[i] == "attention" and cfg.pos_emb_stage == i:
            stage["pos_emb"] = _conv_init(jax.random.fold_in(sk, 2000), 7, 7, 1, dim)
        hidden = int(dim * ratio)
        mk = cfg.token_mixers[i]
        blocks = []
        for j in range(depth):
            bk = jax.random.fold_in(sk, j)
            blocks.append(_repmixer_block_init(bk, dim, hidden, cfg.ls_init)
                          if mk == "repmixer"
                          else _attention_block_init(bk, dim, hidden, cfg.ls_init))
        stage["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        params["stages"][str(i)] = stage
    dlast = cfg.dims[-1]
    dcls = int(dlast * cfg.cls_ratio)
    fk1, fk2, fk3 = jax.random.split(keys[4], 3)
    params["final_conv"] = _conv_init(fk1, 3, 3, 1, dcls)  # grouped: groups=dlast
    params["final_se"] = _se_init(fk2, dcls, max(dcls // 16, 4))
    params["head"] = {"kernel": jax.random.normal(fk3, (dcls, embed_dim)) * dcls ** -0.5,
                      "bias": jnp.zeros((embed_dim,))}
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride: int = 1, groups: int = 1):
    w = p["kernel"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    # torch-style symmetric padding (k//2): differs from XLA "SAME" at stride 2,
    # where SAME shifts the sampling grid right by one — checkpoints would drift
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if p.get("bias") is not None:
        out = out + p["bias"].astype(x.dtype)
    return out


def _se(x, p):
    s = x.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.relu(_conv(s, p["fc1"]))
    s = jax.nn.sigmoid(_conv(s, p["fc2"]))
    return x * s


def _gelu(x):
    from ..ops.layers import gelu

    return gelu(x)


def _bn_affine(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32)
            * p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    return x * scale + bias


def _repmixer_block(p, x, dim: int):
    # token mixer: one depthwise 3x3 (residual + layer scale folded in at convert)
    x = _conv(x, p["mixer"], groups=dim)
    # ConvMlp: depthwise 7x7 -> 1x1 expand -> GELU -> 1x1 project; LayerScale residual
    h = _conv(x, p["mlp_conv"], groups=dim)
    h = _conv(h, p["fc1"])
    h = _gelu(h)
    h = _conv(h, p["fc2"])
    return x + h * p["ls2"].astype(x.dtype)


def _attention_block(p, x, dim: int, head_dim: int):
    from ..ops.attention import dot_product_attention

    b, hh, ww, c = x.shape
    h = _bn_affine(x, p["norm"])
    t = h.reshape(b, hh * ww, c)
    qkv = jnp.dot(t, p["qkv"]["kernel"].astype(t.dtype))
    nh = c // head_dim
    q, k, v = [u.reshape(b, hh * ww, nh, head_dim) for u in jnp.split(qkv, 3, axis=-1)]
    ctx = dot_product_attention(q, k, v).reshape(b, hh * ww, c)
    ctx = jnp.dot(ctx, p["proj"]["kernel"].astype(t.dtype)) + p["proj"]["bias"].astype(t.dtype)
    x = x + (ctx * p["ls1"].astype(t.dtype)).reshape(b, hh, ww, c)
    h = _conv(x, p["mlp_conv"], groups=dim)
    h = _conv(h, p["fc1"])
    h = _gelu(h)
    h = _conv(h, p["fc2"])
    return x + h * p["ls2"].astype(x.dtype)


def apply_fastvit(
    params: Dict[str, Any],
    vcfg: CLIPVisionCfg,
    images: jax.Array,  # (B, H, W, 3) NHWC normalized
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    del train, rng  # no dropout/droppath in the collapsed inference form
    cfg = parse_fastvit_cfg(vcfg)
    x = images.astype(compute_dtype)
    d0 = cfg.dims[0]
    x = _gelu(_conv(x, params["stem"][0], stride=2))
    x = _gelu(_conv(x, params["stem"][1], stride=2, groups=d0))
    x = _gelu(_conv(x, params["stem"][2]))

    for i in range(len(cfg.depths)):
        stage = params["stages"][str(i)]
        dim = cfg.dims[i]
        if "downsample" in stage:
            din = cfg.dims[i - 1]
            x = _conv(x, stage["downsample"]["lkc"], stride=2, groups=din)
            x = _gelu(x)
            x = _conv(x, stage["downsample"]["pw"])
            if "se" in stage["downsample"]:  # SE inside the pointwise MobileOneBlock
                x = _se(x, stage["downsample"]["se"])
            x = _gelu(x)
        if "pos_emb" in stage:
            x = _conv(x, stage["pos_emb"], groups=dim)  # RepCPE, identity folded in
        mixer = cfg.token_mixers[i]

        def body(carry, bp, _mixer=mixer, _dim=dim):
            fn = _repmixer_block if _mixer == "repmixer" else \
                (lambda p, c, d: _attention_block(p, c, d, cfg.head_dim))
            if remat:
                fn = jax.checkpoint(fn, prevent_cse=False)
            return fn(bp, carry, _dim), None

        x, _ = jax.lax.scan(body, x, stage["blocks"])

    dlast = cfg.dims[-1]
    x = _conv(x, params["final_conv"], groups=dlast)
    x = _se(x, params["final_se"])
    x = _gelu(x)
    x = x.mean(axis=(1, 2))  # global average pool
    x = linear(x, params["head"]["kernel"], params["head"].get("bias"))
    return x


# ---------------------------------------------------------------------------
# torch checkpoint conversion (timm fastvit layout, training or inference form)
# ---------------------------------------------------------------------------

def _t(v) -> np.ndarray:
    import torch

    return v.detach().cpu().float().numpy() if isinstance(v, torch.Tensor) else np.asarray(v)


def _fuse_conv_bn(w: np.ndarray, bn: Dict[str, np.ndarray], eps=1e-5):
    """Fold BatchNorm into a conv kernel (torch OIHW in, OIHW out) + bias."""
    gamma, beta, mean, var = bn["weight"], bn["bias"], bn["running_mean"], bn["running_var"]
    scale = gamma / np.sqrt(var + eps)
    return w * scale[:, None, None, None], beta - mean * scale


def _dirac(dim: int, k: int, groups: int) -> np.ndarray:
    """Identity kernel, torch OIHW layout, for a grouped conv of `dim` channels."""
    w = np.zeros((dim, dim // groups, k, k), dtype=np.float32)
    cin_g = dim // groups
    for o in range(dim):
        w[o, o % cin_g, k // 2, k // 2] = 1.0
    return w


def _pad_to(w: np.ndarray, k: int) -> np.ndarray:
    """Pad a small (e.g. 1x1 or 3x3) kernel to the center of a k x k kernel."""
    kh = w.shape[-1]
    p = (k - kh) // 2
    return np.pad(w, ((0, 0), (0, 0), (p, p), (p, p)))


def _fuse_mobileone(sd: Mapping[str, np.ndarray], prefix: str, dim_in: int, dim_out: int,
                    k: int, groups: int) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse a timm MobileOneBlock (conv_kxk branches + conv_scale + identity BN)
    into one OIHW kernel + bias. Inference-form checkpoints ('reparam_conv') pass
    through unchanged."""
    if f"{prefix}reparam_conv.weight" in sd:
        return sd[f"{prefix}reparam_conv.weight"], sd.get(
            f"{prefix}reparam_conv.bias", np.zeros((dim_out,), np.float32))
    w_total = np.zeros((dim_out, dim_in // groups, k, k), dtype=np.float32)
    b_total = np.zeros((dim_out,), dtype=np.float32)
    i = 0
    while f"{prefix}conv_kxk.{i}.conv.weight" in sd:
        bn = {n: sd[f"{prefix}conv_kxk.{i}.bn.{n}"]
              for n in ("weight", "bias", "running_mean", "running_var")}
        w, b = _fuse_conv_bn(sd[f"{prefix}conv_kxk.{i}.conv.weight"], bn)
        w_total += w
        b_total += b
        i += 1
    if f"{prefix}conv_scale.conv.weight" in sd:
        bn = {n: sd[f"{prefix}conv_scale.bn.{n}"]
              for n in ("weight", "bias", "running_mean", "running_var")}
        w, b = _fuse_conv_bn(sd[f"{prefix}conv_scale.conv.weight"], bn)
        w_total += _pad_to(w, k)
        b_total += b
    if f"{prefix}identity.running_mean" in sd:
        bn = {n: sd[f"{prefix}identity.{n}"]
              for n in ("weight", "bias", "running_mean", "running_var")}
        w, b = _fuse_conv_bn(_dirac(dim_out, k, groups), bn)
        w_total += w
        b_total += b
    return w_total, b_total


def _fuse_repmixer(sd: Mapping[str, np.ndarray], prefix: str, dim: int,
                   ls_key: str) -> Tuple[np.ndarray, np.ndarray]:
    """Collapse RepMixer (x + ls*(mixer(x) - norm(x))) into one depthwise 3x3
    conv with the residual identity folded in (timm RepMixer.reparameterize)."""
    if f"{prefix}reparam_conv.weight" in sd:
        return sd[f"{prefix}reparam_conv.weight"], sd.get(
            f"{prefix}reparam_conv.bias", np.zeros((dim,), np.float32))
    wm, bm = _fuse_mobileone(sd, f"{prefix}mixer.", dim, dim, 3, dim)
    wn, bn_ = _fuse_mobileone(sd, f"{prefix}norm.", dim, dim, 3, dim)
    ls = sd.get(ls_key)
    ls = np.ones((dim,), np.float32) if ls is None else ls.reshape(dim)
    w = _dirac(dim, 3, dim) + ls[:, None, None, None] * (wm - wn)
    b = ls * (bm - bn_)
    return w, b


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def torch_fastvit_clip_to_params(sd: Mapping[str, Any], vcfg: CLIPVisionCfg,
                                 embed_dim: int) -> Dict[str, Any]:
    """timm-layout FastViT trunk state dict ('visual.trunk.' stripped) -> native tree.

    Accepts both training-form (multi-branch) and inference-form (reparam_conv)
    checkpoints; the Apple-naming remap lives in ``convert.py``
    (reference ``convert.py:223-261``)."""
    cfg = parse_fastvit_cfg(vcfg)
    sd = {k: _t(v) for k, v in sd.items()}
    d0 = cfg.dims[0]

    def mob(prefix, din, dout, k, groups):
        w, b = _fuse_mobileone(sd, prefix, din, dout, k, groups)
        return {"kernel": jnp.asarray(_oihw_to_hwio(w)), "bias": jnp.asarray(b)}

    params: Dict[str, Any] = {
        "stem": [
            mob("stem.0.", 3, d0, 3, 1),
            mob("stem.1.", d0, d0, 3, d0),
            mob("stem.2.", d0, d0, 1, 1),
        ],
        "stages": {},
    }

    def se_tree(prefix, dim):
        out = {}
        for name, mine in (("fc1", "fc1"), ("fc2", "fc2")):
            for cand in (f"{prefix}{name}.weight", f"{prefix}conv_reduce.weight" if name == "fc1"
                         else f"{prefix}conv_expand.weight"):
                if cand in sd:
                    base = cand[: -len(".weight")]
                    out[mine] = {"kernel": jnp.asarray(_oihw_to_hwio(sd[cand])),
                                 "bias": jnp.asarray(sd.get(base + ".bias",
                                                            np.zeros(sd[cand].shape[0], np.float32)))}
                    break
        return out or None

    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        sp = f"stages.{i}."
        stage: Dict[str, Any] = {}
        if i > 0:
            din = cfg.dims[i - 1]
            lkw_key = f"{sp}downsample.proj.0."
            if f"{lkw_key}reparam_conv.weight" in sd:
                w, b = sd[f"{lkw_key}reparam_conv.weight"], sd[f"{lkw_key}reparam_conv.bias"]
            else:
                bnl = {n: sd[f"{lkw_key}large_conv.bn.{n}"]
                       for n in ("weight", "bias", "running_mean", "running_var")}
                w, b = _fuse_conv_bn(sd[f"{lkw_key}large_conv.conv.weight"], bnl)
                if f"{lkw_key}small_conv.conv.weight" in sd:
                    bns = {n: sd[f"{lkw_key}small_conv.bn.{n}"]
                           for n in ("weight", "bias", "running_mean", "running_var")}
                    ws, bs_ = _fuse_conv_bn(sd[f"{lkw_key}small_conv.conv.weight"], bns)
                    w = w + _pad_to(ws, 7)
                    b = b + bs_
            stage["downsample"] = {
                "lkc": {"kernel": jnp.asarray(_oihw_to_hwio(w)), "bias": jnp.asarray(b)},
                "pw": mob(f"{sp}downsample.proj.1.", dim, dim, 1, 1),
            }
            se = se_tree(f"{sp}downsample.proj.1.se.", dim) or se_tree(f"{sp}downsample.se.", dim)
            if se:
                stage["downsample"]["se"] = se
        if f"{sp}pos_emb.reparam_conv.weight" in sd:
            # inference-form RepCPE: identity already folded into the kernel
            stage["pos_emb"] = {
                "kernel": jnp.asarray(_oihw_to_hwio(sd[f"{sp}pos_emb.reparam_conv.weight"])),
                "bias": jnp.asarray(sd.get(f"{sp}pos_emb.reparam_conv.bias",
                                           np.zeros((dim,), np.float32)))}
        elif f"{sp}pos_emb.pos_enc.weight" in sd or f"{sp}pos_emb.proj.weight" in sd:
            key = f"{sp}pos_emb.pos_enc.weight" if f"{sp}pos_emb.pos_enc.weight" in sd \
                else f"{sp}pos_emb.proj.weight"
            base = key[: -len(".weight")]
            w = sd[key] + _dirac(dim, sd[key].shape[-1], dim)  # RepCPE identity fold
            stage["pos_emb"] = {"kernel": jnp.asarray(_oihw_to_hwio(w)),
                                "bias": jnp.asarray(sd.get(base + ".bias",
                                                           np.zeros((dim,), np.float32)))}
        mixer = cfg.token_mixers[i]
        blocks = []
        for j in range(depth):
            bp = f"{sp}blocks.{j}."
            if mixer == "repmixer":
                wm, bm = _fuse_repmixer(sd, f"{bp}token_mixer.", dim,
                                        f"{bp}token_mixer.layer_scale.gamma")
                blk = {
                    "mixer": {"kernel": jnp.asarray(_oihw_to_hwio(wm)), "bias": jnp.asarray(bm)},
                    "ls2": jnp.asarray(sd[f"{bp}layer_scale.gamma"].reshape(dim))
                    if f"{bp}layer_scale.gamma" in sd else jnp.ones((dim,)),
                }
            else:
                blk = {
                    "norm": {"scale": jnp.asarray(sd[f"{bp}norm.weight"]),
                             "bias": jnp.asarray(sd[f"{bp}norm.bias"]),
                             "mean": jnp.asarray(sd[f"{bp}norm.running_mean"]),
                             "var": jnp.asarray(sd[f"{bp}norm.running_var"])},
                    "qkv": {"kernel": jnp.asarray(sd[f"{bp}token_mixer.qkv.weight"].T)},
                    "proj": {"kernel": jnp.asarray(sd[f"{bp}token_mixer.proj.weight"].T),
                             "bias": jnp.asarray(sd.get(f"{bp}token_mixer.proj.bias",
                                                        np.zeros((dim,), np.float32)))},
                    "ls1": jnp.asarray(sd[f"{bp}layer_scale_1.gamma"].reshape(dim))
                    if f"{bp}layer_scale_1.gamma" in sd else jnp.ones((dim,)),
                    "ls2": jnp.asarray(sd[f"{bp}layer_scale_2.gamma"].reshape(dim))
                    if f"{bp}layer_scale_2.gamma" in sd else jnp.ones((dim,)),
                }
                if f"{bp}token_mixer.qkv.bias" in sd:
                    blk["qkv"]["bias"] = jnp.asarray(sd[f"{bp}token_mixer.qkv.bias"])
            # shared ConvMlp (both block kinds)
            cbn = {n: sd[f"{bp}mlp.conv.bn.{n}"]
                   for n in ("weight", "bias", "running_mean", "running_var")} \
                if f"{bp}mlp.conv.bn.weight" in sd else None
            if cbn is not None:
                wc, bc = _fuse_conv_bn(sd[f"{bp}mlp.conv.conv.weight"], cbn)
            else:
                wc = sd[f"{bp}mlp.conv.weight"] if f"{bp}mlp.conv.weight" in sd \
                    else sd[f"{bp}mlp.conv.reparam_conv.weight"]
                bc = sd.get(f"{bp}mlp.conv.bias",
                            sd.get(f"{bp}mlp.conv.reparam_conv.bias",
                                   np.zeros((dim,), np.float32)))
            blk["mlp_conv"] = {"kernel": jnp.asarray(_oihw_to_hwio(wc)), "bias": jnp.asarray(bc)}
            blk["fc1"] = {"kernel": jnp.asarray(_oihw_to_hwio(sd[f"{bp}mlp.fc1.weight"])),
                          "bias": jnp.asarray(sd.get(f"{bp}mlp.fc1.bias"))}
            blk["fc2"] = {"kernel": jnp.asarray(_oihw_to_hwio(sd[f"{bp}mlp.fc2.weight"])),
                          "bias": jnp.asarray(sd.get(f"{bp}mlp.fc2.bias"))}
            blocks.append(blk)
        stage["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        params["stages"][str(i)] = stage

    dlast = cfg.dims[-1]
    dcls = int(dlast * cfg.cls_ratio)
    w, b = _fuse_mobileone(sd, "final_conv.", dlast, dcls, 3, dlast)
    params["final_conv"] = {"kernel": jnp.asarray(_oihw_to_hwio(w)), "bias": jnp.asarray(b)}
    se = se_tree("final_conv.se.", dcls)
    if se:
        params["final_se"] = se
    else:
        params["final_se"] = {"fc1": {"kernel": jnp.zeros((1, 1, dcls, 8)),
                                      "bias": jnp.full((8,), 10.0)},
                              "fc2": {"kernel": jnp.zeros((1, 1, 8, dcls)),
                                      "bias": jnp.full((dcls,), 10.0)}}  # sigmoid(10) ~ 1: no-op SE
    if "head.fc.weight" in sd:
        params["head"] = {"kernel": jnp.asarray(sd["head.fc.weight"].T),
                          "bias": jnp.asarray(sd.get("head.fc.bias",
                                                     np.zeros((embed_dim,), np.float32)))}
    return params
