"""EVA tower parity vs a from-scratch torch oracle.

timm is not installed in this environment (the reference cannot build its EVA towers
here either), so the oracle is a torch module tree implementing timm's published Eva
architecture (timm models/eva.py + layers/pos_embed_sincos.py) with timm's state-dict
key names — the same methodology as the SigLIP-trunk test (test_timm_vit_convert.py).
Covers both flavors: EVA01-style (fused qkv with zero k-bias, GELU MLP, abs pos only)
and EVA02-style (separate q/k/v, SwiGLU with inner LN, 2D axial rope on patch tokens).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from open_clip_tpu.config import CLIPVisionCfg
from open_clip_tpu.models import eva as eva_mod


# --- tiny test variants registered into the native config table -------------------

TINY_EVA01 = eva_mod.EvaCfg(dim=64, depth=2, heads=2, patch=16, mlp_hidden=128,
                            swiglu=False, fused_qkv=True, rope=False, scale_mlp=False,
                            image_size=64)
TINY_EVA02 = eva_mod.EvaCfg(dim=64, depth=2, heads=2, patch=16, mlp_hidden=96,
                            swiglu=True, fused_qkv=False, rope=True, scale_mlp=True,
                            image_size=64, ref_feat_shape=(4, 4))

TINY_PE = eva_mod.EvaCfg(dim=64, depth=2, heads=2, patch=16, mlp_hidden=128,
                         swiglu=False, fused_qkv=True, rope=True, scale_mlp=False,
                         image_size=64, pool="map")

eva_mod.EVA_CONFIGS.setdefault("eva_test_tiny", TINY_EVA01)
eva_mod.EVA_CONFIGS.setdefault("eva02_test_tiny", TINY_EVA02)
eva_mod.EVA_CONFIGS.setdefault("vit_pe_core_test_tiny", TINY_PE)


# --- torch oracle ------------------------------------------------------------------

def _rot(x):
    # timm layers/pos_embed_sincos.rot: interleaved-pair rotation
    return torch.stack([-x[..., 1::2], x[..., ::2]], -1).reshape(x.shape)


def _apply_rope_torch(x, table):
    hd = x.shape[-1]
    sin = torch.from_numpy(table[:, :hd]).to(x.dtype)
    cos = torch.from_numpy(table[:, hd:]).to(x.dtype)
    return x * cos + _rot(x) * sin


class OracleAttention(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.heads = cfg.heads
        self.fused = cfg.fused_qkv
        d = cfg.dim
        if cfg.fused_qkv:
            self.qkv = nn.Linear(d, 3 * d, bias=False)
            self.q_bias = nn.Parameter(torch.zeros(d))
            self.register_buffer("k_bias", torch.zeros(d), persistent=False)
            self.v_bias = nn.Parameter(torch.zeros(d))
        else:
            self.q_proj = nn.Linear(d, d, bias=True)
            self.k_proj = nn.Linear(d, d, bias=False)
            self.v_proj = nn.Linear(d, d, bias=True)
        self.proj = nn.Linear(d, d)

    def forward(self, x, rope=None):
        b, n, d = x.shape
        hd = d // self.heads
        if self.fused:
            qkv = nn.functional.linear(
                x, self.qkv.weight, torch.cat([self.q_bias, self.k_bias, self.v_bias]))
            q, k, v = qkv.chunk(3, -1)
        else:
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q = q.view(b, n, self.heads, hd).transpose(1, 2)
        k = k.view(b, n, self.heads, hd).transpose(1, 2)
        v = v.view(b, n, self.heads, hd).transpose(1, 2)
        if rope is not None:
            q = torch.cat([q[:, :, :1], _apply_rope_torch(q[:, :, 1:], rope)], 2)
            k = torch.cat([k[:, :, :1], _apply_rope_torch(k[:, :, 1:], rope)], 2)
        attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.proj(out)


class OracleMlp(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, h = cfg.dim, cfg.mlp_hidden
        self.swiglu = cfg.swiglu
        if cfg.swiglu:
            self.fc1_g = nn.Linear(d, h)
            self.fc1_x = nn.Linear(d, h)
            self.norm = nn.LayerNorm(h, eps=cfg.norm_eps) if cfg.scale_mlp else nn.Identity()
            self.fc2 = nn.Linear(h, d)
        else:
            self.fc1 = nn.Linear(d, h)
            self.fc2 = nn.Linear(h, d)

    def forward(self, x):
        if self.swiglu:
            h = nn.functional.silu(self.fc1_g(x)) * self.fc1_x(x)
            return self.fc2(self.norm(h))
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class OracleBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.norm1 = nn.LayerNorm(cfg.dim, eps=cfg.norm_eps)
        self.attn = OracleAttention(cfg)
        self.norm2 = nn.LayerNorm(cfg.dim, eps=cfg.norm_eps)
        self.mlp = OracleMlp(cfg)

    def forward(self, x, rope=None):
        x = x + self.attn(self.norm1(x), rope=rope)
        return x + self.mlp(self.norm2(x))


class OracleAttnPoolLatent(nn.Module):
    """timm AttentionPoolLatent (latent_len=1) — the PE-Core 'map' head."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.latent = nn.Parameter(torch.zeros(1, 1, dim))
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, 2 * dim)
        self.proj = nn.Linear(dim, dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, dim * 4)
        mlp.fc2 = nn.Linear(dim * 4, dim)
        self.mlp = mlp

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        q = self.q(self.latent.expand(b, -1, -1)).reshape(b, 1, self.heads, hd).transpose(1, 2)
        kv = self.kv(x).reshape(b, n, 2, self.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, 1, c)
        o = self.proj(o)
        o = o + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm(o))))
        return o[:, 0]


class OracleEva(nn.Module):
    def __init__(self, cfg, embed_dim):
        super().__init__()
        self.cfg = cfg
        grid = cfg.image_size // cfg.patch
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, cfg.dim, cfg.patch, cfg.patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, cfg.dim))
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, cfg.dim) * 0.02)
        self.blocks = nn.ModuleList(OracleBlock(cfg) for _ in range(cfg.depth))
        self.norm = nn.LayerNorm(cfg.dim, eps=cfg.norm_eps)
        self.head = nn.Linear(cfg.dim, embed_dim)
        if cfg.pool == "map":
            self.attn_pool = OracleAttnPoolLatent(cfg.dim, cfg.heads)
        self.rope = (eva_mod.rope_table(grid, grid, cfg.dim // cfg.heads, cfg.ref_feat_shape)
                     if cfg.rope else None)

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], 1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x, rope=self.rope)
        x = self.norm(x)
        pooled = self.attn_pool(x) if self.cfg.pool == "map" else x[:, 0]
        return self.head(pooled)


@pytest.mark.parametrize("name", ["eva_test_tiny", "eva02_test_tiny", "vit_pe_core_test_tiny"])
def test_eva_parity(rng, name):
    cfg = eva_mod.EVA_CONFIGS[name]
    torch.manual_seed(3)
    oracle = OracleEva(cfg, embed_dim=32)
    with torch.no_grad():
        for p in oracle.parameters():
            if p.ndim > 0:
                p.copy_(torch.randn_like(p) * 0.05)
    oracle.eval()

    vcfg = CLIPVisionCfg(timm_model_name=name, image_size=cfg.image_size)
    params = eva_mod.timm_eva_to_params(oracle.state_dict(), vcfg)

    img = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        expect = oracle(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(eva_mod.apply_eva(params, vcfg, jnp.asarray(img)))
    np.testing.assert_allclose(got, expect, atol=2e-5)


def test_eva_in_clip_container(rng):
    import open_clip_tpu as oct

    name = "tiny-eva02-clip"
    if name not in oct.list_models():
        oct.add_model_config({
            "embed_dim": 32,
            "vision_cfg": {"image_size": 64, "timm_model_name": "eva02_test_tiny",
                           "timm_pool": "token", "timm_proj": None},
            "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32,
                         "heads": 2, "layers": 2},
            "custom_text": True,
        }, name=name)
    model = oct.create_model(name)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    feats = model.encode_image(img, normalize=True)
    assert feats.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)


def test_eva_registry_configs_resolve():
    """Every published EVA family in the registry resolves to a native config."""
    for name in ("eva_giant_patch14_224", "eva02_base_patch16_clip_224",
                 "eva02_large_patch14_clip_224", "eva02_large_patch14_clip_336",
                 "eva02_enormous_patch14_clip_224", "vit_pe_core_base_patch16_224",
                 "vit_pe_core_large_patch14_336", "vit_pe_core_gigantic_patch14_448",
                 "vit_pe_core_small_patch16_384", "vit_pe_core_tiny_patch16_384"):
        vcfg = CLIPVisionCfg(timm_model_name=name, image_size=None)
        ecfg = eva_mod.resolve_eva_cfg(vcfg)
        assert ecfg.dim % ecfg.heads == 0
