"""SigLIP torch-checkpoint (timm-ViT trunk) conversion parity.

timm is not installed here (the reference can't build these towers in this env), so
the oracle is a from-scratch torch module tree following timm's published ViT +
AttentionPoolLatent structure and exact state-dict key names — the keys reference
SigLIP checkpoints carry under ``visual.trunk.``.
"""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn as nn

from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.convert import torch_clip_to_params
from open_clip_tpu.models.clip import encode_image


class TimmBlock(nn.Module):
    def __init__(self, w, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(w, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(w, 3 * w)
        self.attn.proj = nn.Linear(w, w)
        self.norm2 = nn.LayerNorm(w, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(w, 4 * w)
        self.mlp.fc2 = nn.Linear(4 * w, w)

    def _attn(self, x):
        b, n, w = x.shape
        hd = w // self.heads
        qkv = self.attn.qkv(x).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        a = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1)
        return self.attn.proj((a @ v).transpose(1, 2).reshape(b, n, w))

    def forward(self, x):
        x = x + self._attn(self.norm1(x))
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class TimmSiglipViT(nn.Module):
    """timm vision_transformer + AttentionPoolLatent with timm's key names."""

    def __init__(self, w=768, layers=12, heads=12, patch=16, size=224):
        super().__init__()
        n = (size // patch) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, w, patch, stride=patch)
        self.pos_embed = nn.Parameter(torch.randn(1, n, w) * 0.02)
        self.blocks = nn.ModuleList(TimmBlock(w, heads) for _ in range(layers))
        self.norm = nn.LayerNorm(w, eps=1e-6)
        ap = nn.Module()
        ap.latent = nn.Parameter(torch.randn(1, 1, w) * 0.02)
        ap.q = nn.Linear(w, w)
        ap.kv = nn.Linear(w, 2 * w)
        ap.proj = nn.Linear(w, w)
        ap.norm = nn.LayerNorm(w, eps=1e-6)
        ap.mlp = nn.Module()
        ap.mlp.fc1 = nn.Linear(w, 4 * w)
        ap.mlp.fc2 = nn.Linear(4 * w, w)
        self.attn_pool = ap
        self.heads = heads

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        ap, (b, n, w) = self.attn_pool, x.shape
        hd = w // self.heads
        q = ap.q(ap.latent.expand(b, -1, -1)).reshape(b, 1, self.heads, hd).transpose(1, 2)
        kv = ap.kv(x).reshape(b, n, 2, self.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        a = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1)
        out = ap.proj((a @ v).transpose(1, 2).reshape(b, 1, w))
        out = out + ap.mlp.fc2(torch.nn.functional.gelu(ap.mlp.fc1(ap.norm(out))))
        return out[:, 0]


def test_siglip_torch_trunk_parity():
    torch.manual_seed(0)
    trunk = TimmSiglipViT().eval()
    with torch.no_grad():
        for p in trunk.parameters():
            if p.ndim > 1:
                p.normal_(0, 0.02)
    sd = {f"visual.trunk.{k}": v for k, v in trunk.state_dict().items()}

    cfg = parse_model_cfg("ViT-B-16-SigLIP")
    params = torch_clip_to_params(sd, cfg)
    params["logit_scale"] = jnp.asarray(0.0)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(encode_image(params, cfg, jnp.asarray(img)))
    cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 1 - 1e-5, cos
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


class TimmMciViT(nn.Module):
    """timm vit_base_mci-style hybrid: 4-conv MCi stem + 1x1 proj + cls-token ViT
    (MobileCLIP-B trunk; reference MobileCLIP-B.json + convert.py:223-261)."""

    def __init__(self, w=64, layers=2, heads=2, size=64, chans=(16, 32, 64),
                 strides=(4, 2, 2), embed=32):
        super().__init__()
        backbone = nn.ModuleList()
        cin = 3
        for c, st in zip(chans, strides):
            m = nn.Module()
            m.conv = nn.Conv2d(cin, c, st, st, 0, bias=False)
            m.bn = nn.BatchNorm2d(c)
            backbone.append(m)
            cin = c
        pe = nn.Module()
        pe.backbone = backbone
        pe.proj = nn.Conv2d(cin, w, 1)
        self.patch_embed = pe
        n = (size // 16) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, w))
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, w) * 0.02)
        self.blocks = nn.ModuleList(TimmBlock(w, heads) for _ in range(layers))
        self.norm = nn.LayerNorm(w, eps=1e-6)
        self.head = nn.Linear(w, embed)

    def forward(self, x):  # NCHW
        for m in self.patch_embed.backbone:
            x = torch.nn.functional.gelu(m.bn(m.conv(x)))
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])


def test_mci_hybrid_trunk_parity():
    import dataclasses

    from open_clip_tpu.config import CLIPVisionCfg
    from open_clip_tpu.models.vit import apply_vision_tower

    torch.manual_seed(0)
    trunk = TimmMciViT().eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in trunk.parameters():
            if p.ndim > 1:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        for m in trunk.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.2)
                m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
    sd = {f"visual.trunk.{k}": v for k, v in trunk.state_dict().items()}

    from open_clip_tpu.convert import _convert_timm_vit_trunk

    params = _convert_timm_vit_trunk(sd)
    vcfg = CLIPVisionCfg(layers=2, width=64, head_width=32, patch_size=16, image_size=64,
                         class_token=True, pool_type="tok",
                         conv_stem_channels=(16, 32, 64), conv_stem_strides=(4, 2, 2),
                         norm_kwargs={"eps": 1e-6})
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    got, _ = apply_vision_tower(params, vcfg, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)


def test_mobileclip_b_factory():
    import open_clip_tpu as oc

    model, _, _ = oc.create_model_and_transforms("MobileCLIP-B")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 224, 224, 3)), jnp.float32)
    out = model.encode_image(x, normalize=True)
    assert out.shape == (1, 512)


class TimmNaFlexViT(nn.Module):
    """timm NaFlexVit with timm's key names: Linear patch embed over channels-last
    (py, px, c) patches, learned (1, gh, gw, W) pos grid, no pre-norm, MAP pool —
    the trunk layout of SigLIP2-naflex checkpoints."""

    def __init__(self, w=768, layers=12, heads=12, patch=16, grid=(16, 16)):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Linear(patch * patch * 3, w)
        self.pos_embed = nn.Parameter(torch.randn(1, grid[0], grid[1], w) * 0.02)
        self.blocks = nn.ModuleList(TimmBlock(w, heads) for _ in range(layers))
        self.norm = nn.LayerNorm(w, eps=1e-6)
        ap = nn.Module()
        ap.latent = nn.Parameter(torch.randn(1, 1, w) * 0.02)
        ap.q = nn.Linear(w, w)
        ap.kv = nn.Linear(w, 2 * w)
        ap.proj = nn.Linear(w, w)
        ap.norm = nn.LayerNorm(w, eps=1e-6)
        ap.mlp = nn.Module()
        ap.mlp.fc1 = nn.Linear(w, 4 * w)
        ap.mlp.fc2 = nn.Linear(4 * w, w)
        self.attn_pool = ap
        self.heads = heads
        self.grid = grid

    def forward(self, patches):  # (B, N, p*p*3) at the FULL pos grid (identity sample)
        x = self.patch_embed.proj(patches)
        x = x + self.pos_embed.reshape(1, -1, x.shape[-1])
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        ap, (b, n, w) = self.attn_pool, x.shape
        hd = w // self.heads
        q = ap.q(ap.latent.expand(b, -1, -1)).reshape(b, 1, self.heads, hd).transpose(1, 2)
        kv = ap.kv(x).reshape(b, n, 2, self.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        a = torch.softmax(q @ k.transpose(-2, -1) * hd**-0.5, dim=-1)
        out = ap.proj((a @ v).transpose(1, 2).reshape(b, 1, w))
        out = out + ap.mlp.fc2(torch.nn.functional.gelu(ap.mlp.fc1(ap.norm(out))))
        return out[:, 0]


def test_siglip2_naflex_torch_trunk_parity():
    """Converted SigLIP2-naflex trunk matches the torch oracle on a full-grid patch
    batch (pos-embed sampling reduces to an exact gather there)."""
    torch.manual_seed(1)
    grid = (16, 16)
    trunk = TimmNaFlexViT(grid=grid).eval()
    with torch.no_grad():
        for p in trunk.parameters():
            if p.ndim > 1:
                p.normal_(0, 0.02)
    sd = {f"visual.trunk.{k}": v for k, v in trunk.state_dict().items()}

    cfg = parse_model_cfg("ViT-B-16-SigLIP2-naflex")
    params = torch_clip_to_params(sd, cfg)
    params["logit_scale"] = jnp.asarray(0.0)
    # timm_proj='none': converter installs the identity head
    assert np.allclose(np.asarray(params["visual"]["head"]["kernel"]), np.eye(768))
    assert "norm_pre" not in params["visual"]  # timm naflexvit has no pre-norm

    n = grid[0] * grid[1]
    rng = np.random.default_rng(3)
    patches = (rng.standard_normal((2, n, 768)) * 0.5).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(grid[0]), np.arange(grid[1]), indexing="ij")
    coords = np.broadcast_to(
        np.stack([ys.reshape(-1), xs.reshape(-1)], -1), (2, n, 2)).astype(np.int32)
    batch = {
        "patches": jnp.asarray(patches),
        "patch_coord": jnp.asarray(coords),
        "patch_valid": jnp.ones((2, n), bool),
    }
    with torch.no_grad():
        ref = trunk(torch.from_numpy(patches)).numpy()
    got = np.asarray(encode_image(params, cfg, batch))
    cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 1 - 1e-5, cos
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)
