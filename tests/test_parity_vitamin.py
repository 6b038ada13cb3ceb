"""ViTamin tower parity vs a from-scratch torch oracle.

timm is not installed here (the reference cannot build its vitamin towers in this
environment either), so the oracle is a torch module tree implementing the ViTamin
architecture (Chen et al., CVPR 2024; timm ``vitamin.py`` layout) with timm's
state-dict key names — the same methodology as the EVA / FastViT tests.

Reference surface: timm tower build ``src/open_clip/timm_model.py:25``, configs
``src/open_clip/model_configs/ViTamin-*.json``.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from open_clip_tpu.config import CLIPVisionCfg
from open_clip_tpu.models import vitamin as vm


TINY = vm.ViTaminCfg(conv_dims=(16, 32), conv_depths=(1, 2), embed_dim=64,
                     depth=2, heads=2, image_size=64)
vm.VITAMIN_CFGS.setdefault("vitamin_test_tiny", TINY)


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NCHW."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return x * self.weight[:, None, None] + self.bias[:, None, None]


class MbConvLNBlock(nn.Module):
    def __init__(self, cin, cout, stride, expand=4.0):
        super().__init__()
        mid = int(cout * expand)
        self.stride = stride
        self.pre_norm = LayerNorm2d(cin)
        if stride == 2 or cin != cout:
            self.down = nn.Conv2d(cin, cout, 1)
        self.conv1_1x1 = nn.Conv2d(cin, mid, 1)
        self.conv2_kxk = nn.Conv2d(mid, mid, 3, stride, 1, groups=mid)
        self.conv3_1x1 = nn.Conv2d(mid, cout, 1)
        self.act = nn.GELU()

    def forward(self, x):
        shortcut = x
        if hasattr(self, "down"):
            if self.stride == 2:
                shortcut = torch.nn.functional.avg_pool2d(shortcut, 2, 2, ceil_mode=True)
            shortcut = self.down(shortcut)
        h = self.pre_norm(x)
        h = self.act(self.conv1_1x1(h))
        h = self.act(self.conv2_kxk(h))
        h = self.conv3_1x1(h)
        return shortcut + h


class GeGluMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.w0 = nn.Linear(dim, hidden)
        self.w1 = nn.Linear(dim, hidden)
        self.w2 = nn.Linear(hidden, dim)
        self.act = nn.GELU()

    def forward(self, x):
        x = self.norm(x)
        return self.w2(self.act(self.w0(x)) * self.w1(x))


class VitBlock(nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        attn = nn.Module()
        attn.qkv = nn.Linear(dim, dim * 3)
        attn.proj = nn.Linear(dim, dim)
        self.attn = attn
        self.heads = heads
        self.mlp = GeGluMlp(dim, hidden)

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(o)
        return x + self.mlp(x)


class TorchViTamin(nn.Module):
    """timm vitamin trunk + reference TimmModel linear head (visual.head.proj)."""

    def __init__(self, cfg: vm.ViTaminCfg, embed_dim):
        super().__init__()
        c1, c2 = cfg.conv_dims
        d = cfg.embed_dim
        backbone = nn.Module()
        stem = nn.Module()
        stem.conv1 = nn.Conv2d(3, c1, 3, 2, 1)
        stem.norm1 = LayerNorm2d(c1)
        stem.conv2 = nn.Conv2d(c1, c1, 3, 1, 1)
        stem.norm2 = LayerNorm2d(c1)
        backbone.stem = stem
        backbone.stages = nn.ModuleList()
        for i, (depth, cout) in enumerate(zip(cfg.conv_depths, cfg.conv_dims)):
            cin = c1 if i == 0 else cfg.conv_dims[i - 1]
            st = nn.Module()
            st.blocks = nn.Sequential(*[
                MbConvLNBlock(cin if j == 0 else cout, cout, 2 if j == 0 else 1,
                              cfg.expand_ratio)
                for j in range(depth)])
            backbone.stages.append(st)
        pool = nn.Module()
        pool.norm = LayerNorm2d(c2)
        pool.conv = nn.Conv2d(c2, d, 3, 2, 1)
        backbone.pool = pool
        patch_embed = nn.Module()
        patch_embed.backbone = backbone
        trunk = nn.Module()
        trunk.patch_embed = patch_embed
        grid = cfg.image_size // 16
        trunk.pos_embed = nn.Parameter(torch.randn(1, grid * grid, d) * 0.02)
        hidden = int(d * cfg.mlp_ratio)
        trunk.blocks = nn.Sequential(*[VitBlock(d, cfg.heads, hidden)
                                       for _ in range(cfg.depth)])
        trunk.norm = nn.LayerNorm(d, eps=1e-6)
        self.trunk = trunk
        head = nn.Module()
        head.proj = nn.Linear(d, embed_dim)
        self.head = head
        self.cfg = cfg

    def forward(self, x):
        bb = self.trunk.patch_embed.backbone
        act = nn.functional.gelu
        x = act(bb.stem.norm1(bb.stem.conv1(x)))
        x = act(bb.stem.norm2(bb.stem.conv2(x)))
        for st in bb.stages:
            x = st.blocks(x)
        x = bb.pool.conv(bb.pool.norm(x))
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = x + self.trunk.pos_embed
        x = self.trunk.blocks(x)
        x = self.trunk.norm(x)
        x = x.mean(1)
        return self.head.proj(x)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    model = TorchViTamin(TINY, embed_dim=32).eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
            elif p.ndim == 1:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.02 + 1.0
                        if p.sum() > p.numel() * 0.5 else
                        torch.randn(p.shape, generator=gen) * 0.02)
    return model


def _vcfg():
    return CLIPVisionCfg(timm_model_name="vitamin_test_tiny", image_size=64,
                         layers=2, width=64, patch_size=16)


def test_vitamin_parity(oracle):
    sd = {"visual." + k: v for k, v in oracle.state_dict().items()}
    vis_sd = {k[len("visual."):]: v for k, v in sd.items()}
    params = vm.torch_vitamin_clip_to_params(vis_sd, _vcfg(), embed_dim=32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(vm.apply_vitamin(params, _vcfg(), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_vitamin_init_matches_converted_shapes(oracle):
    sd = {k: v for k, v in oracle.state_dict().items()}
    converted = vm.torch_vitamin_clip_to_params(sd, _vcfg(), embed_dim=32)
    inited = vm.init_vitamin(jax.random.PRNGKey(0), _vcfg(), 32)
    cshapes = jax.tree.map(lambda a: jnp.shape(a), converted)
    ishapes = jax.tree.map(lambda a: jnp.shape(a), inited)
    assert cshapes == ishapes


def test_vitamin_factory_create():
    import open_clip_tpu as oc

    model, _, pp = oc.create_model_and_transforms("ViTamin-S")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 224, 224, 3)), jnp.float32)
    out = model.encode_image(x, normalize=True)
    assert out.shape == (1, 384)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_vitamin_param_count_matches_published():
    """ViTamin-S trunk ~22M params (paper Table 2) — guards the stage table."""
    cfg = CLIPVisionCfg(timm_model_name="vitamin_small_224", image_size=224,
                        layers=14, width=384, patch_size=16)
    params = vm.init_vitamin(jax.random.PRNGKey(0), cfg, 384)
    n = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert 20e6 < n < 25e6, n
