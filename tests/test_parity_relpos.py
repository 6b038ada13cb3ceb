"""relpos-ViT image-tower parity vs a from-scratch torch oracle (VERDICT r3 item 3).

The reference serves ``vit_relpos_medium_patch16_cls_224`` through timm
(reference src/open_clip/timm_model.py:25); timm is not installed here (and this
box has no egress), so the oracle is a torch module tree implementing timm's
published ``vision_transformer_relpos.py`` math with timm-compatible state-dict
key names. Critically, the oracle computes the bias the timm way — an MLP over
the (2h-1)x(2w-1) UNIQUE log-spaced offsets gathered through a relative-position
index — while the native tower evaluates the same MLP on the full (N, N) delta
grid; agreement proves that equivalence as well as the converter's key mapping.
timm relpos variants use ``qkv_bias=False`` and ``Mlp(bias=(True, False))``
(fc2 bias-free); the oracle mirrors that so optional-bias handling is exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from open_clip_tpu.config import CLIPVisionCfg
from open_clip_tpu.models import relpos_vit as rp_mod


# --- torch oracle (timm-compatible key names) --------------------------------------

class OracleRelPosMlp(nn.Module):
    """timm RelPosMlp, mode='cls': MLP over unique log-offsets + index gather,
    zero bias on the class-token row/column."""

    def __init__(self, grid, heads, hidden_dim):
        super().__init__()
        gh, gw = grid
        self.heads = heads
        self.grid = grid
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(2, hidden_dim, bias=True)
        self.mlp.fc2 = nn.Linear(hidden_dim, heads, bias=False)
        # unique offsets (2gh-1, 2gw-1, 2), sign * log1p(|d|)
        rh = torch.arange(-(gh - 1), gh).float()
        rw = torch.arange(-(gw - 1), gw).float()
        table = torch.stack(torch.meshgrid(rh, rw, indexing="ij"), -1)
        table = torch.sign(table) * torch.log1p(table.abs())
        self.register_buffer("rel_coords_log", table, persistent=False)
        # (N, N) index into the flattened unique-offset table
        yy, xx = torch.meshgrid(torch.arange(gh), torch.arange(gw), indexing="ij")
        coords = torch.stack([yy.reshape(-1), xx.reshape(-1)])  # (2, N)
        rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
        idx = (rel[0] + gh - 1) * (2 * gw - 1) + (rel[1] + gw - 1)
        self.register_buffer("relative_position_index", idx, persistent=False)

    def get_bias(self):
        n = self.grid[0] * self.grid[1]
        out = self.mlp.fc2(torch.relu(self.mlp.fc1(self.rel_coords_log)))
        out = out.view(-1, self.heads)[self.relative_position_index.view(-1)]
        out = out.view(n, n, self.heads).permute(2, 0, 1)  # (H, N, N)
        return torch.nn.functional.pad(out, [1, 0, 1, 0])  # cls row/col = 0


class OracleBlock(nn.Module):
    def __init__(self, dim, heads, grid, hidden_dim, mlp_ratio=4.0):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=False)  # timm relpos qkv_bias=False
        self.attn.rel_pos = OracleRelPosMlp(grid, heads, hidden_dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        q, k, v = self.attn.qkv(self.norm1(x)).view(
            b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn + self.attn.rel_pos.get_bias().unsqueeze(0)
        x = x + self.attn.proj(
            (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c))
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class OracleRelPosViT(nn.Module):
    def __init__(self, rc, image_size, embed_dim):
        super().__init__()
        ps, dim = rc["patch_size"], rc["width"]
        grid = (image_size // ps, image_size // ps)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, ps, ps)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.blocks = nn.ModuleList([
            OracleBlock(dim, rc["heads"], grid, rc["hidden_dim"], rc["mlp_ratio"])
            for _ in range(rc["depth"])])
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Module()
        self.head.proj = nn.Linear(dim, embed_dim, bias=False)

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        for blk in self.blocks:
            x = blk(x)
        return self.head.proj(self.norm(x)[:, 0])  # global_pool='token'


TINY = dict(patch_size=16, width=64, depth=2, heads=2, mlp_ratio=4.0,
            class_token=True, hidden_dim=32)


@pytest.fixture(scope="module", autouse=True)
def _register_tiny():
    rp_mod.RELPOS_CONFIGS["vit_relpos_test_tiny"] = TINY
    yield
    rp_mod.RELPOS_CONFIGS.pop("vit_relpos_test_tiny", None)


def _seeded_oracle(rc, image_size, embed_dim, seed=11):
    torch.manual_seed(seed)
    oracle = OracleRelPosViT(rc, image_size, embed_dim)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    oracle.eval()
    return oracle


@pytest.mark.parametrize("name,image_size,embed_dim", [
    ("vit_relpos_test_tiny", 64, 32),
    ("vit_relpos_medium_patch16_cls_224", 224, 512),
])
def test_relpos_parity(name, image_size, embed_dim):
    rc = rp_mod.RELPOS_CONFIGS[name]
    oracle = _seeded_oracle(rc, image_size, embed_dim)
    vc = CLIPVisionCfg(image_size=image_size, timm_model_name=name)
    params = rp_mod.torch_relpos_to_params(
        {k: v for k, v in oracle.state_dict().items()}, vc)
    img = np.random.default_rng(1).standard_normal(
        (2, image_size, image_size, 3)).astype(np.float32)
    with torch.no_grad():
        expect = oracle(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(jax.jit(
        lambda p, x: rp_mod.apply_relpos_vit(p, vc, x))(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, expect, atol=3e-5)


def test_relpos_trunk_dispatch_through_converter():
    """``torch_clip_to_params`` routes visual.trunk.* relpos checkpoints to the
    native relpos converter, NOT the generic timm-ViT branch (which would
    mis-parse rel_pos.mlp keys or drop the bias MLP entirely)."""
    from open_clip_tpu.config import CLIPModelCfg, CLIPTextCfg
    from open_clip_tpu.convert import torch_clip_to_params

    oracle = _seeded_oracle(TINY, 64, 32)
    vc = CLIPVisionCfg(image_size=64, timm_model_name="vit_relpos_test_tiny")
    sd = {}
    for k, v in oracle.state_dict().items():
        if k.startswith("head."):
            sd["visual." + k] = v  # TimmModel adapter head lives outside the trunk
        else:
            sd["visual.trunk." + k] = v
    cfg = CLIPModelCfg(embed_dim=32, vision_cfg=vc,
                       text_cfg=CLIPTextCfg(width=64, heads=2, layers=2))
    tree = torch_clip_to_params(sd, cfg)
    direct = rp_mod.torch_relpos_to_params(
        {k: v for k, v in oracle.state_dict().items()}, vc)
    jax.tree.map(np.testing.assert_array_equal, tree["visual"], direct)
