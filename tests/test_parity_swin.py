"""Swin image-tower parity vs a from-scratch torch oracle (VERDICT r3 item 3).

The reference serves ``swin_base_patch4_window7_224`` through timm
(reference src/open_clip/timm_model.py:25); timm is not installed here (and this
box has no egress), so the oracle is a torch module tree implementing the
published Swin-Transformer math (Liu et al. 2021 / timm ``swin_transformer.py``
as spec) with timm-compatible state-dict key names. The test proves:

- ``torch_swin_to_params`` consumes the timm key layout and the native
  ``apply_swin`` reproduces the oracle embedding to float32 precision;
- both patch-merging placements load identically (old layout: ``layers.{i}.
  downsample`` at stage END == native; current timm: stage-INPUT, keys shifted
  by one);
- the full ``torch_clip_to_params`` dispatch routes ``visual.trunk.*`` Swin
  checkpoints (killing the converter's unknown-trunk raise for this family).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from open_clip_tpu.config import CLIPVisionCfg
from open_clip_tpu.models import swin as swin_mod
from open_clip_tpu.models.htsat import relative_position_index, shifted_window_mask


# --- torch oracle (timm-compatible key names) --------------------------------------

def _win_part(x, ws):  # (B, H, W, C) -> (B*nW, ws*ws, C)
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _win_rev(x, ws, h, w):
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class OracleWindowAttention(nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.heads, self.ws = heads, ws
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        self.register_buffer(
            "relative_position_index",
            torch.from_numpy(relative_position_index(ws).copy()), persistent=True)

    def forward(self, x, mask):  # x: (B*nW, N, C)
        bn, n, c = x.shape
        hd = c // self.heads
        q, k, v = self.qkv(x).view(bn, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        rel = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1).permute(2, 0, 1)
        attn = attn + rel.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bn // nw, nw, self.heads, n, n) + mask[None, :, None]
            attn = attn.view(bn, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(bn, n, c)
        return self.proj(x)


class OracleBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift, resolution, mlp_ratio=4.0):
        super().__init__()
        self.ws, self.shift, self.resolution = ws, shift, resolution
        self.norm1 = nn.LayerNorm(dim)
        self.attn = OracleWindowAttention(dim, heads, ws)
        self.norm2 = nn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.fc2 = nn.Linear(hidden, dim)
        m = shifted_window_mask(*resolution, ws, shift)
        self.register_buffer(
            "attn_mask", None if m is None else torch.from_numpy(m), persistent=False)

    def forward(self, x):  # (B, L, C)
        h, w = self.resolution
        b, l, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        x = self.attn(_win_part(x, self.ws), self.attn_mask)
        x = _win_rev(x, self.ws, h, w)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.reshape(b, l, c)
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class OraclePatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, resolution):
        h, w = resolution
        b, l, c = x.shape
        x = x.view(b, h, w, c)
        # original Swin concat order: x0=(0::2,0::2), x1=(1::2,0::2),
        # x2=(0::2,1::2), x3=(1::2,1::2)
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                       x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = x.view(b, (h // 2) * (w // 2), 4 * c)
        return self.reduction(self.norm(x))


class OracleSwin(nn.Module):
    """Old-timm key layout: ``layers.{i}.downsample`` at stage END (== native)."""

    def __init__(self, sc, image_size, embed_dim):
        super().__init__()
        ps, ws = sc["patch_size"], sc["window"]
        dims = [sc["embed_dim"] * (2 ** i) for i in range(len(sc["depths"]))]
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dims[0], ps, ps)
        self.patch_embed.norm = nn.LayerNorm(dims[0])
        self.layers = nn.ModuleList()
        res = image_size // ps
        self.resolutions = []
        for li, depth in enumerate(sc["depths"]):
            layer = nn.Module()
            layer.blocks = nn.ModuleList([
                OracleBlock(dims[li], sc["heads"][li], min(ws, res),
                            shift=(ws // 2 if (bi % 2 == 1 and res > ws) else 0),
                            resolution=(res, res))
                for bi in range(depth)
            ])
            if li < len(sc["depths"]) - 1:
                layer.downsample = OraclePatchMerging(dims[li])
            self.layers.append(layer)
            self.resolutions.append(res)
            if li < len(sc["depths"]) - 1:
                res //= 2
        self.norm = nn.LayerNorm(dims[-1])
        self.head = nn.Module()
        self.head.proj = nn.Linear(dims[-1], embed_dim, bias=False)

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for li, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x, (self.resolutions[li], self.resolutions[li]))
        x = self.norm(x)
        return self.head.proj(x.mean(dim=1))


@pytest.fixture(scope="module")
def oracle_and_cfg():
    sc = swin_mod.SWIN_CONFIGS["swin_tiny_patch4_window7_224"]
    torch.manual_seed(7)
    oracle = OracleSwin(sc, image_size=224, embed_dim=64)
    with torch.no_grad():
        for p in oracle.parameters():
            p.copy_(torch.randn_like(p) * 0.04)
    oracle.eval()
    vc = CLIPVisionCfg(image_size=224, timm_model_name="swin_tiny_patch4_window7_224")
    return oracle, vc


def test_swin_parity_old_layout(oracle_and_cfg):
    oracle, vc = oracle_and_cfg
    params = swin_mod.torch_swin_to_params(
        {k: v for k, v in oracle.state_dict().items()}, vc)
    img = np.random.default_rng(0).standard_normal((2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        expect = oracle(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(jax.jit(
        lambda p, x: swin_mod.apply_swin(p, vc, x))(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, expect, atol=3e-5)


def test_swin_new_timm_layout_matches_old(oracle_and_cfg):
    """Current timm stores the merge ending stage i on ``layers.{i+1}.downsample``;
    the converter must land both layouts on the same native tree."""
    oracle, vc = oracle_and_cfg
    sd = {k: v for k, v in oracle.state_dict().items()}
    shifted = {}
    for k, v in sd.items():
        if ".downsample." in k:
            li = int(k.split(".")[1])
            k = k.replace(f"layers.{li}.downsample.", f"layers.{li + 1}.downsample.")
        shifted[k] = v
    p_old = swin_mod.torch_swin_to_params(sd, vc)
    p_new = swin_mod.torch_swin_to_params(shifted, vc)
    jax.tree.map(np.testing.assert_array_equal, p_old, p_new)


def test_swin_trunk_dispatch_through_converter(oracle_and_cfg):
    """``torch_clip_to_params`` routes visual.trunk.* Swin checkpoints natively
    (the unknown-trunk raise at convert.py is gone for this family)."""
    from open_clip_tpu.config import CLIPModelCfg, CLIPTextCfg
    from open_clip_tpu.convert import torch_clip_to_params

    oracle, vc = oracle_and_cfg
    sd = {}
    for k, v in oracle.state_dict().items():
        if k.startswith("head."):
            sd["visual." + k] = v  # TimmModel adapter head lives outside the trunk
        else:
            sd["visual.trunk." + k] = v
    cfg = CLIPModelCfg(embed_dim=64, vision_cfg=vc,
                       text_cfg=CLIPTextCfg(width=64, heads=2, layers=2))
    tree = torch_clip_to_params(sd, cfg)
    direct = swin_mod.torch_swin_to_params(
        {k: v for k, v in oracle.state_dict().items()}, vc)
    jax.tree.map(np.testing.assert_array_equal, tree["visual"], direct)
