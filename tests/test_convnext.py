"""ConvNeXt tower parity vs a minimal torch implementation of the timm architecture.

timm itself is not installed in this environment (the reference would refuse to build
``convnext_*`` models here), so the oracle is a from-scratch torch module tree that
follows timm's published ConvNeXt structure and state-dict key names exactly
(``stem.0/1``, ``stages.i.downsample.0/1``, ``stages.i.blocks.j.{conv_dw,norm,mlp.fc1,
mlp.fc2,gamma}``, ``head.norm``) — the same keys reference convnext CLIP checkpoints
carry under ``visual.trunk.``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models import convnext as cnx
from open_clip_tpu.models.clip import encode_image, init_clip


class TorchBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # NCHW
        s = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(x)))
        x = self.gamma * x
        return s + x.permute(0, 3, 1, 2)


class LayerNorm2d(nn.LayerNorm):
    def forward(self, x):  # NCHW, normalize over C
        return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class TorchConvNeXt(nn.Module):
    """Trunk + head with timm's key names; pool='' default: avgpool -> head.norm."""

    def __init__(self, depths, dims):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, dims[0], 4, stride=4), LayerNorm2d(dims[0]))
        self.stages = nn.ModuleList()
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(
                    LayerNorm2d(dims[i - 1]), nn.Conv2d(dims[i - 1], dim, 2, stride=2))
            stage.blocks = nn.ModuleList(TorchBlock(dim) for _ in range(depth))
            self.stages.append(stage)
        self.head = nn.Module()
        self.head.norm = nn.LayerNorm(dims[-1])

    def forward(self, x):
        x = self.stem(x)
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = stage.downsample(x)
            for blk in stage.blocks:
                x = blk(x)
        return self.head.norm(x.mean(dim=(2, 3)))


@pytest.fixture(scope="module")
def tiny_pair():
    torch.manual_seed(0)
    depths, dims = cnx.CONVNEXT_CFGS["convnext_tiny"]
    trunk = TorchConvNeXt(depths, dims).eval()
    # randomize so parity is non-trivial
    with torch.no_grad():
        for p in trunk.parameters():
            p.normal_(0, 0.02)
    proj = nn.Linear(dims[-1], 512, bias=False)
    with torch.no_grad():
        proj.weight.normal_(0, 0.02)
    sd = {f"visual.trunk.{k}": v for k, v in trunk.state_dict().items()}
    sd.update({f"visual.head.proj.{k}": v for k, v in proj.state_dict().items()})
    return trunk, proj, sd


def test_convnext_parity_vs_torch(tiny_pair):
    trunk, proj, sd = tiny_pair
    cfg = parse_model_cfg("convnext_tiny")
    params = cnx.torch_convnext_clip_to_params(sd, cfg.vision_cfg)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = proj(trunk(torch.from_numpy(img).permute(0, 3, 1, 2))).numpy()
    got = np.asarray(cnx.apply_convnext(params, cfg.vision_cfg, jnp.asarray(img)))
    cos = (ref * got).sum(-1) / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 1 - 1e-5, cos
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_convnext_mlp_head_and_dispatch(tiny_pair):
    """convnext_large_d-style mlp projection head through the full encode_image path."""
    trunk, _, sd = tiny_pair
    cfg = parse_model_cfg("convnext_tiny")
    import dataclasses
    vcfg = dataclasses.replace(cfg.vision_cfg, timm_proj="mlp")
    cfg = dataclasses.replace(cfg, vision_cfg=vcfg)

    torch.manual_seed(1)
    fc1 = nn.Linear(768, 2 * 512)
    fc2 = nn.Linear(512 * 2, 512, bias=False)
    with torch.no_grad():
        fc1.weight.normal_(0, 0.02); fc1.bias.normal_(0, 0.02)
        fc2.weight.normal_(0, 0.02)
    sd = {k: v for k, v in sd.items() if not k.startswith("visual.head.")}
    sd.update({f"visual.head.mlp.fc1.{k}": v for k, v in fc1.state_dict().items()})
    sd.update({f"visual.head.mlp.fc2.{k}": v for k, v in fc2.state_dict().items()})
    params = {"visual": cnx.torch_convnext_clip_to_params(sd, vcfg),
              "logit_scale": jnp.asarray(0.0)}

    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        feats = trunk(torch.from_numpy(img).permute(0, 3, 1, 2))
        ref = fc2(torch.nn.functional.gelu(fc1(feats))).numpy()
    got = np.asarray(encode_image(params, cfg, jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_convnext_init_and_drop_path():
    cfg = parse_model_cfg("convnext_base_w")  # drop_path 0.1, embed 640
    params = init_clip(jax.random.PRNGKey(0), cfg)
    assert params["visual"]["stages"]["2"]["blocks"]["gamma"].shape == (27, 512)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    eval_out = cnx.apply_convnext(params["visual"], cfg.vision_cfg, img)
    assert eval_out.shape == (2, 640)
    # train with stochastic depth: different rng -> different output; no-rng == eval
    t1 = cnx.apply_convnext(params["visual"], cfg.vision_cfg, img, train=True, rng=jax.random.PRNGKey(0))
    t2 = cnx.apply_convnext(params["visual"], cfg.vision_cfg, img, train=True, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    t3 = cnx.apply_convnext(params["visual"], cfg.vision_cfg, img, train=True)
    np.testing.assert_allclose(np.asarray(t3), np.asarray(eval_out), rtol=1e-5)
