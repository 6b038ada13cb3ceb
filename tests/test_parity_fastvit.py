"""FastViT (MobileCLIP MCi) parity vs a from-scratch torch training-form oracle.

timm is not installed here (the reference cannot build its fastvit towers in this
environment either), so the oracle is a torch module tree implementing the FastViT
architecture in its *training* (multi-branch, BatchNorm) form with timm's
``fastvit.py`` state-dict key names — the same methodology as the EVA test
(tests/test_parity_eva.py). This is a strong check of the converter's
reparameterization algebra: the native model runs the *collapsed* single-conv
form, so agreement requires every conv+BN fold, branch sum, RepMixer fold and
dirac identity to be exact.

Reference surface: timm tower build ``src/open_clip/timm_model.py:25``,
MobileCLIP conversion ``src/open_clip/convert.py:223-261``.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from open_clip_tpu.config import CLIPVisionCfg
from open_clip_tpu.models import fastvit as fv


TINY = fv.FastVitCfg(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                     mlp_ratios=(3.0, 3.0, 3.0, 3.0), image_size=64, head_dim=16)
fv.FASTVIT_CFGS.setdefault("fastvit_test_tiny", TINY)


# --- torch oracle (training form, timm fastvit key names) --------------------------

class MobileOneBlock(nn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, use_se=False, use_act=True,
                 use_scale=None, num_branches=1, use_identity=None):
        super().__init__()
        self.k, self.stride, self.groups = k, stride, groups
        use_scale = (k > 1) if use_scale is None else use_scale
        if use_identity is None:
            use_identity = cin == cout and stride == 1
        self.conv_kxk = nn.ModuleList()
        for _ in range(num_branches):
            m = nn.Sequential()
            m.conv = nn.Conv2d(cin, cout, k, stride, k // 2, groups=groups, bias=False)
            m.bn = nn.BatchNorm2d(cout)
            self.conv_kxk.append(m)
        self.conv_scale = None
        if use_scale:
            m = nn.Sequential()
            m.conv = nn.Conv2d(cin, cout, 1, stride, 0, groups=groups, bias=False)
            m.bn = nn.BatchNorm2d(cout)
            self.conv_scale = m
        self.identity = nn.BatchNorm2d(cout) if use_identity else None
        self.se = SE(cout, max(cout // 16, 4)) if use_se else None
        self.act = nn.GELU() if use_act else nn.Identity()

    def forward(self, x):
        out = sum(br.bn(br.conv(x)) for br in self.conv_kxk)
        if self.conv_scale is not None:
            out = out + self.conv_scale.bn(self.conv_scale.conv(x))
        if self.identity is not None:
            out = out + self.identity(x)
        if self.se is not None:
            out = self.se(out)
        return self.act(out)


class SE(nn.Module):
    def __init__(self, dim, rd):
        super().__init__()
        self.fc1 = nn.Conv2d(dim, rd, 1)
        self.fc2 = nn.Conv2d(rd, dim, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class RepMixer(nn.Module):
    def __init__(self, dim, ls_init=1e-5):
        super().__init__()
        # timm RepMixer: mixer keeps all branches (kxk + 1x1 scale + identity BN),
        # norm is identity-BN only (num_conv_branches=0) — exercises every fusion path
        self.mixer = MobileOneBlock(dim, dim, 3, groups=dim, use_act=False)
        self.norm = MobileOneBlock(dim, dim, 3, groups=dim, use_act=False,
                                   use_scale=False, num_branches=0)
        self.layer_scale = LayerScale2d(dim, ls_init)

    def forward(self, x):
        return x + self.layer_scale(self.mixer(x) - self.norm(x))


class LayerScale2d(nn.Module):
    def __init__(self, dim, init):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim, 1, 1), init))

    def forward(self, x):
        return x * self.gamma


class ConvMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        m = nn.Sequential()
        m.conv = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim, bias=False)
        m.bn = nn.BatchNorm2d(dim)
        self.conv = m
        self.fc1 = nn.Conv2d(dim, hidden, 1)
        self.act = nn.GELU()
        self.fc2 = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(self.conv.bn(self.conv.conv(x)))))


class RepMixerBlock(nn.Module):
    def __init__(self, dim, hidden, ls_init=1e-5):
        super().__init__()
        self.token_mixer = RepMixer(dim, ls_init)
        self.mlp = ConvMlp(dim, hidden)
        self.layer_scale = LayerScale2d(dim, ls_init)

    def forward(self, x):
        x = self.token_mixer(x)
        return x + self.layer_scale(self.mlp(x))


class Attention(nn.Module):
    def __init__(self, dim, head_dim):
        super().__init__()
        self.nh = dim // head_dim
        self.hd = head_dim
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, c, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)  # (B, N, C)
        qkv = self.qkv(t).reshape(b, h * w, 3, self.nh, self.hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, h * w, c)
        o = self.proj(o)
        return o.transpose(1, 2).reshape(b, c, h, w)


class AttentionBlock(nn.Module):
    def __init__(self, dim, hidden, head_dim, ls_init=1e-5):
        super().__init__()
        self.norm = nn.BatchNorm2d(dim)
        self.token_mixer = Attention(dim, head_dim)
        self.layer_scale_1 = LayerScale2d(dim, ls_init)
        self.mlp = ConvMlp(dim, hidden)
        self.layer_scale_2 = LayerScale2d(dim, ls_init)

    def forward(self, x):
        x = x + self.layer_scale_1(self.token_mixer(self.norm(x)))
        return x + self.layer_scale_2(self.mlp(x))


class LargeKernelConv(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        m = nn.Sequential()
        m.conv = nn.Conv2d(cin, cout, 7, stride, 3, groups=cin, bias=False)
        m.bn = nn.BatchNorm2d(cout)
        self.large_conv = m
        s = nn.Sequential()
        s.conv = nn.Conv2d(cin, cout, 3, stride, 1, groups=cin, bias=False)
        s.bn = nn.BatchNorm2d(cout)
        self.small_conv = s
        self.act = nn.GELU()

    def forward(self, x):
        return self.act(self.large_conv.bn(self.large_conv.conv(x))
                        + self.small_conv.bn(self.small_conv.conv(x)))


class PatchEmbed(nn.Module):
    def __init__(self, cin, cout, use_se):
        super().__init__()
        self.proj = nn.Sequential(
            LargeKernelConv(cin, cout, 2),
            MobileOneBlock(cout, cout, 1, use_se=use_se),
        )

    def forward(self, x):
        return self.proj(x)


class RepCPE(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.pos_enc = nn.Conv2d(dim, dim, 7, 1, 3, groups=dim)

    def forward(self, x):
        return x + self.pos_enc(x)


class TorchFastVit(nn.Module):
    def __init__(self, cfg: fv.FastVitCfg, embed_dim: int):
        super().__init__()
        d0 = cfg.dims[0]
        self.stem = nn.Sequential(
            MobileOneBlock(3, d0, 3, stride=2),
            MobileOneBlock(d0, d0, 3, stride=2, groups=d0),
            MobileOneBlock(d0, d0, 1),
        )
        self.stages = nn.ModuleList()
        for i, (depth, dim, ratio) in enumerate(zip(cfg.depths, cfg.dims, cfg.mlp_ratios)):
            stage = nn.Module()
            hidden = int(dim * ratio)
            if i > 0:
                stage.downsample = PatchEmbed(cfg.dims[i - 1], dim, cfg.se_downsamples[i])
            if cfg.token_mixers[i] == "attention" and cfg.pos_emb_stage == i:
                stage.pos_emb = RepCPE(dim)
            mk = cfg.token_mixers[i]
            stage.blocks = nn.Sequential(*[
                RepMixerBlock(dim, hidden, cfg.ls_init) if mk == "repmixer"
                else AttentionBlock(dim, hidden, cfg.head_dim, cfg.ls_init)
                for _ in range(depth)])
            self.stages.append(stage)
        dlast = cfg.dims[-1]
        dcls = int(dlast * cfg.cls_ratio)
        self.final_conv = MobileOneBlock(dlast, dcls, 3, groups=dlast, use_se=True,
                                         use_identity=False)
        head = nn.Module()
        head.fc = nn.Linear(dcls, embed_dim)
        self.head = head
        self.cfg = cfg

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
            if hasattr(stage, "pos_emb"):
                x = stage.pos_emb(x)
            x = stage.blocks(x)
        x = self.final_conv(x)
        x = x.mean((2, 3))
        return self.head.fc(x)


def _randomize_bn(model, gen):
    """Non-trivial running stats so the conv+BN fold is actually exercised."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.2)
            m.running_var.copy_(torch.rand(m.num_features, generator=gen) * 1.5 + 0.3)
            m.weight.data.copy_(torch.rand(m.num_features, generator=gen) * 0.8 + 0.6)
            m.bias.data.copy_(torch.randn(m.num_features, generator=gen) * 0.1)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    gen = torch.Generator().manual_seed(1)
    model = TorchFastVit(TINY, embed_dim=32).eval()
    with torch.no_grad():
        _randomize_bn(model, gen)
        for p in model.parameters():
            if p.ndim >= 2:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    return model


def _vcfg():
    return CLIPVisionCfg(timm_model_name="fastvit_test_tiny", image_size=64,
                         layers=1, width=16, patch_size=16)


def test_fastvit_parity_training_form(oracle):
    """Collapsed native model == torch multi-branch training-form oracle."""
    sd = {k: v for k, v in oracle.state_dict().items()}
    params = fv.torch_fastvit_clip_to_params(sd, _vcfg(), embed_dim=32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(fv.apply_fastvit(params, _vcfg(), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_fastvit_apple_naming_roundtrip(oracle):
    """Apple ml-mobileclip key naming -> reference/timm naming -> native tree."""
    from open_clip_tpu.convert import convert_mobile_clip_state_dict

    apple = {}
    for k, v in oracle.state_dict().items():
        ak = k
        ak = ak.replace("stem.", "patch_embed.")
        for src, dst in {
            "stages.0.blocks.": "network.0.",
            "stages.1.downsample.": "network.1.",
            "stages.1.blocks.": "network.2.",
            "stages.2.downsample.": "network.3.",
            "stages.2.blocks.": "network.4.",
            "stages.3.downsample.": "network.5.",
            "stages.3.pos_emb.": "network.6.",
            "stages.3.blocks.": "network.7.",
        }.items():
            if ak.startswith(src):
                ak = dst + ak[len(src):]
                break
        ak = ak.replace("conv_kxk", "rbr_conv").replace("conv_scale", "rbr_scale")
        ak = ak.replace("identity.", "rbr_skip.") if ".identity." in "." + ak else ak
        ak = ak.replace("large_conv", "lkb_origin")
        ak = ak.replace("mlp.", "convffn.") if ".mlp." in ak else ak
        ak = ak.replace("final_conv.", "conv_exp.")
        ak = ak.replace("se.fc1", "se.reduce").replace("se.fc2", "se.expand")
        ak = ak.replace("head.fc.", "head.")
        ak = ak.replace(".pos_enc.", ".pe.")
        ak = ak.replace("layer_scale_1.gamma", "layer_scale_1")
        ak = ak.replace("layer_scale_2.gamma", "layer_scale_2")
        if ak.endswith("layer_scale.gamma"):
            ak = ak[: -len(".gamma")]
        apple["image_encoder.model." + ak] = v
    ref_sd = convert_mobile_clip_state_dict(apple)
    trunk = {k[len("visual.trunk."):]: v for k, v in ref_sd.items()
             if k.startswith("visual.trunk.")}
    params = fv.torch_fastvit_clip_to_params(trunk, _vcfg(), embed_dim=32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(fv.apply_fastvit(params, _vcfg(), jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)


def test_fastvit_factory_create():
    """MobileCLIP-S1 builds through the factory and runs encode_image."""
    import open_clip_tpu as oc

    model, _, pp_val = oc.create_model_and_transforms("MobileCLIP2-S0")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 256, 256, 3)), jnp.float32)
    out = model.encode_image(x, normalize=True)
    assert out.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)


def test_fastvit_init_matches_converted_shapes(oracle):
    sd = {k: v for k, v in oracle.state_dict().items()}
    converted = fv.torch_fastvit_clip_to_params(sd, _vcfg(), embed_dim=32)
    inited = fv.init_fastvit(jax.random.PRNGKey(0), _vcfg(), 32)
    cshapes = jax.tree.map(lambda a: jnp.shape(a), converted)
    ishapes = jax.tree.map(lambda a: jnp.shape(a), inited)
    assert cshapes == ishapes
