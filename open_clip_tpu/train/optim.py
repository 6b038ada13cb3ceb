"""Optimizer construction (optax).

Equivalent of reference ``src/open_clip_train/optim.py``: AdamW with the reference's
weight-decay exclusion policy (1-D/0-D params, pos/class/cls embeddings, logit scale/bias
— optim.py:78-177) expressed as an optax mask, model-family default hparams
(``src/open_clip_train/params.py:5-11``), layer-wise LR decay via per-leaf scale masks,
and optional gradient clipping. Schedules plug in as step->lr callables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

NO_WD_NAMES = {
    "positional_embedding",
    "class_embedding",
    "cls_emb",
    "logit_scale",
    "logit_bias",
    # Attentional-pooler latents. Deliberate uniform choice: the reference's
    # newer MAP towers exclude the pool query as a learned token (reference
    # transformer.py:1481-1487) while its classic tower still decays it
    # (transformer.py:778-781); we apply the newer convention everywhere
    # (divergence pinned in tests/test_train_step_parity.py, CoCa step).
    "query",
}


@dataclass
class OptimizerCfg:
    """Mirrors the knobs of reference OptimizerCfg (optim.py:24-76)."""

    opt: str = "adamw"
    lr: float = 5e-4
    wd: float = 0.2
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    momentum: float = 0.9
    wd_exclude_names: Tuple[str, ...] = ()
    wd_exclude_patterns: Tuple[str, ...] = ()
    layer_decay: Optional[float] = None
    # per-tower overrides (reference --image/--text/--audio-layer-decay);
    # fall back to layer_decay when None
    image_layer_decay: Optional[float] = None
    text_layer_decay: Optional[float] = None
    audio_layer_decay: Optional[float] = None
    grad_clip_norm: Optional[float] = None
    # dtype of Adam's first moment (optax mu_dtype). bf16 halves the m-state HBM
    # footprint — the difference it makes to updates is below bf16 weight rounding;
    # lets ViT-H-scale AdamW fit a single 16G chip together with pure_bf16 params
    mu_dtype: Optional[str] = None


def get_default_params(model_name: str) -> Dict[str, float]:
    """Model-family default hparams (reference params.py:5-11)."""
    model_name = model_name.lower()
    if "vit" in model_name or "coca" in model_name or "siglip" in model_name:
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}


def wd_mask(params: Any, extra_names: Sequence[str] = (), patterns: Sequence[str] = ()) -> Any:
    """True where weight decay applies: >=2-D leaves not named in the exclusion set.

    Matches the reference policy: 1-D rule + no_weight_decay() names + glob patterns
    (optim.py:78-177). Stacked block leaves carry a leading layer axis, so the "1-D"
    rule here is on the per-layer shape (ndim considering the stack axis).
    """
    exclude = NO_WD_NAMES | set(extra_names)
    regexes = [re.compile(p.replace(".", r"\.").replace("*", ".*")) for p in patterns]

    def leaf_mask(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        name = names[-1] if names else ""
        dotted = ".".join(names)
        if name in exclude or any(n in exclude for n in names):
            return False
        if any(r.fullmatch(dotted) for r in regexes):
            return False
        in_blocks = "blocks" in names
        eff_ndim = leaf.ndim - (1 if in_blocks else 0)
        if eff_ndim <= 1:
            return False
        # scale/bias leaves of norms are (L, W) under stacking but logically 1-D
        if name in ("scale", "bias", "ls_1", "ls_2", "head_scale"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def layer_decay_scales(params: Any, decay: Optional[float],
                       num_layers: Optional[int] = None,
                       tower_decay: Optional[Dict[str, Optional[float]]] = None) -> Any:
    """Per-leaf LR scale for layer-wise LR decay (reference optim.py:247-334).

    Groups: embeddings (scale decay^(L+1)) < block i (decay^(L-i)) < head/proj (1.0).
    Each tower's ladder depth comes from its own stacked-blocks leading axis, so
    towers of different depths (ViT-L-14: 24 vision / 12 text layers) decay
    independently; ``tower_decay`` overrides the factor per top-level tower key
    (reference --image/--text/--audio-layer-decay; None/1.0 = that tower off).
    """

    def depth_of(sub):
        if isinstance(sub, dict) and isinstance(sub.get("blocks"), dict):
            leaves = jax.tree_util.tree_leaves(sub["blocks"])
            if leaves:
                return int(leaves[0].shape[0])
        return None

    depths = {k: depth_of(v) for k, v in params.items() if isinstance(v, dict)}

    def leaf_scale(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        tower = names[0] if names else ""
        d = (tower_decay or {}).get(tower, decay)
        depth = depths.get(tower) or num_layers
        if d is None or d >= 1.0 or not depth:
            return jnp.float32(1.0)
        if "blocks" in names:
            # per-layer scale vector broadcast over this stack's leading axis
            n = leaf.shape[0]
            scales = d ** (n - jnp.arange(n, dtype=jnp.float32))
            return scales.reshape([n] + [1] * (leaf.ndim - 1))
        name = names[-1] if names else ""
        if name in ("proj", "text_projection", "logit_scale", "logit_bias") or "ln_post" in names or "ln_final" in names:
            return jnp.float32(1.0)
        return jnp.float32(d ** (depth + 1))

    return jax.tree_util.tree_map_with_path(leaf_scale, params)


def create_optimizer(
    cfg: OptimizerCfg,
    params: Any,
    schedule: Callable,
    num_layers: Optional[int] = None,
) -> optax.GradientTransformation:
    mask = wd_mask(params, cfg.wd_exclude_names, cfg.wd_exclude_patterns)

    chain = []
    if cfg.grad_clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))

    opt_name = cfg.opt.lower().replace("timm/", "")
    if opt_name in ("adamw", "nadamw"):
        chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                                         mu_dtype=cfg.mu_dtype,
                                         nesterov=opt_name == "nadamw"))
    elif opt_name == "lion":
        chain.append(optax.scale_by_lion(b1=cfg.beta1, b2=cfg.beta2))
    elif opt_name in ("sgd", "momentum"):
        chain.append(optax.trace(decay=cfg.momentum, nesterov=True))
    elif opt_name == "lamb":
        chain.append(optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps))
        chain.append(optax.scale_by_trust_ratio())
    elif opt_name == "adafactor":
        chain.append(optax.scale_by_factored_rms())
    elif opt_name == "muon":
        chain.append(scale_by_muon(momentum=cfg.momentum))
    else:
        raise ValueError(f"unknown optimizer {cfg.opt!r}")

    if cfg.wd:
        chain.append(optax.add_decayed_weights(cfg.wd, mask=mask))

    tower_decay = {"visual": cfg.image_layer_decay if cfg.image_layer_decay is not None else cfg.layer_decay,
                   "text": cfg.text_layer_decay if cfg.text_layer_decay is not None else cfg.layer_decay,
                   "audio": cfg.audio_layer_decay if cfg.audio_layer_decay is not None else cfg.layer_decay}
    if any(d is not None and d < 1.0 for d in (cfg.layer_decay, *tower_decay.values())):
        scales = layer_decay_scales(params, cfg.layer_decay, num_layers, tower_decay=tower_decay)
        chain.append(
            optax.GradientTransformation(
                init=lambda _: optax.EmptyState(),
                update=lambda updates, state, params=None: (
                    jax.tree.map(lambda u, s: u * s, updates, scales),
                    state,
                ),
            )
        )

    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def trainable_mask(
    params: Any,
    lock_image: bool = False,
    lock_image_unlocked_groups: int = 0,
    lock_text: bool = False,
    lock_text_unlocked_layers: int = 0,
) -> Any:
    """Per-leaf trainability weights (1.0 trains, 0.0 frozen). Tower locking
    (reference lock_image_tower / lock_text_tower, main.py:315-326): group order is
    [embeddings, block_0..block_{L-1}, head]; ``unlocked_groups=k`` keeps the last k
    groups trainable (head first, then the last blocks). Scan-stacked block leaves get
    a per-layer (L, 1, ...) weight so individual layers unlock without leaf splitting.
    """
    HEAD_NAMES = {"proj", "text_projection", "ln_post", "ln_final", "attn_pool",
                  "attn_pool_contrastive", "map_pool", "attnpool", "head", "pool"}

    def leaf_mask(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if not names:
            return 1.0
        tower = names[0]
        locked = (tower == "visual" and lock_image) or (tower == "text" and lock_text)
        if not locked:
            return 1.0
        unlocked = lock_image_unlocked_groups if tower == "visual" else lock_text_unlocked_layers
        if unlocked > 0 and any(n in HEAD_NAMES for n in names[1:]):
            return 1.0
        if unlocked > 1 and "blocks" in names[1:]:
            # stacked leaf (L, ...): unlock the last (unlocked - 1) layers
            n_layers = leaf.shape[0]
            keep = jnp.arange(n_layers) >= n_layers - (unlocked - 1)
            return keep.astype(jnp.float32).reshape((n_layers,) + (1,) * (leaf.ndim - 1))
        return 0.0

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def apply_trainable_mask(optimizer: optax.GradientTransformation, mask: Any) -> optax.GradientTransformation:
    """Zero the updates of locked params (or locked layer slices of stacked leaves)
    after the optimizer chain."""
    zero = optax.GradientTransformation(
        init=lambda _: optax.EmptyState(),
        update=lambda updates, state, params=None: (
            jax.tree.map(lambda u, m: (u * jnp.asarray(m, u.dtype)), updates, mask),
            state,
        ),
    )
    return optax.chain(optimizer, zero)


def scale_by_muon(momentum: float = 0.95, ns_steps: int = 5, nesterov: bool = True):
    """Muon: momentum + Newton-Schulz orthogonalization of 2-D updates
    (the reference routes 'muon'-family names to external impls, optim.py:336-470;
    here it is native optax). Non-2D leaves (embeddings excluded by the caller's
    param-group policy; biases/norms) fall through with plain momentum.

    Matrix leaves with a leading stacked-layer axis are orthogonalized per layer
    (vmapped Newton-Schulz) — the scan-stacked block layout just works.
    """

    def newton_schulz(g):
        # quintic NS iteration from the Muon reference implementation
        a, b, c = 3.4445, -4.7750, 2.0315
        x = g.astype(jnp.bfloat16)
        transpose = x.shape[-2] > x.shape[-1]
        if transpose:
            x = x.swapaxes(-1, -2)
        x = x / (jnp.linalg.norm(x, axis=(-2, -1), keepdims=True) + 1e-7)
        for _ in range(ns_steps):
            xxt = x @ x.swapaxes(-1, -2)
            x = a * x + (b * xxt + c * (xxt @ xxt)) @ x
        if transpose:
            x = x.swapaxes(-1, -2)
        return x.astype(g.dtype)

    def init(params):
        return {"momentum": jax.tree.map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        buf = jax.tree.map(lambda m, g: momentum * m + g, state["momentum"], updates)
        eff = jax.tree.map(lambda m, g: momentum * m + g, buf, updates) if nesterov else buf

        def orth(u):
            if u.ndim == 2:
                out = newton_schulz(u)
            elif u.ndim == 3:  # stacked blocks (L, in, out): per-layer NS
                out = jax.vmap(newton_schulz)(u)
            else:
                return u
            # match update RMS to adam-style magnitudes (Muon convention)
            scale_adj = jnp.sqrt(jnp.maximum(u.shape[-2], u.shape[-1]).astype(jnp.float32)) * 0.2
            return out * scale_adj

        return jax.tree.map(orth, eff), {"momentum": buf}

    return optax.GradientTransformation(init, update)
