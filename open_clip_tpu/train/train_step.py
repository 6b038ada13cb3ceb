"""Pure functional train steps under jit + mesh sharding.

TPU-native replacement for the reference's task/train-loop machinery
(``src/open_clip/task/*`` + ``src/open_clip_train/train.py:163-335``): instead of
DDP wrappers, GradScaler, and compiled closures, a single pure function

    train_step(state, batch, rng) -> (state, metrics)

jitted with sharding annotations. The towers run under plain jit (XLA SPMD handles
fsdp gathers); the contrastive loss runs inside ``shard_map`` over the mesh data axis
so the all-gather/local-loss semantics (reference loss.py:91-141) are explicit.

Gradient accumulation implements the GradCache construction: phase 1 computes all
microbatch features without gradients and a single loss backward w.r.t. features;
phase 2 re-runs each microbatch forward as a VJP with the cached feature cotangents.
This yields the exact full-batch gradient (same semantics the reference approximates
with its cached-feature two-pass accum, train.py:236-311) at one loss backward.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CLIPModelCfg
from ..loss import clip_loss, siglip_loss
from ..models.clip import LOGIT_SCALE_MAX, clip_forward
from ..parallel.mesh import DATA_AXIS


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def create_train_state(params: Any, optimizer: optax.GradientTransformation, ema: bool = False) -> TrainState:
    # copy so donated jitted steps can't invalidate the caller's param buffers
    params = jax.tree.map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
    )


def _merge_bn_stats(params, stats, momentum: float = 0.1):
    """Fold batch-stat contributions into the running mean/var leaves (torch BN
    momentum semantics: new = (1-m)*running + m*batch)."""

    def rec(p, st):
        out = dict(p)
        for k, v in st.items():
            if isinstance(v, dict) and set(v) == {"mean", "var"} and isinstance(p.get(k), dict) \
                    and "mean" in p[k]:
                out[k] = dict(p[k])
                out[k]["mean"] = (1 - momentum) * p[k]["mean"] + momentum * v["mean"].astype(p[k]["mean"].dtype)
                out[k]["var"] = (1 - momentum) * p[k]["var"] + momentum * v["var"].astype(p[k]["var"].dtype)
            else:
                out[k] = rec(p[k], v)
        return out

    return rec(params, stats)


def _features(params, cfg: CLIPModelCfg, batch, rng, *, compute_dtype, remat,
              stats_sink=None, train=True, bn_eval=False):
    if "audio" in batch:
        # CLAP: audio features take the image slot for the contrastive loss
        # (reference clap_task.py maps audio_features -> image_features)
        out = clip_forward(
            params, cfg, batch["audio"], batch.get("text"),
            train=train, rng=rng, compute_dtype=compute_dtype, remat=remat,
        )
        return out["audio_features"], out["text_features"]
    out = clip_forward(
        params, cfg, batch.get("image"), batch.get("text"),
        train=train, rng=rng, compute_dtype=compute_dtype, remat=remat,
        stats_sink=stats_sink, bn_eval=bn_eval,
        # CoCa: skip the (B, L, V) vocab projection — features only
        return_hidden=cfg.multimodal_cfg is not None,
    )
    return out["image_features"], out["text_features"]


def _make_loss_fn(cfg, mesh: Optional[Mesh], loss_type: str, local_loss: bool, dist_impl: str):
    """(imf, txf, scale, bias) -> scalar loss; distributed via shard_map when mesh given."""

    def core(imf, txf, scale, bias, axis_name):
        if loss_type == "siglip":
            return siglip_loss(imf, txf, scale, bias, axis_name=axis_name, dist_impl=dist_impl)
        return clip_loss(imf, txf, scale, axis_name=axis_name, local_loss=local_loss)

    if mesh is None or mesh.shape.get(DATA_AXIS, 1) <= 1:
        return lambda imf, txf, scale, bias: core(imf, txf, scale, bias, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
        out_specs=P(),
    )
    def sharded(imf, txf, scale, bias):
        return lax.pmean(core(imf, txf, scale, bias, DATA_AXIS), DATA_AXIS)

    def fn(imf, txf, scale, bias):
        if bias is None:
            bias = jnp.zeros((), jnp.float32)  # shard_map needs a concrete arg
        return sharded(imf, txf, scale, bias)

    return fn


def make_train_step(
    cfg: CLIPModelCfg,
    optimizer: optax.GradientTransformation,
    *,
    loss_type: str = "clip",
    mesh: Optional[Mesh] = None,
    compute_dtype=jnp.bfloat16,
    remat: bool = False,
    local_loss: bool = True,
    dist_impl: str = "bidir",
    accum_steps: int = 1,
    ema_decay: Optional[float] = None,
    naflex_loss_scale: str = "none",
    reference_batch_size: Optional[int] = None,
    freeze_bn_stats: bool = False,
    clamp_scale: float = LOGIT_SCALE_MAX,
    caption_loss_weight: float = 2.0,
    clip_loss_weight: float = 1.0,
    teacher: Optional[Tuple[CLIPModelCfg, Any]] = None,
    device_preprocess: Optional[Callable] = None,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the (un-jitted) train step; jit it with sharding annotations at the call
    site (see ``jit_train_step``).

    ``device_preprocess``: optional jittable ``(rng, uint8 images) -> float images``
    fused into the step (the BASELINE north-star path: uint8 H2D, on-device
    RandomResizedCrop + normalize ahead of the patchify matmul).
    """
    loss_fn = _make_loss_fn(cfg, mesh, loss_type, local_loss, dist_impl)

    def _maybe_device_pp(batch, rng):
        if device_preprocess is None or "image" not in batch:
            return batch
        batch = dict(batch)
        batch["image"] = device_preprocess(rng, batch["image"])
        return batch
    # CoCa accumulation: contrastive term via cached features (GradCache), caption
    # term accumulated per microbatch (the reference's accum path rebuilds labels per
    # microbatch and divides by accum_steps — coca_task.py:55-73; same semantics here)

    def full_loss(params, batch, rng):
        if loss_type in ("genlip", "genlap"):
            # the model computes its own fused AR loss (reference genlip_task.py fused path)
            if loss_type == "genlip":
                from ..models.genlip import genlip_forward as gen_fwd

                out = gen_fwd(params, cfg, batch["image"], batch["text"], compute_loss=True,
                              compute_dtype=compute_dtype, remat=remat, train=True, rng=rng)
            else:
                from ..models.genlap import genlap_forward as gen_fwd

                out = gen_fwd(params, cfg, batch["audio"], batch["text"], compute_loss=True,
                              compute_dtype=compute_dtype, remat=remat, train=True, rng=rng)
            return out["loss"], {}
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        bias = params.get("logit_bias")
        if bias is not None:
            bias = bias.astype(jnp.float32)
        if loss_type == "coca":
            out = clip_forward(
                params, cfg, batch.get("image"), batch.get("text"),
                train=True, rng=rng, compute_dtype=compute_dtype, remat=remat,
                return_hidden=True,
            )
            closs = loss_fn(out["image_features"], out["text_features"], scale, bias)
            # AR shift: positions :-1 predict text[:, 1:] (reference coca_task.py:45-53).
            # The vocab projection runs fused with the CE (ops/fused_ce.py) so the
            # (B, L, V) logit tensor never materializes — at batch 512 x vocab 49408
            # full logits alone are 3.5G bf16 + 7G fp32 softmax, an instant v5e OOM.
            from ..ops.fused_ce import fused_linear_cross_entropy

            pad_id = cfg.text_cfg.pad_id if cfg.text_cfg else 0
            hid = out["hidden"][:, :-1]
            tgt = batch["text"][:, 1:]
            labels = jnp.where(tgt == pad_id, -100, tgt).reshape(-1)
            cap = fused_linear_cross_entropy(
                hid.reshape(-1, hid.shape[-1]),
                params["text_decoder"]["text_projection"].T,
                labels,
            )
            loss = clip_loss_weight * closs + caption_loss_weight * cap
            return loss, {"contrastive_loss": closs, "caption_loss": cap}
        sink = {} if (cfg.vision_cfg is not None and cfg.vision_cfg.is_resnet
                      and not freeze_bn_stats) else None
        imf, txf = _features(params, cfg, batch, rng, compute_dtype=compute_dtype, remat=remat,
                             bn_eval=freeze_bn_stats,
                             stats_sink=sink)
        loss = loss_fn(imf, txf, scale, bias)
        if naflex_loss_scale != "none" and isinstance(batch.get("image"), dict):
            # token-budget NaFlex buckets have varying (static per compile) batch
            # sizes; rescale so small buckets don't dominate (reference
            # train.py:319-335). Shape-derived, so it folds into the trace.
            assert reference_batch_size, "naflex loss scaling needs the reference batch size"
            ratio = imf.shape[0] / reference_batch_size
            loss = loss * (ratio if naflex_loss_scale == "linear" else ratio ** 0.5)
        if loss_type == "distill":
            # frozen teacher features; KL on both logit directions
            # (reference DistillClipLoss, loss.py:187-223 / distill_task.py)
            tcfg, tparams = teacher
            # eval-mode teacher: deterministic features, no dropout/patch-dropout/
            # batch-stat BN (reference main.py calls dist_model.eval())
            t_imf, t_txf = _features(
                lax.stop_gradient(tparams), tcfg, batch, None,
                compute_dtype=compute_dtype, remat=remat, train=False,
            )
            t_imf = lax.stop_gradient(t_imf.astype(jnp.float32))
            t_txf = lax.stop_gradient(t_txf.astype(jnp.float32))
            t_scale = lax.stop_gradient(jnp.exp(tparams["logit_scale"].astype(jnp.float32)))

            def kl(tl, sl):
                tp = jax.nn.softmax(tl, axis=-1)
                return -(tp * jax.nn.log_softmax(sl, axis=-1)).sum(-1).mean()

            s_i = scale * imf.astype(jnp.float32) @ txf.astype(jnp.float32).T
            t_i = t_scale * t_imf @ t_txf.T
            dloss = 0.5 * (kl(t_i, s_i) + kl(t_i.T, s_i.T))
            aux = {"contrastive_loss": loss, "distill_loss": dloss}
            if sink:
                aux["_bn_stats"] = sink
            return loss + dloss, aux
        return loss, ({"_bn_stats": sink} if sink else {})

    def simple_step(state: TrainState, batch, rng):
        rng, pp_rng = jax.random.split(rng)
        batch = _maybe_device_pp(batch, pp_rng)
        (loss, aux), grads = jax.value_and_grad(full_loss, has_aux=True)(state.params, batch, rng)
        new_state, metrics = _apply_updates(state, grads, loss)
        bn = aux.get("_bn_stats") if isinstance(aux, dict) else None
        if bn:
            # train-mode BN: fold this batch's stats into the (non-learned) running
            # mean/var leaves after the optimizer update
            new_state = new_state._replace(params=_merge_bn_stats(new_state.params, {"visual": bn}))
        return new_state, metrics

    def accum_step(state: TrainState, batch, rng):
        """GradCache exact accumulation over the leading microbatch axis of ``batch``."""
        rng, pp_rng = jax.random.split(rng)
        batch = _maybe_device_pp(batch, pp_rng)
        params = state.params
        mb_batches = jax.tree.map(
            lambda x: x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:]), batch
        )
        rngs = jax.random.split(rng, accum_steps)

        # phase 1: features without grads
        def fwd(carry, inp):
            mb, r = inp
            imf, txf = _features(params, cfg, mb, r, compute_dtype=compute_dtype, remat=remat,
                                 bn_eval=freeze_bn_stats)
            return carry, (imf, txf)

        _, (imfs, txfs) = lax.scan(fwd, None, (mb_batches, rngs))
        all_imf = lax.stop_gradient(imfs.reshape(-1, imfs.shape[-1]))
        all_txf = lax.stop_gradient(txfs.reshape(-1, txfs.shape[-1]))

        # distillation composes with GradCache exactly: the KL term is a function
        # of the cached full-batch features only, so it joins the loss part and
        # its gradient rides the same cotangents (teacher frozen + eval mode)
        t_imf = t_txf = t_scale = None
        if loss_type == "distill":
            tcfg, tparams = teacher

            def tfwd(carry, mb):
                ti, tt = _features(lax.stop_gradient(tparams), tcfg, mb, None,
                                   compute_dtype=compute_dtype, remat=remat, train=False)
                return carry, (ti.astype(jnp.float32), tt.astype(jnp.float32))

            _, (timfs, ttxfs) = lax.scan(tfwd, None, mb_batches)
            t_imf = lax.stop_gradient(timfs.reshape(-1, timfs.shape[-1]))
            t_txf = lax.stop_gradient(ttxfs.reshape(-1, ttxfs.shape[-1]))
            t_scale = lax.stop_gradient(jnp.exp(tparams["logit_scale"].astype(jnp.float32)))

        # NaFlex token-budget scaling folds into the loss part so the cached
        # cotangents carry it too (same semantics as full_loss)
        loss_ratio = 1.0
        if naflex_loss_scale != "none" and isinstance(batch.get("image"), dict):
            assert reference_batch_size, "naflex loss scaling needs the reference batch size"
            r = all_imf.shape[0] / reference_batch_size
            loss_ratio = r if naflex_loss_scale == "linear" else r ** 0.5

        def loss_of_feats(imf, txf, ls, lb):
            scale = jnp.exp(ls.astype(jnp.float32))
            bias = lb.astype(jnp.float32) if lb is not None else None
            loss = loss_fn(imf, txf, scale, bias)
            if loss_type == "distill":
                def kl(tl, sl):
                    tp = jax.nn.softmax(tl, axis=-1)
                    return -(tp * jax.nn.log_softmax(sl, axis=-1)).sum(-1).mean()

                s_i = scale * imf.astype(jnp.float32) @ txf.astype(jnp.float32).T
                t_i = t_scale * t_imf @ t_txf.T
                loss = loss + 0.5 * (kl(t_i, s_i) + kl(t_i.T, s_i.T))
            return loss * loss_ratio

        lb = params.get("logit_bias")
        grad_args = (0, 1, 2, 3) if lb is not None else (0, 1, 2)
        gout = jax.value_and_grad(loss_of_feats, argnums=grad_args)(
            all_imf, all_txf, params["logit_scale"], lb
        )
        if lb is not None:
            loss, (d_imf, d_txf, d_ls, d_lb) = gout
        else:
            loss, (d_imf, d_txf, d_ls) = gout
            d_lb = None

        mb_size = all_imf.shape[0] // accum_steps
        d_imfs = d_imf.reshape(accum_steps, mb_size, -1)
        d_txfs = d_txf.reshape(accum_steps, mb_size, -1)

        # phase 2: per-microbatch VJP with cached cotangents
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        contrastive_w = clip_loss_weight if loss_type == "coca" else 1.0

        def bwd(acc, inp):
            mb, r, di, dt = inp
            acc_g, acc_cap = acc
            _, vjp = jax.vjp(
                lambda p: _features(p, cfg, mb, r, compute_dtype=compute_dtype, remat=remat,
                                    bn_eval=freeze_bn_stats), params
            )
            (g,) = vjp((
                (contrastive_w * di).astype(compute_dtype),
                (contrastive_w * dt).astype(compute_dtype),
            ))
            cap = jnp.float32(0.0)
            if loss_type == "coca":
                from ..ops.fused_ce import fused_linear_cross_entropy

                pad_id = cfg.text_cfg.pad_id if cfg.text_cfg else 0

                def cap_loss(p):
                    out = clip_forward(
                        p, cfg, mb.get("image"), mb.get("text"), train=True, rng=r,
                        compute_dtype=compute_dtype, remat=remat, return_hidden=True)
                    hid = out["hidden"][:, :-1]
                    tgt = mb["text"][:, 1:]
                    labels = jnp.where(tgt == pad_id, -100, tgt).reshape(-1)
                    c = fused_linear_cross_entropy(
                        hid.reshape(-1, hid.shape[-1]),
                        p["text_decoder"]["text_projection"].T, labels)
                    return caption_loss_weight * c / accum_steps, c

                (wcap, cap), cg = jax.value_and_grad(cap_loss, has_aux=True)(params)
                g = jax.tree.map(jnp.add, g, cg)
            return (jax.tree.map(jnp.add, acc_g, g), acc_cap + cap), None

        (grads, cap_sum), _ = lax.scan(
            bwd, (zero_grads, jnp.float32(0.0)), (mb_batches, rngs, d_imfs, d_txfs))
        grads["logit_scale"] = grads["logit_scale"] + contrastive_w * d_ls
        if d_lb is not None:
            grads["logit_bias"] = grads["logit_bias"] + contrastive_w * d_lb
        if loss_type == "coca":
            loss = clip_loss_weight * loss + caption_loss_weight * cap_sum / accum_steps
        return _apply_updates(state, grads, loss)

    def _apply_updates(state: TrainState, grads, loss):
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # temperature clamp (reference base_task clamp_logit_scale / train.py:213-218)
        if "logit_scale" in new_params:
            new_params["logit_scale"] = jnp.minimum(new_params["logit_scale"], clamp_scale)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d), state.ema_params, new_params)

        metrics = {
            "loss": loss,
            "logit_scale": jnp.exp(new_params["logit_scale"].astype(jnp.float32))
            if "logit_scale" in new_params else jnp.float32(0.0),
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(state.step + 1, new_params, new_opt, new_ema), metrics

    def gen_accum_step(state: TrainState, batch, rng):
        """Accumulation for GenLIP/GenLAP: the fused AR caption CE decomposes over
        samples (no cross-sample negatives), so plain grad averaging over microbatches
        is exact — no GradCache pass needed (reference genlip_task.py accum path)."""
        rng, pp_rng = jax.random.split(rng)
        batch = _maybe_device_pp(batch, pp_rng)
        params = state.params
        mb_batches = jax.tree.map(
            lambda x: x.reshape(accum_steps, x.shape[0] // accum_steps, *x.shape[1:]), batch
        )
        rngs = jax.random.split(rng, accum_steps)
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def body(acc, inp):
            mb, r = inp
            acc_g, acc_l = acc
            (l, _), g = jax.value_and_grad(full_loss, has_aux=True)(params, mb, r)
            return (jax.tree.map(jnp.add, acc_g, g), acc_l + l), None

        (grads, loss_sum), _ = lax.scan(body, (zero_grads, jnp.float32(0.0)), (mb_batches, rngs))
        inv = 1.0 / accum_steps
        grads = jax.tree.map(lambda g: g * inv, grads)
        new_state, metrics = _apply_updates(state, grads, loss_sum * inv)
        return new_state, metrics

    if accum_steps > 1 and getattr(getattr(cfg, "vision_cfg", None), "is_resnet", False):
        import logging

        logging.getLogger(__name__).warning(
            "grad accumulation with a ResNet tower: BN running stats are not updated "
            "under the GradCache path; they stay at their initial/loaded values")
    if accum_steps > 1:
        return gen_accum_step if loss_type in ("genlip", "genlap") else accum_step
    return simple_step


def jit_train_step(
    step_fn: Callable,
    mesh: Optional[Mesh] = None,
    param_shardings: Any = None,
):
    """Jit with donated state and explicit batch sharding over the data axis."""
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def wrapped(state, batch, rng):
        batch = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sh), batch)
        return step_fn(state, batch, rng)

    return jax.jit(wrapped, donate_argnums=(0,))


def eval_forward(params, cfg: CLIPModelCfg, batch, *, compute_dtype=jnp.bfloat16):
    """Features + logit scale for validation (no dropout/patch-dropout)."""
    out = clip_forward(
        params, cfg, batch.get("image"), batch.get("text"),
        train=False, compute_dtype=compute_dtype,
    )
    return out
