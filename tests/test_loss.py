"""Loss tests: dense math vs torch semantics, and distributed == dense on an 8-device
CPU mesh via shard_map (stronger than the reference's mocked-collective tests,
reference tests/test_loss.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from open_clip_tpu.loss import (
    ClipLoss,
    SigLipLoss,
    caption_cross_entropy,
    clip_loss,
    siglip_loss,
    siglip_loss_chunked,
)


def _feats(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def _dense_clip_loss_np(imf, txf, scale):
    logits = scale * imf @ txf.T
    def ce(l):
        l = l - l.max(-1, keepdims=True)
        logp = l - np.log(np.exp(l).sum(-1, keepdims=True))
        return -logp[np.arange(len(l)), np.arange(len(l))].mean()
    return 0.5 * (ce(logits) + ce(logits.T))


def test_clip_loss_dense_matches_numpy(rng):
    imf, txf = _feats(rng, 16, 32), _feats(rng, 16, 32)
    scale = np.float32(50.0)
    ours = clip_loss(jnp.asarray(imf), jnp.asarray(txf), jnp.asarray(scale))
    np.testing.assert_allclose(float(ours), _dense_clip_loss_np(imf, txf, scale), rtol=1e-5)


def test_clip_loss_distributed_matches_dense(rng, mesh):
    n, d = 32, 16
    imf, txf = _feats(rng, n, d), _feats(rng, n, d)
    scale = jnp.float32(30.0)
    dense = float(clip_loss(jnp.asarray(imf), jnp.asarray(txf), scale))

    for local_loss in (True, False):
        fn = shard_map(
            functools.partial(
                lambda i, t: jax.lax.pmean(
                    clip_loss(i, t, scale, axis_name="data", local_loss=local_loss), "data"
                )
            ),
            mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=P(),
        )
        dist = float(fn(jnp.asarray(imf), jnp.asarray(txf)))
        np.testing.assert_allclose(dist, dense, rtol=1e-5, err_msg=f"local_loss={local_loss}")


def test_clip_loss_distributed_grads_match_dense(rng, mesh):
    """gather_with_grad semantics: gradients must flow through gathered negatives."""
    n, d = 16, 8
    imf, txf = _feats(rng, n, d), _feats(rng, n, d)
    scale = jnp.float32(10.0)

    dense_grad = jax.grad(lambda i: clip_loss(i, jnp.asarray(txf), scale))(jnp.asarray(imf))

    def dist_loss(i, t):
        f = shard_map(
            lambda a, b: jax.lax.pmean(clip_loss(a, b, scale, axis_name="data"), "data"),
            mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
        )
        return f(i, t)

    dist_grad = jax.grad(dist_loss)(jnp.asarray(imf), jnp.asarray(txf))
    np.testing.assert_allclose(np.asarray(dist_grad), np.asarray(dense_grad), atol=1e-6)


def _dense_siglip_np(imf, txf, scale, bias):
    logits = scale * imf @ txf.T + bias
    z = -np.ones_like(logits)
    np.fill_diagonal(z, 1.0)
    return -np.log1p(np.exp(-z * logits)).__neg__().sum() / len(imf)


def test_siglip_dense_matches_numpy(rng):
    imf, txf = _feats(rng, 8, 16), _feats(rng, 8, 16)
    scale, bias = np.float32(10.0), np.float32(-10.0)
    ours = float(siglip_loss(jnp.asarray(imf), jnp.asarray(txf), jnp.asarray(scale), jnp.asarray(bias)))
    logits = scale * imf @ txf.T + bias
    z = -np.ones_like(logits)
    np.fill_diagonal(z, 1.0)
    expected = -(-np.logaddexp(0, -z * logits)).sum() / len(imf)
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


@pytest.mark.parametrize("dist_impl", ["bidir", "shift", "gather", "reduce"])
def test_siglip_distributed_matches_global(rng, mesh, dist_impl):
    """Each rank's loss covers its image rows against ALL texts; pmean*world == global."""
    n, d = 32, 16
    imf, txf = _feats(rng, n, d), _feats(rng, n, d)
    scale, bias = jnp.float32(10.0), jnp.float32(-10.0)

    # global sigmoid loss normalized by global batch
    global_loss = float(siglip_loss(jnp.asarray(imf), jnp.asarray(txf), scale, bias))

    fn = shard_map(
        lambda i, t: jax.lax.pmean(
            siglip_loss(i, t, scale, bias, axis_name="data", dist_impl=dist_impl), "data"
        ),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
    )
    # per-rank losses are normalized by LOCAL batch; pmean gives global_sum/global_batch
    dist = float(fn(jnp.asarray(imf), jnp.asarray(txf)))
    np.testing.assert_allclose(dist, global_loss, rtol=1e-5)


def test_siglip_chunked_matches_dense(rng):
    imf, txf = _feats(rng, 8, 16), _feats(rng, 24, 16)
    scale, bias = jnp.float32(10.0), jnp.float32(-10.0)
    chunked = float(
        siglip_loss_chunked(jnp.asarray(imf), jnp.asarray(txf), scale, bias, diag_offset=8, chunk_size=7)
    )
    logits = 10.0 * imf @ txf.T - 10.0
    z = -np.ones_like(logits)
    z[np.arange(8), np.arange(8) + 8] = 1.0
    expected = float(np.logaddexp(0, -z * logits).sum() / 8)
    np.testing.assert_allclose(chunked, expected, rtol=1e-5)


def test_siglip_chunked_grad_matches_dense(rng):
    imf, txf = _feats(rng, 8, 16), _feats(rng, 16, 16)
    scale, bias = jnp.float32(5.0), jnp.float32(-2.0)

    def dense(i):
        logits = scale * i @ jnp.asarray(txf).T + bias
        z = -jnp.ones_like(logits)
        z = z.at[jnp.arange(8), jnp.arange(8)].set(1.0)
        return -jax.nn.log_sigmoid(z * logits).sum() / 8

    g_dense = jax.grad(dense)(jnp.asarray(imf))
    g_chunk = jax.grad(
        lambda i: siglip_loss_chunked(i, jnp.asarray(txf), scale, bias, chunk_size=5)
    )(jnp.asarray(imf))
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_dense), atol=1e-6)


def test_caption_ce_ignores_pad():
    logits = jnp.zeros((2, 3, 5))
    labels = jnp.array([[1, 2, 0], [3, 0, 0]])
    loss = float(caption_cross_entropy(logits, labels, pad_id=0))
    np.testing.assert_allclose(loss, np.log(5), rtol=1e-6)


def test_loss_class_facades(rng):
    imf, txf = _feats(rng, 8, 16), _feats(rng, 8, 16)
    out = ClipLoss()(jnp.asarray(imf), jnp.asarray(txf), jnp.float32(10.0), output_dict=True)
    assert "contrastive_loss" in out
    out2 = SigLipLoss()(jnp.asarray(imf), jnp.asarray(txf), jnp.float32(10.0), jnp.float32(-10.0), output_dict=True)
    assert float(out2["contrastive_loss"]) > 0


def test_fused_linear_ce_matches_dense(rng):
    from open_clip_tpu.ops.fused_ce import fused_linear_cross_entropy

    n, d, v = 37, 16, 50
    hidden = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((v, d)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(v).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, v, size=n))
    labels = labels.at[::5].set(-100)  # some ignored

    fused = fused_linear_cross_entropy(hidden, weight, labels, bias, chunk_size=8)

    logits = hidden @ weight.T + bias
    logp = jax.nn.log_softmax(logits, -1)
    mask = labels != -100
    safe = jnp.where(mask, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[:, None], 1)[:, 0]
    dense = (nll * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(fused), float(dense), rtol=1e-6)

    # gradient parity through the chunked/remat path
    g_fused = jax.grad(lambda h, w: fused_linear_cross_entropy(h, w, labels, bias, chunk_size=8), argnums=(0, 1))(hidden, weight)
    def dense_loss(h, w):
        lg = h @ w.T + bias
        lp = jax.nn.log_softmax(lg, -1)
        nl = -jnp.take_along_axis(lp, safe[:, None], 1)[:, 0]
        return (nl * mask).sum() / mask.sum()
    g_dense = jax.grad(dense_loss, argnums=(0, 1))(hidden, weight)
    for a, b in zip(g_fused, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
