"""Layer-wise LR decay: per-tower ladders on stacked-blocks trees
(reference optim.py:247-334 layer_groups + param_groups_layer_decay)."""

import numpy as np
import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models.clip import init_clip
from open_clip_tpu.train.optim import OptimizerCfg, create_optimizer, layer_decay_scales
from open_clip_tpu.train.scheduler import const_lr

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.quick

UNEQ = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 3, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
}


@pytest.fixture(scope="module")
def params():
    if "tiny-llrd-vit" not in oct.list_models():
        oct.add_model_config(dict(UNEQ), name="tiny-llrd-vit")
    cfg = parse_model_cfg("tiny-llrd-vit")
    return init_clip(jax.random.PRNGKey(0), cfg)


def test_per_tower_ladders_with_unequal_depths(params):
    d = 0.5
    scales = layer_decay_scales(params, d)
    # vision: 3 layers -> block ladder d^3, d^2, d^1 along the stack axis
    vb = jax.tree_util.tree_leaves(scales["visual"]["blocks"])[0]
    np.testing.assert_allclose(np.asarray(vb).reshape(3), [d ** 3, d ** 2, d ** 1])
    # text: 2 layers -> its OWN ladder depth, not the vision one
    tb = jax.tree_util.tree_leaves(scales["text"]["blocks"])[0]
    np.testing.assert_allclose(np.asarray(tb).reshape(2), [d ** 2, d ** 1])
    # embeddings scale d^(L+1) per tower; heads/projections 1.0
    assert float(scales["visual"]["patch_embed"]["kernel"]) == pytest.approx(d ** 4)
    assert float(scales["text"]["token_embedding"]) == pytest.approx(d ** 3)
    assert float(scales["visual"]["proj"]) == 1.0
    assert float(scales["text"]["text_projection"]) == 1.0
    assert float(scales["logit_scale"]) == 1.0


def test_tower_decay_overrides(params):
    scales = layer_decay_scales(params, None,
                                tower_decay={"visual": 0.5, "text": None, "audio": None})
    vb = jax.tree_util.tree_leaves(scales["visual"]["blocks"])[0]
    assert float(np.asarray(vb).reshape(3)[0]) == pytest.approx(0.5 ** 3)
    # text tower off -> every text leaf at scale 1.0
    for leaf in jax.tree_util.tree_leaves(scales["text"]):
        assert float(leaf) == 1.0


def test_create_optimizer_unequal_depths_runs(params):
    """Regression: LLRD with text depth != vision depth must not crash at
    create_optimizer (the old code reshaped a vision-sized ladder onto every
    blocks stack) and the update must apply the per-tower scales."""
    opt = create_optimizer(
        OptimizerCfg(opt="sgd", lr=1.0, wd=0.0, layer_decay=0.5, momentum=0.0),
        params, const_lr(1.0, 0))
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    vb = jax.tree_util.tree_leaves(updates["visual"]["blocks"])[0]
    tb = jax.tree_util.tree_leaves(updates["text"]["blocks"])[0]
    # sgd(momentum 0, lr 1) -> update == -scale * grad (trace with decay=0)
    assert np.allclose(np.abs(np.asarray(vb))[..., 0].reshape(3).max(), 0.5 ** 1)
    assert np.allclose(np.abs(np.asarray(tb))[..., 0].reshape(2).max(), 0.5 ** 1)
