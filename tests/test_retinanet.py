"""RetinaNet model forward/loss/postprocess tests (SURVEY.md §4.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.config import load_config
from mxdetection_tpu.models.detectors.retinanet import (
    RetinaNet, make_anchors, retinanet_loss, retinanet_postprocess,
)

HW = (128, 128)  # tiny static shape for tests


@pytest.fixture(scope="module")
def cfg():
    return load_config("configs/retinanet_r50_fpn_1x.py")


@pytest.fixture(scope="module")
def model_and_vars(cfg):
    model = RetinaNet(cfg, train=True)
    images = jnp.zeros((1, *HW, 3))
    variables = model.init(jax.random.PRNGKey(0), images)
    return model, variables


def test_forward_shapes(cfg, model_and_vars):
    model, variables = model_and_vars
    images = jnp.zeros((2, *HW, 3))
    out = model.apply(variables, images)
    # levels P3..P7 -> strides 8..128
    assert len(out["cls"]) == 5
    a, c = 9, cfg.retina_head.num_classes
    for lv, s in enumerate([8, 16, 32, 64, 128]):
        h = -(-HW[0] // s)
        w = -(-HW[1] // s)
        assert out["cls"][lv].shape == (2, h, w, a * c)
        assert out["reg"][lv].shape == (2, h, w, a * 4)


def test_anchor_count_matches_flattened_preds(cfg, model_and_vars):
    model, variables = model_and_vars
    out = model.apply(variables, jnp.zeros((1, *HW, 3)))
    anchors = make_anchors(cfg, HW)
    total = sum(int(np.prod(o.shape[1:3])) * 9 for o in out["cls"])
    assert anchors.shape == (total, 4)


def test_loss_finite_and_grads_flow(cfg, model_and_vars):
    model, variables = model_and_vars
    images = jnp.ones((1, *HW, 3))
    anchors = make_anchors(cfg, HW)
    gt_boxes = jnp.asarray([[[10.0, 10, 60, 60], [0, 0, 0, 0]]])
    gt_labels = jnp.asarray([[3, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, False]])

    def loss_fn(params):
        out = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, images)
        loss, metrics = retinanet_loss(
            out, anchors, gt_boxes, gt_labels, gt_valid, jax.random.PRNGKey(0), cfg)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # head + fpn + unfrozen backbone stages get nonzero grads
    head_g = jax.tree.leaves(grads["head"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in head_g)
    fpn_g = jax.tree.leaves(grads["fpn"])
    assert any(float(jnp.abs(g).sum()) > 0 for g in fpn_g)
    # frozen stage (layer1) must receive zero grads
    l1 = [v for k, v in grads["backbone"].items() if k.startswith("layer1")]
    assert all(float(jnp.abs(g).sum()) == 0 for g in jax.tree.leaves(l1))
    l4 = [v for k, v in grads["backbone"].items() if k.startswith("layer4")]
    assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(l4))


def test_prior_prob_bias_init(cfg, model_and_vars):
    """Zero input -> all-zero features (conv has no bias in backbone, and the
    head sees zeros through its no-input-dependence path) -> cls logits equal
    the prior-prob bias, so sigmoid(logit) == 0.01 everywhere."""
    model, variables = model_and_vars
    out = model.apply(variables, jnp.zeros((1, *HW, 3)))
    probs = jax.nn.sigmoid(np.asarray(out["cls"][0], np.float32))
    np.testing.assert_allclose(probs, 0.01, atol=2e-3)


def test_postprocess_shapes(cfg, model_and_vars):
    model, variables = model_and_vars
    images = jnp.ones((1, *HW, 3))
    out = model.apply(variables, images)
    im_info = jnp.asarray([[128.0, 128.0, 1.0]])
    dets = retinanet_postprocess(out, cfg, HW, im_info)
    m = cfg.test.max_per_image
    assert dets["boxes"].shape == (1, m, 4)
    assert dets["scores"].shape == (1, m)
    assert dets["labels"].shape == (1, m)
    assert dets["valid"].shape == (1, m)
    b = np.asarray(dets["boxes"])
    assert (b >= 0).all() and (b <= 128).all()
