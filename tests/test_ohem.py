"""OHEM tests: hardest-k selection golden + backward sparsity through
rcnn_loss (reference: BoxAnnotatorOHEM custom op — forward computes per-roi
loss, backward flows only through the hardest N; SURVEY.md §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp

from mxdetection_tpu.losses import ohem_select
from mxdetection_tpu.config import load_config

from test_rcnn import shrink, make_tb


def test_ohem_select_matches_numpy_golden():
    rng = np.random.RandomState(0)
    loss = rng.rand(64).astype(np.float32)
    valid = rng.rand(64) < 0.7
    keep = 10

    got = np.asarray(ohem_select(jnp.asarray(loss), jnp.asarray(valid), keep))

    # golden: the `keep` highest-loss valid entries
    masked = np.where(valid, loss, -np.inf)
    order = np.argsort(-masked, kind="stable")
    want = np.zeros(64, bool)
    want[order[:keep]] = True
    want &= valid
    np.testing.assert_array_equal(got, want)
    assert got.sum() == min(keep, valid.sum())


def test_ohem_select_fewer_valid_than_keep():
    loss = jnp.asarray([3.0, 1.0, 2.0, 5.0])
    valid = jnp.asarray([True, False, True, False])
    got = np.asarray(ohem_select(loss, valid, keep=3))
    np.testing.assert_array_equal(got, [True, False, True, False])


def test_ohem_backward_sparsity_through_rcnn_loss():
    """With ohem enabled, cls-logit grads are nonzero for at most ohem_keep
    rois; without, (almost) every sampled roi carries gradient."""
    from mxdetection_tpu.models.registry import build_detector

    keep = 6
    base = shrink(load_config("configs/faster_rcnn_r50_fpn_1x.py"))
    cfg = base.override(**{"bbox_head.ohem": True, "bbox_head.ohem_keep": keep})
    bundle = build_detector(cfg)
    tb = make_tb()
    variables = bundle.init(jax.random.PRNGKey(0), tb)
    rng = jax.random.PRNGKey(1)
    out, _ = bundle.apply_train(variables, tb, rng)
    st = dict(out["stages"][0])

    def loss_of_logits(logits, c):
        spliced = dict(out)
        spliced["stages"] = [dict(st, cls_logits=logits)]
        loss, _ = bundle.loss_fn(spliced, tb, rng, c)
        return loss

    g_ohem = jax.grad(loss_of_logits)(st["cls_logits"], cfg)
    g_plain = jax.grad(loss_of_logits)(st["cls_logits"], base)

    row_norm_ohem = np.asarray(jnp.abs(g_ohem[0]).sum(-1))
    row_norm_plain = np.asarray(jnp.abs(g_plain[0]).sum(-1))
    n_valid = int(np.asarray(st["valid"][0]).sum())

    assert np.isfinite(row_norm_ohem).all()
    assert (row_norm_ohem > 0).sum() <= keep, "grad leaked past the hardest-k"
    assert (row_norm_ohem > 0).sum() > 0, "no roi got gradient at all"
    assert (row_norm_plain > 0).sum() >= min(n_valid, keep + 1), \
        "baseline should backprop through (almost) all sampled rois"
