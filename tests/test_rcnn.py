"""Faster/Mask/Cascade R-CNN forward/loss/postprocess tests (SURVEY.md §4.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.config import load_config

HW = (128, 128)


def shrink(cfg):
    return cfg.override(**{
        "data.pad_h": HW[0], "data.pad_w": HW[1],
        "bbox_head.num_classes": 5, "bbox_head.num_samples": 32,
        "rpn.pre_nms_top_n_train": 200, "rpn.post_nms_top_n_train": 64,
        "rpn.pre_nms_top_n_test": 200, "rpn.post_nms_top_n_test": 64,
        "test.pre_nms_per_class": 200,
    })


def make_tb(with_masks=False, batch=1):
    tb = {
        "images": jnp.ones((batch, *HW, 3)) * 0.1,
        "im_info": jnp.tile(jnp.asarray([[128.0, 128.0, 1.0]]), (batch, 1)),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[10.0, 12, 70, 80], [40, 30, 90, 100], [0, 0, 0, 0]]]), (batch, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[1, 3, 0]], jnp.int32), (batch, 1)),
        "gt_valid": jnp.tile(jnp.asarray([[True, True, False]]), (batch, 1)),
    }
    if with_masks:
        masks = np.zeros((batch, 3, 28, 28), np.uint8)
        masks[:, :, 4:24, 4:24] = 1
        tb["box_masks"] = jnp.asarray(masks)
    return tb


def _bundle(name, with_masks=False):
    from mxdetection_tpu.models.registry import build_detector
    cfg = shrink(load_config(f"configs/{name}.py"))
    if name.startswith("cascade"):
        # CPU-test shrink: R50 instead of R101, DCN only in the last stage
        cfg = cfg.override(**{"backbone.depth": 50,
                              "backbone.dcn_stages": (False, False, False, True)})
    bundle = build_detector(cfg)
    tb = make_tb(with_masks)
    variables = bundle.init(jax.random.PRNGKey(0), tb)
    return cfg, bundle, tb, variables


@pytest.fixture(scope="module")
def faster():
    return _bundle("faster_rcnn_r50_fpn_1x")


def test_faster_rcnn_train_forward_and_loss(faster):
    cfg, bundle, tb, variables = faster
    rng = jax.random.PRNGKey(1)
    out, _ = bundle.apply_train(variables, tb, rng)
    assert len(out["stages"]) == 1
    st = out["stages"][0]
    s = cfg.bbox_head.num_samples
    assert st["cls_logits"].shape == (1, s, 6)
    assert st["deltas"].shape == (1, s, 24)
    loss, metrics = bundle.loss_fn(out, tb, rng, cfg)
    assert np.isfinite(float(loss))
    for k in ("loss_rpn_cls", "loss_rpn_reg", "loss_rcnn_cls0", "loss_rcnn_reg0"):
        assert np.isfinite(float(metrics[k])), k


def test_faster_rcnn_grads_flow(faster):
    cfg, bundle, tb, variables = faster
    rng = jax.random.PRNGKey(2)

    def loss_fn(params):
        out, _ = bundle.apply_train(
            {"params": params, "batch_stats": variables["batch_stats"]}, tb, rng)
        loss, _ = bundle.loss_fn(out, tb, rng, cfg)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for part in ("rpn", "bbox_head0", "fpn"):
        sub = jax.tree.leaves(grads[part])
        assert any(float(jnp.abs(g).sum()) > 0 for g in sub), part


def test_faster_rcnn_eval_and_postprocess(faster):
    cfg, bundle, tb, variables = faster
    out = bundle.apply_eval(variables, tb)
    r = cfg.rpn.post_nms_top_n_test
    assert out["rois"].shape == (1, r, 4)
    assert out["probs"].shape == (1, r, 6)
    dets = bundle.postprocess(out, cfg, HW, tb["im_info"])
    m = cfg.test.max_per_image
    assert dets["boxes"].shape == (1, m, 4)
    b = np.asarray(dets["boxes"])
    assert (b >= 0).all() and (b <= 128).all()
    lab = np.asarray(dets["labels"])[np.asarray(dets["valid"])]
    assert ((lab >= 0) & (lab < 5)).all()


@pytest.fixture(scope="module")
def maskr():
    return _bundle("mask_rcnn_r50_fpn_1x", with_masks=True)


def test_mask_rcnn_train(maskr):
    cfg, bundle, tb, variables = maskr
    rng = jax.random.PRNGKey(1)
    out, _ = bundle.apply_train(variables, tb, rng)
    # mask branch runs on the static fg-quota prefix only (fg rois lead the
    # sampled set), matching the reference's fg-only MaskTarget semantics
    mp = int(round(cfg.bbox_head.num_samples * cfg.bbox_head.pos_fraction))
    assert out["mask_logits"].shape == (1, mp, 28, 28, 5)
    assert out["mask_targets"].shape == (1, mp, 28, 28)
    # every positive must live inside that prefix
    pos_full = np.asarray(out["stages"][0]["pos"][0])
    assert not pos_full[mp:].any()
    loss, metrics = bundle.loss_fn(out, tb, rng, cfg)
    assert np.isfinite(float(loss)) and np.isfinite(float(metrics["loss_mask"]))
    # targets are binary and nonempty for positive rois
    tgt = np.asarray(out["mask_targets"])
    assert set(np.unique(tgt)) <= {0.0, 1.0}
    pos = pos_full[:mp]
    if pos.any():
        assert tgt[0][pos].sum() > 0


def test_mask_rcnn_eval_mask_forward(maskr):
    cfg, bundle, tb, variables = maskr
    out = bundle.apply_eval(variables, tb)
    det_boxes = jnp.asarray([[[10.0, 10, 60, 60], [20, 20, 90, 90]]])
    det_valid = jnp.asarray([[True, True]])
    logits = bundle.model_eval.apply(
        variables, out["pyramid"], det_boxes, det_valid,
        method=bundle.model_eval.mask_forward)
    assert logits.shape == (1, 2, 28, 28, 5)


@pytest.fixture(scope="module")
def cascade():
    return _bundle("cascade_rcnn_r101_dcn_1x")


def test_cascade_train(cascade):
    cfg, bundle, tb, variables = cascade
    rng = jax.random.PRNGKey(1)
    out, _ = bundle.apply_train(variables, tb, rng)
    assert len(out["stages"]) == 3
    # cascade heads are class-agnostic: 4 deltas
    for st in out["stages"]:
        assert st["deltas"].shape[-1] == 4
    loss, metrics = bundle.loss_fn(out, tb, rng, cfg)
    assert np.isfinite(float(loss))
    for i in range(3):
        assert np.isfinite(float(metrics[f"loss_rcnn_cls{i}"]))


def test_cascade_eval(cascade):
    cfg, bundle, tb, variables = cascade
    out = bundle.apply_eval(variables, tb)
    dets = bundle.postprocess(out, cfg, HW, tb["im_info"])
    assert dets["boxes"].shape == (1, cfg.test.max_per_image, 4)
