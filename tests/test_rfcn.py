"""R-FCN forward/loss/postprocess tests (family widening; SURVEY.md §2.2
DCN row names PSRoIPool/DeformablePSROIPooling as family members)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.config import load_config

HW = (128, 128)


def shrink(cfg, deform=True):
    return cfg.override(**{
        "data.pad_h": HW[0], "data.pad_w": HW[1],
        "bbox_head.num_classes": 5, "bbox_head.num_samples": 32,
        # keep = all sampled rois: the OHEM ranking path still runs, but the
        # 2 tiny-config positives (gt-appended proposals with near-zero l1 at
        # init) can't be ranked out, which would zero the reg grads this
        # suite asserts on
        "bbox_head.ohem_keep": 32,
        "rpn.pre_nms_top_n_train": 200, "rpn.post_nms_top_n_train": 64,
        "rpn.pre_nms_top_n_test": 200, "rpn.post_nms_top_n_test": 64,
        "test.pre_nms_per_class": 200,
        "rfcn_head.ps_grid": 3, "rfcn_head.reduce_channels": 64,
        "rfcn_head.deform_pool": deform,
    })


def make_tb(batch=1):
    return {
        "images": jnp.ones((batch, *HW, 3)) * 0.1,
        "im_info": jnp.tile(jnp.asarray([[128.0, 128.0, 1.0]]), (batch, 1)),
        "gt_boxes": jnp.tile(jnp.asarray(
            [[[10.0, 12, 70, 80], [40, 30, 90, 100], [0, 0, 0, 0]]]), (batch, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[1, 3, 0]], jnp.int32), (batch, 1)),
        "gt_valid": jnp.tile(jnp.asarray([[True, True, False]]), (batch, 1)),
    }


def _bundle(deform):
    from mxdetection_tpu.models.registry import build_detector
    cfg = shrink(load_config("configs/rfcn_r50_1x.py"), deform=deform)
    bundle = build_detector(cfg)
    tb = make_tb()
    variables = bundle.init(jax.random.PRNGKey(0), tb)
    return cfg, bundle, tb, variables


@pytest.fixture(scope="module")
def rfcn():
    return _bundle(deform=True)


def test_dilated_c5_keeps_stride_16(rfcn):
    cfg, bundle, tb, variables = rfcn
    feats = bundle.model_eval.apply(
        variables, tb["images"],
        method=lambda m, im: m.backbone(im))
    c4, c5 = feats[2], feats[3]
    assert c4.shape[1:3] == (HW[0] // 16, HW[1] // 16)
    assert c5.shape[1:3] == (HW[0] // 16, HW[1] // 16)  # dilated, not strided


def test_rfcn_train_forward_and_loss(rfcn):
    cfg, bundle, tb, variables = rfcn
    rng = jax.random.PRNGKey(1)
    out, _ = bundle.apply_train(variables, tb, rng)
    st = out["stages"][0]
    s = cfg.bbox_head.num_samples
    assert st["cls_logits"].shape == (1, s, 6)
    assert st["deltas"].shape == (1, s, 4)          # class-agnostic
    loss, metrics = bundle.loss_fn(out, tb, rng, cfg)
    assert np.isfinite(float(loss))
    for k in ("loss_rpn_cls", "loss_rpn_reg", "loss_rcnn_cls0", "loss_rcnn_reg0"):
        assert np.isfinite(float(metrics[k])), k


def test_rfcn_grads_flow_including_offset_branch(rfcn):
    cfg, bundle, tb, variables = rfcn
    rng = jax.random.PRNGKey(2)

    def loss_fn(params):
        v = {"params": params, **{k: variables[k] for k in variables
                                  if k != "params"}}
        out, _ = bundle.apply_train(v, tb, rng)
        loss, _ = bundle.loss_fn(out, tb, rng, cfg)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    for part in ("rpn", "rfcn_cls", "rfcn_bbox", "conv_new"):
        sub = jax.tree.leaves(grads[part])
        assert any(float(jnp.abs(g).sum()) > 0 for g in sub), part
    # the deformable offset branch exists and is zero-init; its kernel grad
    # flows through psroi_pool's offset argument
    assert "rfcn_offset" in grads


def test_rfcn_eval_and_postprocess(rfcn):
    cfg, bundle, tb, variables = rfcn
    out = bundle.apply_eval(variables, tb)
    assert out["class_agnostic"] is True
    dets = bundle.postprocess(out, cfg, HW, tb["im_info"])
    n = cfg.test.max_per_image
    assert dets["boxes"].shape == (1, n, 4)
    assert dets["scores"].shape == (1, n)
    assert dets["labels"].shape == (1, n)
    b = np.asarray(dets["boxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()
    assert (b >= -1e-3).all() and (b[..., 0::2] <= HW[1]).all()


def test_rfcn_plain_pool_variant():
    cfg, bundle, tb, variables = _bundle(deform=False)
    assert "rfcn_offset" not in variables["params"]
    out = bundle.apply_eval(variables, tb)
    dets = bundle.postprocess(out, cfg, HW, tb["im_info"])
    assert np.isfinite(np.asarray(dets["scores"])).all()
