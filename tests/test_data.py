"""Data pipeline tests: synthetic COCO, loader shapes, fused device transform."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mxdetection_tpu.data import (
    CocoDataset, DetectionLoader, batch_transform, make_synthetic_coco,
)


@pytest.fixture(scope="module")
def tiny_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    ann, img_dir = make_synthetic_coco(str(root), num_images=8, seed=0)
    return CocoDataset(ann, img_dir, with_masks=True)


def test_dataset_parses(tiny_coco):
    assert len(tiny_coco) == 8
    assert tiny_coco.num_classes == 5
    rec = tiny_coco.records[0]
    assert rec.boxes.shape[1] == 4
    img = tiny_coco.load_image(rec)
    assert img.shape == (rec.height, rec.width, 3)


def test_box_masks_rasterize(tiny_coco):
    rec = tiny_coco.records[0]
    masks = tiny_coco.get_box_masks(rec)
    assert masks.shape == (len(rec.boxes), 28, 28)
    # instance masks should cover a substantial part of their own box
    assert masks.reshape(len(rec.boxes), -1).mean(1).min() > 0.4


def test_loader_batch_shapes(tiny_coco):
    loader = DetectionLoader(tiny_coco, batch_size=2, raw_hw=(416, 416),
                             max_gt=10, with_masks=True, seed=1)
    batch = next(iter(loader.epoch(0)))
    assert batch["raw"].shape == (2, 416, 416, 3) and batch["raw"].dtype == np.uint8
    assert batch["gt_boxes"].shape == (2, 10, 4)
    assert batch["box_masks"].shape == (2, 10, 28, 28)
    assert batch["gt_valid"].any()
    # gt boxes lie inside the true image extent
    for i in range(2):
        v = batch["gt_valid"][i]
        h, w = batch["hw"][i]
        assert (batch["gt_boxes"][i][v][:, 2] <= w + 1e-3).all()
        assert (batch["gt_boxes"][i][v][:, 3] <= h + 1e-3).all()


def test_loader_sharding(tiny_coco):
    l0 = DetectionLoader(tiny_coco, batch_size=2, num_shards=2, shard_index=0, shuffle=False)
    l1 = DetectionLoader(tiny_coco, batch_size=2, num_shards=2, shard_index=1, shuffle=False)
    assert set(l0.indices) & set(l1.indices) == set()
    assert len(set(l0.indices) | set(l1.indices)) == 8


def test_fused_transform_matches_host_resize(tiny_coco):
    """Device scale_and_translate resize ~ PIL bilinear resize on the host."""
    from PIL import Image
    rec = tiny_coco.records[0]
    img = tiny_coco.load_image(rec)
    h, w = img.shape[:2]
    raw = np.zeros((416, 416, 3), np.uint8)
    raw[:h, :w] = img

    out_hw = (256, 256)
    scale = min(224 / min(h, w), 256 / max(h, w))
    mean, std = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)

    res = batch_transform(
        jnp.asarray(raw[None]), jnp.asarray([[h, w]], jnp.float32),
        jnp.asarray([False]), jnp.zeros((1, 1, 4)),
        out_hw=out_hw, scale_size=224, max_size=256, mean=mean, std=std,
        dtype=jnp.float32)
    got = np.asarray(res["images"][0])
    assert abs(float(res["im_info"][0, 2]) - scale) < 1e-5

    nh, nw = int(round(h * scale)), int(round(w * scale))
    ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR), np.float32)
    got_valid = got[:nh, :nw]
    # interpolation kernels differ slightly; mean abs diff must be small
    assert np.abs(got_valid - ref).mean() < 8.0
    # pad region is exactly zero
    assert np.abs(got[nh + 2:, :]).sum() == 0
    assert np.abs(got[:, nw + 2:]).sum() == 0


def test_fused_transform_flip_consistency(tiny_coco):
    rec = tiny_coco.records[0]
    img = tiny_coco.load_image(rec)
    h, w = img.shape[:2]
    raw = np.zeros((416, 416, 3), np.uint8)
    raw[:h, :w] = img
    gtb = np.zeros((1, 3, 4), np.float32)
    gtb[0, 0] = rec.boxes[0]

    kw = dict(out_hw=(256, 256), scale_size=224, max_size=256,
              mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), dtype=jnp.float32)
    plain = batch_transform(jnp.asarray(raw[None]), jnp.asarray([[h, w]], jnp.float32),
                            jnp.asarray([False]), jnp.asarray(gtb), **kw)
    flipped = batch_transform(jnp.asarray(raw[None]), jnp.asarray([[h, w]], jnp.float32),
                              jnp.asarray([True]), jnp.asarray(gtb), **kw)
    scale = float(plain["im_info"][0, 2])
    nh, nw = int(round(h * scale)), int(round(w * scale))
    a = np.asarray(plain["images"][0])[:nh, :nw]
    b = np.asarray(flipped["images"][0])[:nh, :nw]
    np.testing.assert_allclose(a, b[:, ::-1], atol=2.0)
    # gt box flip: x-extent mirrors, y unchanged
    pb = np.asarray(plain["gt_boxes"][0, 0])
    fb = np.asarray(flipped["gt_boxes"][0, 0])
    np.testing.assert_allclose(pb[[1, 3]], fb[[1, 3]], atol=1e-4)
    np.testing.assert_allclose(fb[0], w * scale - pb[2], atol=1e-3)
    np.testing.assert_allclose(fb[2], w * scale - pb[0], atol=1e-3)
