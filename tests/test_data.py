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


def test_loader_num_workers_deterministic(tiny_coco):
    """Parallel decode must yield byte-identical batches in the same order."""
    def batches(nw):
        loader = DetectionLoader(tiny_coco, batch_size=2, raw_hw=(416, 416),
                                 max_gt=10, with_masks=True, seed=3,
                                 num_workers=nw)
        return list(loader.epoch(0))

    for b1, b4 in zip(batches(1), batches(4)):
        assert set(b1) == set(b4)
        for k in b1:
            np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b4[k]))


def test_loader_flip_mirrors_box_masks(tmp_path):
    """Canonical instance masks must mirror when the image is flipped.

    Uses an asymmetric (right-triangle) instance so a missing mirror is
    detectable (rectangles/ellipses are x-symmetric and would pass vacuously).
    """
    import json
    from PIL import Image

    root = tmp_path / "tri"
    img_dir = root / "images"
    img_dir.mkdir(parents=True)
    h = w = 200
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(img_dir / "0.jpg")
    ann = {
        "images": [{"id": 0, "file_name": "0.jpg", "height": h, "width": w}],
        "annotations": [{
            "id": 1, "image_id": 0, "category_id": 1,
            "bbox": [20, 30, 100, 120], "area": 6000, "iscrowd": 0,
            "segmentation": [[20, 30, 120, 150, 20, 150]],  # right triangle
        }],
        "categories": [{"id": 1, "name": "tri"}],
    }
    ann_path = root / "ann.json"
    ann_path.write_text(json.dumps(ann))
    ds = CocoDataset(str(ann_path), str(img_dir), with_masks=True)

    loader = DetectionLoader(ds, batch_size=1, raw_hw=(256, 256), max_gt=4,
                             with_masks=True, shuffle=False, flip=False)
    plain = loader._load_one(0, flip=False)["box_masks"][0]
    flipped = loader._load_one(0, flip=True)["box_masks"][0]
    assert plain.any()
    assert not np.array_equal(plain, flipped), "triangle mask must change under flip"
    np.testing.assert_array_equal(flipped, plain[:, ::-1])


def _mixed_orientation_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_mixed")
    # size_range draws h and w independently -> mixed orientations
    ann, img_dir = make_synthetic_coco(str(root), num_images=12,
                                       size_range=(200, 400), seed=7)
    return CocoDataset(ann, img_dir)


def test_orient_buckets_homogeneous_batches(tmp_path_factory):
    ds = _mixed_orientation_ds(tmp_path_factory)
    orients = np.asarray([r.height > r.width for r in ds.records])
    assert orients.any() and (~orients).any(), "need mixed orientations"

    loader = DetectionLoader(ds, batch_size=2, raw_hw=(416, 416), max_gt=10,
                             seed=0, orient_buckets=True, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch()
    seen_ids = set()
    by_id = {r.image_id: r for r in ds.records}
    for b in batches:
        port = [by_id[int(i)].height > by_id[int(i)].width
                for i in b["image_ids"]]
        assert all(p == b["portrait"] for p in port), "mixed-orientation batch"
        seen_ids.update(int(i) for i in b["image_ids"])
    assert seen_ids == {r.image_id for r in ds.records}, "every image seen"


def test_portrait_canvas_no_truncation(tmp_path_factory):
    """Portrait batches on the transposed canvas keep the full image: the
    uncapped reference scale (short/long rule) fits without the canvas cap."""
    ds = _mixed_orientation_ds(tmp_path_factory)
    loader = DetectionLoader(ds, batch_size=2, raw_hw=(416, 416), max_gt=10,
                             seed=0, orient_buckets=True, drop_last=False)
    # canvas ratio mirrors the COCO default 832x1344 vs scale 800 / max 1333
    scale_size, max_size = 200, 333
    land_hw, port_hw = (208, 336), (336, 208)
    checked_portrait = 0
    for b in loader.epoch(0):
        out_hw = port_hw if b["portrait"] else land_hw
        res = batch_transform(
            jnp.asarray(b["raw"]), jnp.asarray(b["hw"]),
            jnp.asarray(b["flip"]), jnp.asarray(b["gt_boxes"]),
            out_hw=out_hw, scale_size=scale_size, max_size=max_size,
            mean=(0, 0, 0), std=(1, 1, 1), dtype=jnp.float32)
        for i in range(2):
            h, w = b["hw"][i]
            expect = min(scale_size / min(h, w), max_size / max(h, w))
            got = float(res["im_info"][i, 2])
            assert abs(got - expect) < 1e-5, "canvas cap must not bind"
            assert h * got <= out_hw[0] + 1e-3 and w * got <= out_hw[1] + 1e-3
            checked_portrait += bool(b["portrait"])
    assert checked_portrait > 0


def test_canvas_fit_cap_prevents_truncation():
    """Without bucketing, a portrait image on a landscape canvas is scaled
    down (not cropped): bottom-row content must survive the transform."""
    h, w = 400, 240
    img = np.zeros((h, w, 3), np.uint8)
    img[-8:, :, :] = 255  # bright stripe on the last rows
    raw = np.zeros((416, 416, 3), np.uint8)
    raw[:h, :w] = img
    res = batch_transform(
        jnp.asarray(raw[None]), jnp.asarray([[h, w]], jnp.float32),
        jnp.asarray([False]), jnp.zeros((1, 1, 4)),
        out_hw=(208, 336), scale_size=200, max_size=333,
        mean=(0, 0, 0), std=(1, 1, 1), dtype=jnp.float32)
    scale = float(res["im_info"][0, 2])
    assert h * scale <= 208 + 1e-3, "content taller than canvas"
    out = np.asarray(res["images"][0])
    stripe_row = int(h * scale) - 2
    assert out[stripe_row, : int(w * scale) - 2].mean() > 100, \
        "bottom content lost"


def test_orient_bucket_smaller_than_batch(tmp_path):
    """A bucket with fewer records than the batch must still yield FULL
    batches (tiled wrap-fill) — undersized batches break shard_map batch
    divisibility on a mesh (VERDICT r2 repro: 3 portrait, batch 8 -> 6)."""
    import json
    from PIL import Image

    root = tmp_path / "tiny_port"
    img_dir = root / "images"
    img_dir.mkdir(parents=True)
    images, anns = [], []
    sizes = [(300, 200), (320, 210), (310, 205)]  # 3 portrait only
    for i, (h, w) in enumerate(sizes):
        Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(img_dir / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg", "height": h, "width": w})
        anns.append({"id": i + 1, "image_id": i, "category_id": 1,
                     "bbox": [10, 10, 50, 50], "area": 2500, "iscrowd": 0})
    ann_path = root / "ann.json"
    ann_path.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "x"}]}))
    ds = CocoDataset(str(ann_path), str(img_dir))

    loader = DetectionLoader(ds, batch_size=8, raw_hw=(416, 416), max_gt=4,
                             seed=0, shuffle=False, flip=False,
                             orient_buckets=True, drop_last=False)
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch() == 1
    assert batches[0]["raw"].shape[0] == 8, "underfilled batch"
    assert set(int(i) for i in batches[0]["image_ids"]) == {0, 1, 2}


def test_global_plan_consistent_across_shards(tmp_path_factory):
    """orient_buckets + sharding: every process must see the same step count
    and the same per-step orientation/program choice (ADVICE r2 high)."""
    ds = _mixed_orientation_ds(tmp_path_factory)
    loaders = [DetectionLoader(ds, batch_size=2, raw_hw=(416, 416), max_gt=10,
                               seed=5, orient_buckets=True, drop_last=False,
                               num_shards=2, shard_index=s, flip=True)
               for s in (0, 1)]
    assert loaders[0].steps_per_epoch() == loaders[1].steps_per_epoch()
    plans = [ld._batch_plan(epoch=3) for ld in loaders]
    assert len(plans[0]) == len(plans[1]) == loaders[0].steps_per_epoch()
    union = set()
    for s0, s1 in zip(*plans):
        assert s0["portrait"] == s1["portrait"], "divergent program choice"
        assert len(s0["idx"]) == len(s1["idx"]) == 2, "wrong shard batch size"
        union.update(int(i) for i in s0["idx"])
        union.update(int(i) for i in s1["idx"])
    assert union == set(range(len(ds.records))), "global coverage broken"
