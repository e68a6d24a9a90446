"""VOC dataset parsing + VOC mAP protocol tests."""

import os

import numpy as np
import pytest

from mxdetection_tpu.data.voc import VocDataset, evaluate_voc, voc_ap, VOC_CLASSES


def write_voc(root, num_images=3):
    from PIL import Image
    base = os.path.join(root, "VOC2007")
    for d in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    rng = np.random.RandomState(0)
    ids = []
    for i in range(num_images):
        iid = f"{i:06d}"
        ids.append(iid)
        w, h = 320, 240
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            os.path.join(base, "JPEGImages", iid + ".jpg"))
        objs = ""
        for j in range(2):
            cls = VOC_CLASSES[(i + j) % len(VOC_CLASSES)]
            x1, y1 = 10 + 50 * j, 20 + 40 * j
            objs += f"""
  <object><name>{cls}</name><difficult>{j % 2}</difficult>
    <bndbox><xmin>{x1 + 1}</xmin><ymin>{y1 + 1}</ymin><xmax>{x1 + 81}</xmax><ymax>{y1 + 61}</ymax></bndbox>
  </object>"""
        xml = f"""<annotation><size><width>{w}</width><height>{h}</height></size>{objs}
</annotation>"""
        with open(os.path.join(base, "Annotations", iid + ".xml"), "w") as f:
            f.write(xml)
    with open(os.path.join(base, "ImageSets", "Main", "trainval.txt"), "w") as f:
        f.write("\n".join(ids))
    return root


def test_voc_parse(tmp_path):
    root = write_voc(str(tmp_path))
    ds = VocDataset(root, split="trainval")
    assert len(ds) == 3
    rec = ds.records[0]
    assert rec.boxes.shape == (2, 4)
    np.testing.assert_allclose(rec.boxes[0], [10, 20, 90, 80])  # 1-indexed fix
    assert rec.is_crowd.tolist() == [False, True]  # difficult flag
    img = ds.load_image(rec)
    assert img.shape == (240, 320, 3)


def test_voc_ap_protocols():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 0.5])
    # area metric: 0.5 recall at p=1 + 0.5 recall at p=0.5
    assert abs(voc_ap(rec, prec) - 0.75) < 1e-6
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    assert abs(ap07 - (6 * 1.0 + 5 * 0.5) / 11) < 1e-6


def test_voc_eval_perfect(tmp_path):
    root = write_voc(str(tmp_path))
    ds = VocDataset(root, split="trainval")
    dets = []
    for r in ds.records:
        keep = ~r.is_crowd
        dets.append({"image_id": r.image_id, "boxes": r.boxes[keep],
                     "scores": np.ones(keep.sum()), "labels": r.labels[keep]})
    res = evaluate_voc(dets, ds)
    assert abs(res["mAP"] - 1.0) < 1e-6


def test_voc_eval_miss(tmp_path):
    root = write_voc(str(tmp_path))
    ds = VocDataset(root, split="trainval")
    dets = [{"image_id": r.image_id, "boxes": np.zeros((0, 4)),
             "scores": np.zeros(0), "labels": np.zeros(0, int)} for r in ds.records]
    res = evaluate_voc(dets, ds)
    assert res["mAP"] == 0.0
