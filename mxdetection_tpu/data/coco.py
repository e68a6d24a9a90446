"""COCO dataset: annotation parsing -> fixed-shape records. No pycocotools.

Reference equivalent: ``*/dataset/coco.py`` (``class coco(IMDB)``,
``load_gt_roidb`` -> roidb list-of-dicts; SURVEY.md §2.2). The reference
leaned on pycocotools for both loading and eval; this rebuild parses the
annotation JSON directly (the format is plain JSON) and implements COCOeval
in ``eval/coco_eval.py`` — pycocotools is not available in this environment.

Per-image record (the "roidb" analog, but fixed-shape-ready):
  image_id, file, (h, w), boxes (G, 4) float32 xyxy, labels (G,) int32
  contiguous [0, C), is_crowd (G,) bool, polygons (list, host-only),
  box_masks (G, M, M) uint8 — each instance mask rasterized into its own
  box at MxM (the on-device mask-target trick: roi mask targets become an
  affine crop of these, no full-resolution masks ever ship to device).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
import numpy as np

try:
    from PIL import Image, ImageDraw
except ImportError:  # pragma: no cover
    Image = ImageDraw = None


@dataclass
class ImageRecord:
    image_id: int
    file: str
    height: int
    width: int
    boxes: np.ndarray          # (G, 4) xyxy float32
    labels: np.ndarray         # (G,) int32, contiguous [0, num_classes)
    is_crowd: np.ndarray       # (G,) bool
    areas: np.ndarray | None = None                # (G,) float annotation areas
    polygons: list = field(default_factory=list)   # per instance: list of (P, 2) arrays
    box_masks: np.ndarray | None = None            # (G, M, M) uint8, lazy


def rasterize_polygons_in_box(polygons, box, out_size: int) -> np.ndarray:
    """Rasterize an instance's polygons into its own bounding box at MxM.

    Equivalent role to the reference's host-side mask-target crop
    (``*/operator_py/mask_target.py``) but precomputed once per instance at
    load time; per-roi targets are then computed on device by affine cropping
    these (see ``ops/mask_target.py``).
    """
    x1, y1, x2, y2 = box
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    img = Image.new("L", (out_size, out_size), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        p = np.asarray(poly, np.float64).reshape(-1, 2)
        p[:, 0] = (p[:, 0] - x1) / w * out_size
        p[:, 1] = (p[:, 1] - y1) / h * out_size
        if len(p) >= 3:
            draw.polygon([tuple(q) for q in p], outline=1, fill=1)
    return np.asarray(img, np.uint8)


def rasterize_full_mask(polygons, height: int, width: int) -> np.ndarray:
    """Rasterize an instance's polygons at full image resolution (eval-side)."""
    img = Image.new("L", (width, height), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        p = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(p) >= 3:
            draw.polygon([tuple(q) for q in p], outline=1, fill=1)
    return np.asarray(img, bool)


class CocoDataset:
    """Parses a COCO-format annotation file; serves ImageRecords.

    ``category_ids`` maps contiguous label -> original COCO category id
    (needed when emitting detection JSON for eval).
    """

    def __init__(self, ann_file: str, image_dir: str, *,
                 with_masks: bool = False, box_mask_size: int = 28,
                 filter_empty: bool = True, min_box_size: float = 1e-3):
        with open(ann_file) as f:
            ann = json.load(f)

        self.image_dir = image_dir
        self.with_masks = with_masks
        self.box_mask_size = box_mask_size

        cats = sorted(ann["categories"], key=lambda c: c["id"])
        self.category_ids = [c["id"] for c in cats]
        self.category_names = [c["name"] for c in cats]
        self.num_classes = len(cats)
        cat_to_label = {c["id"]: i for i, c in enumerate(cats)}

        per_image: dict[int, list] = {}
        for a in ann.get("annotations", []):
            per_image.setdefault(a["image_id"], []).append(a)

        self.records: list[ImageRecord] = []
        for im in ann["images"]:
            anns = per_image.get(im["id"], [])
            boxes, labels, crowd, polys, areas = [], [], [], [], []
            for a in anns:
                x, y, w, h = a["bbox"]
                if w < min_box_size or h < min_box_size:
                    continue
                boxes.append([x, y, x + w, y + h])
                labels.append(cat_to_label[a["category_id"]])
                crowd.append(bool(a.get("iscrowd", 0)))
                areas.append(float(a.get("area", w * h)))
                seg = a.get("segmentation")
                polys.append(seg if isinstance(seg, list) else [])
            if filter_empty and not boxes:
                continue
            self.records.append(ImageRecord(
                image_id=im["id"],
                file=os.path.join(image_dir, im["file_name"]),
                height=im["height"],
                width=im["width"],
                boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                is_crowd=np.asarray(crowd, bool),
                areas=np.asarray(areas, np.float64),
                polygons=polys,
            ))
        # ground truth kept for eval
        self._raw = ann

    def __len__(self) -> int:
        return len(self.records)

    def load_image(self, rec: ImageRecord) -> np.ndarray:
        """Decode to uint8 (H, W, 3) RGB. Host-side (decode only; everything
        after this runs on device — SURVEY.md §3.1 ②'s host work eliminated)."""
        img = Image.open(rec.file).convert("RGB")
        return np.asarray(img, np.uint8)

    def get_box_masks(self, rec: ImageRecord) -> np.ndarray:
        if rec.box_masks is None:
            m = self.box_mask_size
            out = np.zeros((len(rec.boxes), m, m), np.uint8)
            for i, polys in enumerate(rec.polygons):
                if polys:
                    out[i] = rasterize_polygons_in_box(polys, rec.boxes[i], m)
            rec.box_masks = out
        return rec.box_masks


def make_synthetic_coco(root: str, num_images: int = 16, size_range=(240, 400),
                        num_classes: int = 5, max_objects: int = 6, seed: int = 0,
                        split: str = "train") -> tuple[str, str]:
    """Generate a tiny valid COCO dataset (JPEG images + JSON) for tests and
    smoke training (SURVEY.md §4.5 "tiny-COCO"). Objects are bright rectangles
    and ellipses on dark noise so a detector can genuinely overfit them."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, f"images_{split}")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    ann_id = 1
    for i in range(num_images):
        h = int(rng.randint(*size_range))
        w = int(rng.randint(*size_range))
        arr = (rng.rand(h, w, 3) * 40).astype(np.uint8)
        img = Image.fromarray(arr)
        draw = ImageDraw.Draw(img)
        n_obj = rng.randint(1, max_objects + 1)
        for _ in range(n_obj):
            bw = rng.randint(int(0.15 * w), int(0.45 * w))
            bh = rng.randint(int(0.15 * h), int(0.45 * h))
            x = rng.randint(0, w - bw)
            y = rng.randint(0, h - bh)
            cls = int(rng.randint(num_classes))
            color = tuple(int(c) for c in (60 + 39 * cls, 255 - 39 * cls, 128 + 25 * cls))
            if cls % 2 == 0:
                draw.rectangle([x, y, x + bw, y + bh], fill=color)
                seg = [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]]
            else:
                draw.ellipse([x, y, x + bw, y + bh], fill=color)
                # polygon approximation of the ellipse
                t = np.linspace(0, 2 * np.pi, 17)[:-1]
                px = x + bw / 2 + bw / 2 * np.cos(t)
                py = y + bh / 2 + bh / 2 * np.sin(t)
                seg = [np.stack([px, py], 1).reshape(-1).tolist()]
            annotations.append({
                "id": ann_id, "image_id": i, "category_id": cls + 1,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0, "segmentation": seg,
            })
            ann_id += 1
        fname = f"{i:06d}.jpg"
        img.save(os.path.join(img_dir, fname), quality=90)
        images.append({"id": i, "file_name": fname, "height": h, "width": w})

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c + 1, "name": f"class{c}"} for c in range(num_classes)],
    }
    ann_file = os.path.join(root, f"instances_{split}.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_dir
