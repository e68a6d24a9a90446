"""Host data loader: decode-only workers feeding fixed-shape uint8 batches.

Reference equivalent: ``AnchorLoader`` / ``TestLoader`` + ``PrefetchingIter``
(``*/core/loader.py``; SURVEY.md §2.2). The reference's loader did decode,
resize, normalize, anchor-target assignment and padding on host threads; here
the host does ONLY JPEG decode + placement into a fixed raw canvas — every
other step is on-device (``transforms.batch_transform`` inside the jitted
step). Prefetching is a small thread pool with a bounded queue, like the
reference's PrefetchingIter but with numpy-free hot path.

Multi-host sharding: records are sharded by (process_index, num_processes) the
same way the reference sharded its roidb by worker rank (SURVEY.md §3.5).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from .coco import CocoDataset


class DetectionLoader:
    """Yields dict batches of fixed-shape numpy arrays.

    Keys: raw (B, raw_h, raw_w, 3) u8; hw (B, 2) f32; flip (B,) bool;
    gt_boxes (B, G, 4) f32 (original image coords); gt_labels (B, G) i32;
    gt_valid (B, G) bool; image_ids (B,) i64; and box_masks (B, G, M, M) u8
    when the dataset carries masks.
    """

    def __init__(self, dataset: CocoDataset, *, batch_size: int,
                 raw_hw: tuple[int, int] = (640, 640), max_gt: int = 100,
                 shuffle: bool = True, flip: bool = True, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 4,
                 num_shards: int = 1, shard_index: int = 0,
                 with_masks: bool = False, drop_last: bool = True,
                 train_scales: tuple = ()):
        self.ds = dataset
        self.batch_size = batch_size
        self.raw_hw = raw_hw
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.flip = flip
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.with_masks = with_masks
        self.drop_last = drop_last
        self.train_scales = tuple(train_scales)

        idx = np.arange(len(dataset))
        self.indices = idx[shard_index::num_shards]
        if len(self.indices) == 0:
            raise ValueError("empty shard")

    def steps_per_epoch(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _load_one(self, rec_idx: int, flip: bool) -> dict:
        rec = self.ds.records[rec_idx]
        img = self.ds.load_image(rec)
        rh, rw = self.raw_hw
        h, w = img.shape[:2]
        if h > rh or w > rw:
            # static raw canvas contract: pre-shrink rare oversize images
            s = min(rh / h, rw / w)
            from PIL import Image
            img = np.asarray(
                Image.fromarray(img).resize((int(w * s), int(h * s)), Image.BILINEAR),
                np.uint8)
            h, w = img.shape[:2]
            boxes = rec.boxes * s
        else:
            boxes = rec.boxes
        raw = np.zeros((rh, rw, 3), np.uint8)
        raw[:h, :w] = img

        g = self.max_gt
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_labels = np.zeros((g,), np.int32)
        gt_valid = np.zeros((g,), bool)
        n = min(len(boxes), g)
        # crowd boxes are excluded from training targets (family convention)
        keep = ~rec.is_crowd
        kept_boxes = boxes[keep][:g]
        kept_labels = rec.labels[keep][:g]
        n = len(kept_boxes)
        gt_boxes[:n] = kept_boxes
        gt_labels[:n] = kept_labels
        gt_valid[:n] = True

        out = {
            "raw": raw,
            "hw": np.asarray([h, w], np.float32),
            "flip": np.asarray(flip),
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_valid": gt_valid,
            "image_id": np.asarray(rec.image_id, np.int64),
        }
        if self.with_masks:
            m = self.ds.box_mask_size
            bm = np.zeros((g, m, m), np.uint8)
            masks = self.ds.get_box_masks(rec)[keep][:g]
            bm[:n] = masks
            out["box_masks"] = bm
        return out

    def epoch(self, epoch: int) -> Iterator[dict]:
        """One pass over this shard, prefetched. Deterministic per (seed, epoch)."""
        rng = np.random.RandomState(self.seed + epoch)
        order = self.indices.copy()
        if self.shuffle:
            rng.shuffle(order)
        flips = rng.rand(len(order)) < 0.5 if self.flip else np.zeros(len(order), bool)
        if self.train_scales:
            scale_choices = rng.choice(self.train_scales, size=len(order)).astype(np.float32)
        else:
            scale_choices = None

        nb = self.steps_per_epoch()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sl = slice(b * self.batch_size, (b + 1) * self.batch_size)
                    batch_idx = order[sl]
                    batch_flip = flips[sl]
                    if len(batch_idx) < self.batch_size:  # wrap-around fill
                        extra = self.batch_size - len(batch_idx)
                        batch_idx = np.concatenate([batch_idx, order[:extra]])
                        batch_flip = np.concatenate([batch_flip, flips[:extra]])
                    samples = [self._load_one(int(i), bool(f))
                               for i, f in zip(batch_idx, batch_flip)]
                    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
                    batch["image_ids"] = batch.pop("image_id")
                    if scale_choices is not None:
                        sc = scale_choices[sl]
                        if len(sc) < self.batch_size:
                            sc = np.concatenate(
                                [sc, scale_choices[: self.batch_size - len(sc)]])
                        batch["scale_size"] = sc
                    q.put(batch)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()

    def __iter__(self):
        ep = 0
        while True:
            yield from self.epoch(ep)
            ep += 1
