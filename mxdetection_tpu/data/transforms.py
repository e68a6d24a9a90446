"""On-device fused image transform: resize + pad + normalize + flip, one jit.

Reference equivalent: host-side cv2/numpy per batch (``*/image.py``: imdecode
-> short-side resize w/ max cap -> mean/std normalize -> HWC->CHW -> pad;
SURVEY.md §2.2 "Image transforms", §3.1 ②). The TPU rebuild moves everything
after JPEG decode onto the device inside the jitted train step, which is the
north-star contract ("host-side numpy never touches the hot loop").

The static-shape trick: the host ships a fixed-size zero-padded uint8 canvas
(raw_h, raw_w) plus the true (h, w); the device computes the dynamic scale
and uses ``jax.image.scale_and_translate`` to a fixed (pad_h, pad_w) output —
resize and pad fuse into one resampling op with static shapes, no retracing
across image sizes. Horizontal flip is a reversal + dynamic roll.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as box_lib

Array = jax.Array


def fused_image_transform(
    raw: Array,            # (raw_h, raw_w, 3) uint8, valid region top-left
    hw: Array,             # (2,) float32 true (h, w)
    flip: Array,           # () bool
    *,
    out_hw: tuple[int, int],
    scale_size: int,
    max_size: int,
    mean: tuple,
    std: tuple,
    dtype=jnp.bfloat16,
    method: str = "linear",
) -> tuple[Array, Array]:
    """Returns (image (out_h, out_w, 3) ``dtype``, scale ()).

    Semantics: scale = min(scale_size / short_side, max_size / long_side);
    resized content occupies the top-left (h*scale, w*scale) region; the rest
    is zeros (mean-subtracted zeros, matching the reference's pad-after-
    normalize behavior).
    """
    h, w = hw[0], hw[1]
    short = jnp.minimum(h, w)
    long = jnp.maximum(h, w)
    scale = jnp.minimum(scale_size / short, max_size / long)
    out_h, out_w = out_hw
    # canvas-fit cap: never scale past the static pad canvas, so no image
    # content is ever silently truncated. With orientation bucketing
    # (portrait batches get the transposed canvas) this cap never binds for
    # standard COCO scaling; it is the safety net for odd configs.
    scale = jnp.minimum(scale, jnp.minimum(out_h / h, out_w / w))
    img = raw.astype(jnp.float32)
    out = jax.image.scale_and_translate(
        img,
        shape=(out_h, out_w, 3),
        spatial_dims=(0, 1),
        scale=jnp.asarray([scale, scale], jnp.float32),
        translation=jnp.zeros((2,), jnp.float32),
        method=method,
    )
    new_h = h * scale
    new_w = w * scale
    # zero out resampling bleed beyond the valid region
    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    valid = (yy < new_h) & (xx < new_w)
    out = jnp.where(valid[..., None], out, 0.0)

    # horizontal flip: reverse x, then roll content back to the left edge,
    # so the valid region stays top-left regardless of flip
    def do_flip(o):
        rev = o[:, ::-1, :]
        return jnp.roll(rev, jnp.round(new_w).astype(jnp.int32) - out_w, axis=1)

    out = jax.lax.cond(flip, do_flip, lambda o: o, out)

    # normalize, then re-zero the pad region (reference pads with zeros AFTER
    # normalization, so padding contributes exact zeros to convs)
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    out = (out - mean_a) / std_a
    out = jnp.where(valid[..., None], out, 0.0)
    return out.astype(dtype), scale


def transform_gt(boxes: Array, scale: Array, flip: Array, new_w: Array) -> Array:
    """Scale gt boxes into network coordinates, honoring the flip."""
    b = boxes * scale
    return jax.lax.cond(flip, lambda x: box_lib.flip_boxes(x, new_w), lambda x: x, b)


def batch_transform(
    raw: Array,        # (B, raw_h, raw_w, 3) uint8
    hw: Array,         # (B, 2)
    flip: Array,       # (B,)
    gt_boxes: Array,   # (B, G, 4)
    *,
    out_hw: tuple[int, int],
    scale_size: int,
    max_size: int,
    mean: tuple,
    std: tuple,
    dtype=jnp.bfloat16,
    scale_sizes: Array | None = None,  # (B,) per-image short-side targets
) -> dict:
    """Fused per-batch transform -> dict(images, gt_boxes, im_info).

    im_info rows are (orig_h, orig_w, scale) — the reference's convention
    (``im_info`` threaded through every symbol; SURVEY.md §3.1).
    ``scale_sizes`` enables multi-scale training: the short-side target is a
    traced per-image value, so random scales never retrace.
    """
    if scale_sizes is None:
        scale_sizes = jnp.full(raw.shape[:1], scale_size, jnp.float32)

    def one(r, s_hw, f, gtb, ss):
        img, scale = fused_image_transform(
            r, s_hw, f, out_hw=out_hw, scale_size=ss, max_size=max_size,
            mean=mean, std=std, dtype=dtype)
        new_w = s_hw[1] * scale
        gtb = transform_gt(gtb, scale, f, new_w)
        info = jnp.stack([s_hw[0], s_hw[1], scale])
        return img, gtb, info

    imgs, gtb, info = jax.vmap(one)(raw, hw, flip, gt_boxes, scale_sizes)
    return {"images": imgs, "gt_boxes": gtb, "im_info": info}
