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

    # Horizontal flip is folded INTO the resample instead of applied after it
    # (the old reverse + dynamic-roll + select chain cost ~as much as the
    # resize itself and its lax.cond barrier blocked elementwise fusion).
    # Mirror the raw canvas (content then sits right-aligned) and translate:
    # with jax's sampling convention (output x samples input at
    # (x + 0.5 - t)/s - 0.5), translation t = round(new_w) - s*raw_w makes
    # the mirrored resample hit EXACTLY the sample positions of
    # reverse-then-roll-by-(round(new_w) - out_w): final[x] = out[R-1-x]
    # for the valid x < new_w (triangle kernel is symmetric, zeros bleed
    # identically at the mirrored boundary).
    raw_w = raw.shape[1]
    new_h = h * scale
    new_w = w * scale
    raw_in = jnp.where(flip, raw[:, ::-1, :], raw)
    tx = jnp.where(flip, jnp.round(new_w) - scale * raw_w, 0.0)
    out = jax.image.scale_and_translate(
        raw_in.astype(jnp.float32),
        shape=(out_h, out_w, 3),
        spatial_dims=(0, 1),
        scale=jnp.asarray([scale, scale], jnp.float32),
        translation=jnp.stack([jnp.float32(0.0), tx]),
        method=method,
    )

    # one fused tail: normalize, then zero the pad region (reference pads
    # with zeros AFTER normalization, so padding contributes exact zeros to
    # convs; this also kills any resampling bleed beyond the valid region)
    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    valid = (yy < new_h) & (xx < new_w)
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    out = jnp.where(valid[..., None], (out - mean_a) / std_a, 0.0)
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
