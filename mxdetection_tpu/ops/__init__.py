from . import anchors, boxes, matching, nms, roi_align  # noqa: F401
