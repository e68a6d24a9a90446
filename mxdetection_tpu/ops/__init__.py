from . import anchors, boxes, matching, nms, psroi, roi_align  # noqa: F401
