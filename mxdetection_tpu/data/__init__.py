from .coco import CocoDataset, make_synthetic_coco  # noqa: F401
from .voc import VocDataset, evaluate_voc, make_synthetic_voc  # noqa: F401
from .loader import DetectionLoader  # noqa: F401
from .transforms import batch_transform, fused_image_transform  # noqa: F401
