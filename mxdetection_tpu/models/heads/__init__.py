from .bbox_head import BBoxHead, MaskHead  # noqa: F401
from .retina import RetinaHead  # noqa: F401
from .rpn import RPNHead  # noqa: F401
