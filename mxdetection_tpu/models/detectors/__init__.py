from .rcnn import RCNN, rcnn_loss, rcnn_postprocess  # noqa: F401
from .retinanet import RetinaNet, retinanet_loss, retinanet_postprocess  # noqa: F401
