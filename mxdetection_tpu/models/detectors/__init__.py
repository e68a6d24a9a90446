from .retinanet import RetinaNet, retinanet_loss, retinanet_postprocess  # noqa: F401
