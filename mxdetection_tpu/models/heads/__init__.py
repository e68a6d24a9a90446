from .retina import RetinaHead  # noqa: F401
