from .logger import create_logger  # noqa: F401
