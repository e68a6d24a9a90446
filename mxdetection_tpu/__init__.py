"""mxdetection_tpu: a TPU-native object-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``jiangzhengkai/mxdetection`` (MXNet detection framework family):
Faster R-CNN / Mask R-CNN / Cascade R-CNN / RetinaNet model zoo, COCO
data + eval pipeline, and multi-host data-parallel training — designed
TPU-first (SPMD meshes, fixed shapes, on-device target assignment,
Pallas kernels for the detection-specific hot ops).
"""

__version__ = "0.1.0"
