"""Pallas TPU kernels for the detection-specific hot ops (SURVEY.md §2.3).

Each kernel has a pure-JAX reference implementation in ``ops/`` used for
golden testing (``interpret=True`` on CPU) and as the autodiff path where the
kernel is forward-only.
"""
