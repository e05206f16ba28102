"""Pallas TPU kernels for the hot ops (detection, matching, descriptor
sampling). Each has a pure-XLA fallback in the parent ops modules; the
kernels exist to pin the exact VMEM-resident dataflow (load once, fuse
everything, one HBM round trip) where XLA's auto-fusion makes poor choices.

Kernels run in interpreter mode automatically on non-TPU backends, so the
CPU test suite exercises the same code paths.
"""
from . import detect_kernel  # noqa: F401
