"""visual_slam_tpu — a TPU-native visual SLAM framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of the reference implementation
(juuso-oskari/visual_slam; see SURVEY.md): feature front-end, two-view
geometry, PnP tracking, map management, and bundle adjustment — expressed as
batched, fixed-shape, sharded computation for TPU.
"""

__version__ = "0.1.0"
