"""shiftnet_tpu — TPU-native video restoration framework (GShiftNet family).

A from-scratch JAX/XLA/Pallas re-design of the grouped spatial-temporal shift
video restoration framework (CVPR 2023 "A Simple Baseline for Video
Restoration with Grouped Spatial-Temporal Shift"), built for TPU: NHWC
frames-as-batch layout, bf16 compute, pjit/shard_map data & temporal
parallelism over device meshes, and Pallas kernels for the shift hot path.
"""
__version__ = '0.1.0'
