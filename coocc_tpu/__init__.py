"""coocc_tpu: TPU-native multi-modal 3D semantic occupancy prediction.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Rorisis/Co-Occ
(LiDAR+camera occupancy with KNN fusion and a NeRF-style rendering
regularizer), built for TPU: static shapes, channels-last layouts, fused
scatter kernels, pjit data parallelism over a jax.sharding.Mesh.
"""
__version__ = "0.1.0"
