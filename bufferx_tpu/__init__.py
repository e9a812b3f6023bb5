"""BUFFER-X TPU: a TPU-native zero-shot point-cloud registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MIT-SPARK/BUFFER-X (zero-shot point cloud registration, ICCV 2025 /
BUFFER-X++ 2026): adaptive voxelization, FPS keypoints, multi-scale
cylindrical patch descriptors, mutual-nearest matching, SO(2) rotation
regression, cross-scale consensus, massively-parallel RANSAC, IRLS/GNC
refinement — plus a multi-frame pose-graph layer sharded over TPU meshes.

Everything on the device path is static-shape + mask based so it compiles
once under ``jax.jit`` and maps onto the MXU/VPU; scan pairs batch with
``vmap`` and shard across chips with ``shard_map`` over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from bufferx_tpu.config import make_cfg  # noqa: F401
