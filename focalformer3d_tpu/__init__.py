"""focalformer3d_tpu: a TPU-native (JAX/XLA/Pallas/pjit) 3D detection framework.

Re-implements the full capability surface of NVlabs/FocalFormer3D (LiDAR,
camera, and LiDAR+camera 3D detection on nuScenes/Waymo with Hard Instance
Probing and a box-level deformable transformer decoder) as fixed-shape XLA
computations and Pallas kernels.  Nothing here is a translation of the
reference's CUDA/torch code: voxelization, sparse 3D convolution, BEV pooling,
deformable attention, rotated NMS and Hungarian matching are all re-designed
for the TPU compilation model (static shapes, masked padding, sort/segment
primitives, MXU-major matmuls).
"""

__version__ = "0.1.0"
