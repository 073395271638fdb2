"""videoloop3d_tpu — a TPU-native framework for 3D video loops.

Re-implements the full capability surface of limacv/VideoLoop3D
("3D Video Loops from Asynchronous Input", CVPR 2023) with a design built
for TPUs: JAX/XLA for the compute path (per-plane homography plane-sweep
rendering instead of CUDA mesh rasterization, MXU-batched patch
nearest-neighbor search for the looping loss), `jax.sharding` meshes for
scale-out, and a C++ host-side reference rasterizer for golden tests.
"""

__version__ = "0.1.0"
