"""Pure-JAX Lie group layer (SO3 / SE3 / Sim3).

Replaces the reference's lietorch C++/CUDA extension
(dpvo/lietorch/src/*.cpp,*.cu) with jnp quaternion math: no kernels
needed — every op is a handful of fused elementwise expressions that
XLA vectorizes onto the VPU, and autodiff provides gradients the
reference had to hand-register per op (dpvo/lietorch/group_ops.py).
"""

from dpvo_tpu.lie import se3, sim3, so3  # noqa: F401
