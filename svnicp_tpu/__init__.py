"""svnicp_tpu — a TPU-native Stein Variational Newton ICP LiDAR-inertial odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
SVN-ICP system (a ROS2 C++/CUDA/libtorch LIO stack):

- ``core.geometry``     batched SO(3)/SE(3) Lie ops (exp/log/left-Jacobian, Euler)
- ``core.pointcloud``   fixed-capacity padded clouds: crop / downsample / deskew
- ``core.residuals``    robust point-to-point residuals, block-structured J/H/b
- ``core.svn``          Stein Variational Newton ICP (vmapped Gauss-Newton + RBF coupling)
- ``core.svgd``         SVGD-ICP (Euler parameterization + optax optimizers)
- ``core.voxmap``       device-resident voxel-hash local map (sorted-key table)
- ``core.eskf``         15-state error-state Kalman filter
- ``core.imu``          strapdown IMU mechanization
- ``core.segmentation`` range-image ground removal + connected components
- ``kernels``           Pallas TPU kernels + jnp reference oracles (KNN / 1-NN)
- ``runtime``           host pipeline driver, buffers, pose graph, profiling
- ``parallel``          device mesh sharding of particles / points / map blocks
- ``io``                dataset readers, metrics (ATE/RPE), structured records

The compute path is pure JAX (jit/vmap/shard_map); nothing in this package
depends on ROS, PCL, GTSAM, or torch.
"""

from svnicp_tpu import config as config  # noqa: F401

__version__ = "0.1.0"
