"""warpsense_tpu — a TPU-native LiDAR SLAM engine (JAX/XLA/Pallas).

Brand-new implementation of the capabilities of juliangaal/warpsense
(HATSDF-SLAM point-to-TSDF registration + TSDF fusion, F-LOAM-style
featsense odometry, chunked persistent global map), designed TPU-first.
"""
import jax as _jax

# SLAM math (Rodrigues, 6x6 solves, covariance fits) is precision-sensitive;
# the platform default of bf16 matmuls loses ~1e-2 on 3x3 products.  Hot
# kernels that can tolerate bf16 request it explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
