"""cooper_mapper_tpu — a TPU-native LiDAR SLAM / trajectory-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Cooper
Mapper's LOAM-derived L_SLAM stack (reference: ZhekaiJin/the-Cooper-Mapper):
feature extraction, scan-to-scan and scan-to-map Gauss-Newton solves, cube-grid
map management, pose-graph optimization with loop closure, and UKF-based
IMU/GNSS fusion — batched over thousands of concurrent subproblems and sharded
across TPU meshes.

See SURVEY.md at the repo root for the structural analysis of the reference
and the layer-by-layer parity map.
"""

import jax

# Geometry pipelines need true f32 matmuls: the TPU MXU's default bf16 passes
# lose ~1e-3 absolute on rotation compositions and point distances, which is
# larger than the solvers' convergence thresholds (0.1 deg / 1 mm).  Kernels
# that can tolerate bf16 opt in locally via jax.lax.Precision.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
