"""dmsa_lidar_slam_tpu — a TPU-native LiDAR-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas implementation of Dense Multi Scan Adjustment
(DMSA) LiDAR-inertial odometry and global optimization, with the same
capabilities as the reference C++/ROS implementation
(davidskdds/DMSA_LiDAR_SLAM, ICRA 2024) but designed TPU-first:

- state lives in fixed-shape padded arrays (SoA) so jit caches hold,
- voxel binning / Gaussian-cell statistics run as sort + segment_sum on device,
- Gauss-Newton uses autodiff (jacfwd) instead of numeric forward differences,
- the 9-candidate line search is one vmapped evaluation,
- multi-chip scaling shards points / keyframes over a `jax.sharding.Mesh`
  with `psum` reductions of the small (P x P) Gauss-Newton system.

Subpackages
-----------
core        rotations, pose chains, barycentric-rational + slerp interpolation
ops         voxel hashing, downsampling, Gaussian cell statistics, kNN
imu         IMU buffer and on-manifold preintegration (Forster RSS'15)
trajectory  continuous-time sliding-window trajectory (dense pose table)
dmsa        the generic DMSA Gauss-Newton optimizer + problem adapters
map         keyframe ring-buffer map, normals, static-point selection
pipeline    the SLAM orchestrator, output ledger, metrics, checkpointing
io          sensor decoding (rosbag1 / PCD), C++ fast path via ctypes
parallel    device meshes, sharded Gauss-Newton, distributed keyframe adjust
"""

import os

# Pose / IMU math follows the reference's use of double precision
# (reference: include/DMSA/Poses.h, ImuPreintegration.h use Eigen doubles).
# Points stay float32.  x64 must be enabled before any jax import downstream.
if os.environ.get("DMSA_DISABLE_X64", "0") != "1":
    import jax

    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bf16 multiplies for f32 inputs; pose math (axis-angle
# chains, preintegration, barycentric weights) needs true f32 — the bf16
# default measurably degrades the estimator (keyframe storms on TPU that
# never appear on CPU).  The hot matmuls here are 3x3-batched, so the full-
# precision passes cost nothing.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the pipeline compiles ~8 large graphs; with
# the cache, later processes (benchmarks, production restarts) skip the
# multi-minute cold start entirely.
if os.environ.get("DMSA_DISABLE_COMPILE_CACHE", "0") != "1":
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DMSA_COMPILE_CACHE_DIR", os.path.expanduser("~/.dmsa_jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dmsa_lidar_slam_tpu.config import Config, load_config  # noqa: E402,F401


def __getattr__(name):
    """Lazy top-level API (avoids importing jax-heavy modules eagerly)."""
    if name == "DmsaSlam":
        from dmsa_lidar_slam_tpu.pipeline.slam import DmsaSlam

        return DmsaSlam
    if name == "FusedDmsaSlam":
        from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

        return FusedDmsaSlam
    raise AttributeError(name)


__version__ = "0.1.0"
