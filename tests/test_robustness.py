"""Failure-handling tests: NaN scans, mid-sequence IMU dropout, empty scans.

Mirrors the reference's defensive behaviors (SURVEY §5): NaN guard in the
optimizer (DmsaOptimizer.h:116-122), graceful IMU dropout via the
recievedImuData reset (DmsaSlam.h:203,426), plus stronger input hygiene the
reference lacks.
"""

import numpy as np
import pytest

from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

from tests.test_pipeline import small_config


@pytest.mark.slow
def test_nan_points_do_not_poison(tmp_path):
    cfg = small_config(use_imu=False)
    slam = FusedDmsaSlam(cfg, flush_every=4)
    seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.01, room_scale=0.45)
    for i in range(10):
        pts, stamps, rings = seq.scan(i, 700)
        if i in (4, 7):  # corrupt some points
            pts = pts.copy()
            pts[::13] = np.nan
        slam.process_scan(pts, stamps, rings)
    slam._flush_events()
    assert slam.kf_count >= 1
    # the live estimate stays finite
    ow = np.array(slam.state.ow_transl)
    assert np.all(np.isfinite(ow))
    transl = np.array(slam.state.kf.transl_w)[: slam.kf_count]
    assert np.all(np.isfinite(transl))


@pytest.mark.slow
def test_imu_dropout_mid_sequence():
    """IMU present initially, drops out, comes back — the window falls back
    to no-IMU gains per scan (DmsaSlam.h:455-466 semantics)."""
    cfg = small_config(use_imu=True, imu_factor_weight_submap=0.001)
    slam = FusedDmsaSlam(cfg, flush_every=4)
    seq = SyntheticSequence(rng=np.random.default_rng(9), noise_std=0.01, room_scale=0.45)
    imu_cursor = seq.t_start - 0.2
    for i in range(12):
        t_end = seq.t_start + (i + 1) * seq.sweep
        if not (5 <= i <= 7):  # dropout scans 5..7
            ts, acc, gyr = seq.imu_samples(imu_cursor, t_end)
            for j in range(len(ts)):
                slam.process_imu(acc[j], gyr[j], ts[j])
        imu_cursor = t_end
        slam.process_scan(*seq.scan(i, 700))
    assert slam.config.use_imu  # not permanently disabled
    ow = np.array(slam.state.ow_transl)
    assert np.all(np.isfinite(ow))
