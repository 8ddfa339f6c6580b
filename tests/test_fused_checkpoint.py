"""Fused-pipeline checkpoint/resume round trip."""

import numpy as np

import jax

from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.pipeline.checkpoint import (
    load_fused_checkpoint,
    save_fused_checkpoint,
)
from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

from tests.test_fused import run_sequence
from tests.test_pipeline import small_config


def test_fused_checkpoint_roundtrip(tmp_path):
    cfg = small_config(use_imu=False)
    slam = FusedDmsaSlam(cfg, flush_every=4)
    seq = SyntheticSequence(rng=np.random.default_rng(5), noise_std=0.01, room_scale=0.45)
    run_sequence(slam, seq, n_scans=8, pts=700, use_imu=False)

    path = str(tmp_path / "fused.npz")
    save_fused_checkpoint(slam, path)

    slam2 = FusedDmsaSlam(small_config(use_imu=False), flush_every=4)
    load_fused_checkpoint(slam2, path)

    assert slam2.kf_count == slam.kf_count
    for l1, l2 in zip(jax.tree.leaves(slam.state), jax.tree.leaves(slam2.state)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert slam2.scan_counter == slam.scan_counter
    assert slam2._stamp_base == slam._stamp_base
    s1 = slam.keyframe_poses()[0]
    s2 = slam2.keyframe_poses()[0]
    np.testing.assert_array_equal(s1, s2)
    assert slam2.output.order_is_key == slam.output.order_is_key

    # both continue identically (same inputs -> same keyframe counts)
    seq_a = SyntheticSequence(rng=np.random.default_rng(77), noise_std=0.01, room_scale=0.45)
    seq_b = SyntheticSequence(rng=np.random.default_rng(77), noise_std=0.01, room_scale=0.45)
    for i in range(8, 11):
        slam.process_scan(*seq_a.scan(i, 700))
        slam2.process_scan(*seq_b.scan(i, 700))
    assert slam2.kf_count == slam.kf_count
