"""Checkpoint/resume: a resumed run must continue bit-compatibly enough to
produce the same keyframes as an uninterrupted run."""

import numpy as np

from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.pipeline.checkpoint import load_checkpoint, save_checkpoint
from dmsa_lidar_slam_tpu.pipeline.slam import DmsaSlam

from tests.test_pipeline import run_sequence, small_config


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_config(use_imu=False)
    slam = DmsaSlam(cfg)
    seq = SyntheticSequence(rng=np.random.default_rng(5), noise_std=0.01, room_scale=0.45)
    run_sequence(slam, seq, n_scans=6, pts=700, use_imu=False)

    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(slam, ckpt)

    slam2 = DmsaSlam(small_config(use_imu=False))
    load_checkpoint(slam2, ckpt)

    assert slam2.kf_map.count == slam.kf_map.count
    np.testing.assert_allclose(slam2.kf_map.transl_w, slam.kf_map.transl_w, atol=0)
    np.testing.assert_allclose(slam2.kf_map.local_pts, slam.kf_map.local_pts, atol=0)
    assert slam2.scan_updates == slam.scan_updates
    assert slam2.output.order_is_key == slam.output.order_is_key
    assert len(slam2.scan_buffer) == len(slam.scan_buffer)
    if slam.old_window is not None:
        np.testing.assert_allclose(
            slam2.old_window.transl_w, slam.old_window.transl_w, atol=0
        )

    # both must continue processing without errors and stay in sync on
    # keyframe count
    seq2a = SyntheticSequence(rng=np.random.default_rng(99), noise_std=0.01, room_scale=0.45)
    seq2b = SyntheticSequence(rng=np.random.default_rng(99), noise_std=0.01, room_scale=0.45)
    # continue from where the first left off (scan indices continue)
    for i in range(6, 9):
        pts_a = seq2a.scan(i, 700)
        pts_b = seq2b.scan(i, 700)
        slam.process_scan(*pts_a)
        slam2.process_scan(*pts_b)
    assert slam2.kf_map.count == slam.kf_map.count
