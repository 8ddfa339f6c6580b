"""Profile breakdown of the fused per-scan step on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dmsa_lidar_slam_tpu.config import Config
from dmsa_lidar_slam_tpu.io.synthetic import SyntheticSequence
from dmsa_lidar_slam_tpu.pipeline.fused import FusedDmsaSlam

cfg = Config(
    n_clouds=5, num_control_poses=6, max_num_points_per_scan=3000,
    min_dist_ds=2.0, min_dist=0.1, num_iter_sliding_window_optim=10,
    num_iter_keyframe_optim=10, min_num_points_gauss=10,
    min_num_points_gauss_key=10, closest_k_keyframes_as_static_points=3,
    last_n_keyframes_for_optim=50, dist_new_keyframe=1.5, use_imu=True,
    imu_factor_weight_submap=0.001, n_dense=501, static_points_cap=8192,
    scan_cap_factor=1.3, keyframe_points_cap=4096, raw_scan_cap=32768,
)
slam = FusedDmsaSlam(cfg, flush_every=1000)
seq = SyntheticSequence(rng=np.random.default_rng(3), noise_std=0.01)
sweep = seq.sweep

def feed(i, t_imu_from):
    t_end = seq.t_start + (i + 1) * sweep
    ts, acc, gyr = seq.imu_samples(t_imu_from, t_end)
    for j in range(len(ts)):
        slam.process_imu(acc[j], gyr[j], ts[j])
    pts, stamps, rings = seq.scan(i, 20000)
    slam.process_scan(pts, stamps, rings)
    return t_end

t_imu = seq.t_start
for i in range(10):
    t_imu = feed(i, t_imu)
jax.block_until_ready(slam.state)

# steady state: time individual dispatches with blocking
times = []
for i in range(10, 25):
    t0 = time.perf_counter()
    t_imu = feed(i, t_imu)
    jax.block_until_ready(slam.state)
    times.append(time.perf_counter() - t0)
print("per-scan blocked times (ms):", [round(t*1e3,1) for t in times])

# upload cost: same-size pack
pack = np.zeros((slam.shapes.pack_rows, 6), np.float32)
for _ in range(3):
    t0 = time.perf_counter(); d = jax.device_put(pack); jax.block_until_ready(d)
    print("upload %.1f KB: %.1f ms" % (pack.nbytes/1024, (time.perf_counter()-t0)*1e3))

# trivial dispatch round trip
f = jax.jit(lambda x: x + 1)
x = jnp.zeros(8); jax.block_until_ready(f(x))
for _ in range(3):
    t0 = time.perf_counter(); jax.block_until_ready(f(x))
    print("nullary dispatch round trip: %.1f ms" % ((time.perf_counter()-t0)*1e3))
