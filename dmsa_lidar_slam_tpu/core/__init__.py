from dmsa_lidar_slam_tpu.core import rotations, poses, interpolation
