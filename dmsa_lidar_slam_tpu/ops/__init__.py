from dmsa_lidar_slam_tpu.ops import voxel, gaussians
