from dmsa_lidar_slam_tpu.dmsa import optimizer
