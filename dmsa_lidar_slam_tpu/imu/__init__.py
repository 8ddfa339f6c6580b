from dmsa_lidar_slam_tpu.imu import buffer, preintegration
