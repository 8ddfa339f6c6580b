from dmsa_lidar_slam_tpu.utils.dtypes import pose_dtype, point_dtype
