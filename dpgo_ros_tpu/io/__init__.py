from dpgo_ros_tpu.io.g2o import read_g2o, write_g2o
from dpgo_ros_tpu.io.csv_loader import load_measurements_csv, load_multi_robot_csv
from dpgo_ros_tpu.io.partition import partition_g2o, contiguous_partition

__all__ = [
    "read_g2o",
    "write_g2o",
    "load_measurements_csv",
    "load_multi_robot_csv",
    "partition_g2o",
    "contiguous_partition",
]
