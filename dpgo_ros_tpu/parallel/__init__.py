from dpgo_ros_tpu.parallel.rbcd import RBCDEngine, RBCDState

__all__ = ["RBCDEngine", "RBCDState"]
