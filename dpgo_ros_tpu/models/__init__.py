from dpgo_ros_tpu.models.problem import LiftedProblem

__all__ = ["LiftedProblem"]
