from dpgo_ros_tpu.ops import lie, stiefel, quadratic, chordal, rounding

__all__ = ["lie", "stiefel", "quadratic", "chordal", "rounding"]
