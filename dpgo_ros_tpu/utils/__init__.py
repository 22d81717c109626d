from dpgo_ros_tpu.utils.config import AgentConfig

__all__ = ["AgentConfig"]
