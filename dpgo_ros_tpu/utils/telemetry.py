"""Per-iteration telemetry logging — reference schema parity.

The reference writes per-agent CSV logs with schema
``robot_id, cluster_id, num_active_robots, iteration, num_poses,
bytes_received, iter_time_sec, total_time_sec, rel_change``
(``src/PGOAgentROS.cpp:853-894``, written to
``logs/agent<k>/dpgo_log_<t>.csv``), with event strings ("TERMINATE",
"UPDATE_WEIGHT", "TIMEOUT") interleaved via ``logString``
(``PGOAgentROS.cpp:896-907``).
"""

from __future__ import annotations

import os
import time
from typing import Optional

HEADER = (
    "robot_id,cluster_id,num_active_robots,iteration,num_poses,"
    "bytes_received,iter_time_sec,total_time_sec,rel_change"
)


def public_poses_msg_bytes(num_poses: int, r: int, d: int) -> int:
    """Bytes of one PublicPoses message carrying ``num_poses`` lifted poses.

    Mirrors ``computePublicPosesMsgSize`` (``src/utils.cpp:251-260``):
    per pose one uint32 id + r×(d+1) float64 values, plus fixed header
    (robot_id, cluster_id, destination, instance, iteration, is_auxiliary).
    """
    header = 4 * 5 + 1
    per_pose = 4 + 8 * r * (d + 1) + 8  # id + matrix values + rows/cols
    return header + num_poses * per_pose


class IterationLogger:
    """Per-robot CSV logger with the reference's exact schema + events."""

    def __init__(
        self,
        robot_id: int,
        log_directory: Optional[str],
        cluster_id: int = 0,
    ):
        self.robot_id = robot_id
        self.cluster_id = cluster_id
        self.path: Optional[str] = None
        self._f = None
        self.t_start = time.time()
        if log_directory:
            os.makedirs(log_directory, exist_ok=True)
            self.path = os.path.join(
                log_directory,
                f"dpgo_log_{int(self.t_start)}.csv",
            )
            self._f = open(self.path, "w")
            self._f.write(HEADER + "\n")

    def log_iteration(
        self,
        num_active_robots: int,
        iteration: int,
        num_poses: int,
        bytes_received: int,
        iter_time_sec: float,
        rel_change: float,
    ) -> None:
        if self._f is None:
            return
        total = time.time() - self.t_start
        self._f.write(
            f"{self.robot_id},{self.cluster_id},{num_active_robots},"
            f"{iteration},{num_poses},{bytes_received},"
            f"{iter_time_sec:.6f},{total:.6f},{rel_change:.6e}\n"
        )
        self._f.flush()

    def log_event(self, event: str) -> None:
        """Interleave an event string row (reference ``logString``)."""
        if self._f is None:
            return
        self._f.write(f"{self.robot_id},{event}\n")
        self._f.flush()

    def close(self) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None
