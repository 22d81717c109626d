"""Multi-host (multi-process) SPMD path — SURVEY.md §7 step 8.

The reference scales robot count by adding ROS processes on a network
(`/root/reference/src/PGOAgentROS.cpp:45-82`); here the same shard_map
program spans hosts: 2 CPU processes × 4 virtual devices = one global
8-device mesh with Gloo collectives standing in for DCN. Launches
``scripts/multihost_demo.py`` as real subprocesses (jax.distributed
requires one process per host) and checks the processes rendezvous,
descend, and agree bit-exactly on the converged cost.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_demo.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_agrees_and_descends(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # children pick their own virtual-device flags; drop this process's
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    SCRIPT,
                    "--num_processes",
                    "2",
                    "--process_id",
                    str(pid),
                    "--coordinator",
                    f"localhost:{port}",
                    "--steps",
                    "12",
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                env=env,
                text=True,
            )
        )
    results = {}
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc {pid} failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("MULTIHOST_RESULT")]
        assert line, f"no result line from proc {pid}:\n{out[-2000:]}"
        results[pid] = json.loads(line[0].split(" ", 1)[1])

    r0, r1 = results[0], results[1]
    assert r0["global_devices"] == 8 and r0["num_processes"] == 2
    # both processes observe the identical global state (bit-exact SPMD)
    assert r0["final_cost"] == r1["final_cost"]
    assert r0["init_cost"] == r1["init_cost"]
    # and the distributed solve actually descends substantially
    assert r0["final_cost"] < 0.1 * r0["init_cost"]
