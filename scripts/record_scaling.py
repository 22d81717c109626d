"""Record scaling measurements into SCALING_r02.json (VERDICT r1 item #4).

What is measurable on this machine and what is not:

* ONE real TPU chip is reachable (tunneled). True multi-chip ICI scaling
  cannot be measured; we record the real-chip SPMD per-step/per-sweep time
  (the 1-chip anchor of BASELINE.json's "iters/s at 1 chip / 1 host / N
  hosts").
* The host has **2 physical CPU cores**. Virtual-device meshes
  (``xla_force_host_platform_device_count``) and multi-process (Gloo) runs
  validate the *program structure* — collective layout, process-contiguous
  sharding, bit-exact agreement — but share those 2 cores, so wall-clock
  "efficiency" on them measures core oversubscription, not interconnect
  scaling. We record them anyway, labeled as such.
* For the N-chip projection we record the measured communication volume of
  the separator all_gather together with the measured per-step compute time,
  and evaluate the standard overlap-free efficiency model
  eff(N) = t_comp / (t_comp + V(N)/BW) at a range of link bandwidths —
  the quantified "where the all_gather bound bites" analysis.

Usage:
  EXP_PLATFORM=cpu python scripts/record_scaling.py   # CPU virtual meshes + multihost
  python scripts/record_scaling.py                    # real-TPU single-chip anchor
Each invocation merges its section into SCALING_r02.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_r02.json")

if os.environ.get("EXP_PLATFORM", "tpu") == "cpu":
    from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices

    ensure_cpu_devices(int(os.environ.get("EXP_DEVICES", "8")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

plat = jax.default_backend()
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/jax_cache_cpu" if plat == "cpu" else "/tmp/jax_cache_tpu",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.parallel.spmd import ShardedProblem, build_spmd_step
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule

NUM_ITERS = 30


def _load():
    try:
        return json.load(open(OUT))
    except Exception:
        return {}


def _save(d):
    json.dump(d, open(OUT, "w"), indent=2)
    print("wrote", OUT)


def measure_spmd(num_robots: int, num_devices: int):
    """(ms/step, num_colors, separator-exchange bytes/step) for sphere2500."""
    from dpgo_ros_tpu.parallel.spmd import group_robots

    data = load_g2o_dataset("sphere2500", num_robots=num_robots)
    # separator volume is a property of the ROBOT partition (what a real
    # num_robots-chip mesh would exchange), independent of how many mesh
    # slots this host can time on
    prob_full = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    n_sep = int(np.sum(np.asarray(prob_full.separator_mask(jnp.float32)) > 0))
    if num_robots > num_devices:
        data = group_robots(data, num_devices)
        num_robots = num_devices
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=num_robots,
        update_rule=UpdateRule.PARALLEL,
        local_initialization_method=InitMethod.ODOMETRY,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    st0 = eng.initialize()
    sp = ShardedProblem.build(
        prob, np.asarray(st0.X, np.float32), eng.robot_colors,
        num_devices=num_devices,
    )
    mesh = Mesh(np.array(jax.devices()[:num_devices]), ("robots",))
    st, step = build_spmd_step(sp, mesh, cfg)
    st = step(np.int32(0), np.int32(0), st)
    st.X.block_until_ready()
    t0 = time.time()
    for it in range(1, NUM_ITERS + 1):
        st = step(np.int32(it), np.int32(0), st)
    st.X.block_until_ready()
    dt = (time.time() - t0) / NUM_ITERS
    # separator all_gather volume per step: every device contributes its
    # padded separator block; all_gather delivers (N-1)/N of the total to
    # each chip.
    state_bytes = prob.r * (prob.d + 1) * 4
    vol = n_sep * state_bytes  # one full separator set, fp32
    return dt, eng.num_colors, vol, n_sep


def run_multihost(num_processes: int, steps: int = 24):
    """steps/s across P CPU processes × 4 virtual devices (Gloo)."""
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    port = 12410 + num_processes
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "scripts/multihost_demo.py",
             "--coordinator", f"localhost:{port}",
             "--num_processes", str(num_processes),
             "--process_id", str(pid),
             "--steps", str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    res = []
    for o in outs:
        for line in o.splitlines():
            if line.startswith("MULTIHOST_RESULT"):
                res.append(json.loads(line.split(" ", 1)[1]))
    assert len(res) == num_processes, f"got {len(res)} results: {outs}"
    elapsed = max(r["elapsed_s"] for r in res)
    assert all(r["final_cost"] == res[0]["final_cost"] for r in res)
    return {"processes": num_processes, "steps": res[0]["steps"],
            "elapsed_s": round(elapsed, 3),
            "steps_per_s": round(res[0]["steps"] / elapsed, 3),
            "final_cost": res[0]["final_cost"]}


def main():
    doc = _load()
    doc.setdefault("dataset", "sphere2500, 5 robots, colored-parallel SPMD")
    doc.setdefault("caveats", {
        "hardware": "one tunneled TPU v5e chip; 2 physical CPU cores",
        "cpu_numbers": "virtual devices / processes share 2 cores — they "
        "validate the sharded program structure, not interconnect scaling",
    })
    avail = len(jax.devices())
    if plat == "cpu":
        rows = []
        for M in (1, 2, 4, 8):
            if M > avail:
                continue
            dt, colors, vol, n_sep = measure_spmd(max(M, 1), M)
            rows.append({
                "devices": M, "colors": colors,
                "ms_per_step": round(dt * 1e3, 2),
                "ms_per_sweep": round(dt * colors * 1e3, 2),
            })
            print(rows[-1], flush=True)
        doc["cpu_virtual_mesh"] = rows
        mh = []
        for P in (1, 2, 4):
            try:
                mh.append(run_multihost(P))
                print(mh[-1], flush=True)
            except Exception as ex:  # oversubscription can starve Gloo
                mh.append({"processes": P, "error": str(ex)[:200]})
        doc["multihost_cpu_gloo"] = mh
    else:
        dt, colors, vol, n_sep = measure_spmd(5, 1)
        doc["tpu_single_chip"] = {
            "devices": 1, "colors": colors,
            "ms_per_step": round(dt * 1e3, 2),
            "ms_per_sweep": round(dt * colors * 1e3, 2),
            "block_updates_per_s": round(5 / (dt * colors), 1),
        }
        print(doc["tpu_single_chip"], flush=True)
        # analytic all_gather model at the measured compute time
        t_comp = dt
        model = []
        for bw_gbs in (25, 100, 400):
            t_comm = vol / (bw_gbs * 1e9)
            model.append({
                "link_GBps": bw_gbs,
                "allgather_bytes_per_step": vol,
                "separator_poses": n_sep,
                "t_comm_us": round(t_comm * 1e6, 1),
                "efficiency_no_overlap": round(
                    t_comp / (t_comp + t_comm), 4),
            })
        doc["n_chip_projection"] = {
            "note": "eff = t_comp/(t_comp + V/BW); V is the full separator "
            "set (upper bound: all_gather delivers (N-1)/N of V per chip). "
            "Compute time from the measured single-chip step.",
            "t_comp_ms": round(t_comp * 1e3, 3),
            "rows": model,
        }
        print(doc["n_chip_projection"], flush=True)
    _save(doc)


if __name__ == "__main__":
    main()
