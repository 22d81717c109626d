"""SPMD mesh step rate: per-step program vs in-kernel multi-step stretch.

VERDICT r4 #2: the round-4 multi-step kernel only served the single-device
engine; the mesh program still launched one kernel per scheduled step with
all the per-launch overhead (on this tunneled runtime a Mosaic call inside
a jitted program costs a fixed ~50 ms — docs/PERFORMANCE.md round 4).
Round 5 runs S solver steps INSIDE one kernel launch per mesh slot
(``spmd_steps_per_launch``), exchanging separators between launches.

Two configurations measured, matching the stretch-mode semantics
(parallel/spmd.py):

  * M=1 (grouped sphere2500 on the one real chip): RTR stretches are
    EXACT — the slot's own block is the whole gathered state, nothing is
    stale. This is the flagship single-chip mesh config.
  * M=8 virtual CPU mesh (smallGrid3D, 8 robots): RGD-tick stretches
    (``spmd_stretch_rgd_stepsize``) — the staleness-robust ASAPP rule
    (full block solves against stale separators diverge; measured round 5).

Timing: launches chain through the state (natural data dependency), one
``block_until_ready`` at the end; all host reads deferred past the timed
regions. Writes SPMD_STRETCH_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

# this host injects a TPU PJRT plugin via sitecustomize that overrides
# JAX_PLATFORMS; honor a virtual-host-device request in-process
if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

platform = jax.default_backend()
cache = "/tmp/jax_cache_tpu" if platform != "cpu" else "/tmp/jax_cache_cpu"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.parallel.spmd import (
    ShardedProblem,
    build_spmd_step,
    gather_trajectory,
    group_robots,
)
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build(dataset, num_robots, num_devices, S, rgd, total_iters):
    data = load_g2o_dataset(dataset, num_robots=num_robots)
    if num_devices < num_robots:
        data = group_robots(data, num_devices)
        num_robots = num_devices
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=num_robots,
        update_rule=UpdateRule.PARALLEL,
        local_initialization_method=InitMethod.CHORDAL,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
        use_fused_kernel=True,
        spmd_steps_per_launch=S,
        spmd_stretch_rgd_stepsize=rgd,
    )
    eng = RBCDEngine(prob, cfg)
    st0 = eng.initialize()
    sp = ShardedProblem.build(
        prob, np.asarray(st0.X, np.float32), eng.robot_colors,
        num_devices=num_devices,
    )
    mesh = Mesh(np.array(jax.devices()[:num_devices]), ("robots",))
    init, step = build_spmd_step(sp, mesh, cfg)
    return prob, eng, st0, sp, init, step


def measure(dataset, num_robots, num_devices, S, rgd, total_iters):
    prob, eng, st0, sp, init, step = build(
        dataset, num_robots, num_devices, S, rgd, total_iters
    )
    launches = max(1, total_iters // S)
    # warm
    st = step(np.int32(0), np.int32(0), init)
    st.X.block_until_ready()
    # timed: launches chain through the state. On the virtual CPU mesh,
    # sync every launch — 8 rendezvous threads on 2 cores deadlock the
    # in-process all_gather when long unsynced dispatch chains queue up.
    sync_every = platform == "cpu"
    st = init
    t0 = time.perf_counter()
    for lt in range(launches):
        st = step(np.int32(lt), np.int32(0), st)
        if sync_every:
            st.X.block_until_ready()
    st.X.block_until_ready()
    dt = time.perf_counter() - t0
    iters = launches * S
    Xg = gather_trajectory(sp, st, prob.num_poses)
    f = float(quadratic.cost(jnp.asarray(Xg), eng._edges(st0.weights)))
    return {
        "S": S,
        "rgd_stepsize": rgd,
        "launches": launches,
        "solver_iters": iters,
        "wall_s": round(dt, 4),
        "ms_per_iter": round(dt / iters * 1e3, 4),
        "ms_per_launch": round(dt / launches * 1e3, 4),
        "iters_per_sec": round(iters / dt, 2),
        "final_cost": round(f, 2),
    }


def main():
    out = {"platform": platform, "configs": {}}
    if platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            log("need XLA_FLAGS=--xla_force_host_platform_device_count=8")
    if platform != "cpu":
        # flagship single-chip mesh: grouped sphere2500, M=1 (exact RTR).
        # 256 iterations so the one-time end-of-region sync (~26 ms on
        # this runtime after gather poisoning) amortizes out of the rate.
        rows = []
        for S in (1, 16, 64, 128):
            r = measure("sphere2500", 5, 1, S, None, 256)
            log(f"M=1 sphere2500 RTR S={S}: {r}")
            rows.append(r)
        out["configs"]["sphere2500_M1_rtr"] = rows
        base = rows[0]["ms_per_iter"]
        best = min(r["ms_per_iter"] for r in rows)
        out["configs"]["sphere2500_M1_speedup"] = round(base / best, 2)
    else:
        # virtual 8-device mesh: RGD stretches (staleness-robust)
        rows = []
        for S, rgd in ((1, None), (16, 0.2), (64, 0.2)):
            r = measure("smallGrid3D", 8, 8, S, rgd, 128)
            log(f"M=8 smallGrid3D S={S} rgd={rgd}: {r}")
            rows.append(r)
        out["configs"]["smallGrid3D_M8"] = rows
        base = rows[0]["ms_per_iter"]
        best = min(r["ms_per_iter"] for r in rows[1:])
        out["configs"]["smallGrid3D_M8_speedup"] = round(base / best, 2)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SPMD_STRETCH_r05.json",
    )
    # merge with any previous platform's rows
    if os.path.exists(path):
        try:
            prev = json.load(open(path))
            prev.get("configs", {}).update(out["configs"])
            prev["platform"] = f"{prev.get('platform')}+{platform}"
            out = prev
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {path}")
    print(json.dumps(out["configs"], indent=1))


if __name__ == "__main__":
    main()
