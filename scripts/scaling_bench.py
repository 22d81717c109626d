"""Scaling measurement: SPMD colored-parallel RBCD iterations/s at M mesh
slots (BASELINE.json: iters/s scaling 1→N).

On this machine only ONE real TPU chip is reachable, so true multi-chip
scaling cannot be measured; this script reports (a) per-iteration time of
the SPMD program at M=1 on the real chip, and (b) relative scaling on an
M-device *virtual CPU mesh* (EXP_PLATFORM=cpu) — which validates that the
sharded program's collective/compute structure scales, but shares 2 physical
cores, so CPU numbers are correctness/trend only, not hardware speedups.
"""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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


def measure(num_robots: int, num_devices: int) -> float:
    data = load_g2o_dataset("sphere2500", num_robots=num_robots)
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
    return dt


if __name__ == "__main__":
    avail = len(jax.devices())
    print(f"# backend={plat} devices={avail}", flush=True)
    # fixed dataset (sphere2500), robots = devices = M: strong scaling of
    # the sharded program. A "sweep" = num_colors colored steps (every robot
    # updated once); dataset work per sweep is constant in M, so ideal
    # strong scaling keeps ms/sweep flat as M grows.
    for M in [m for m in (1, 2, 4, 8) if m <= avail]:
        data = load_g2o_dataset("sphere2500", num_robots=max(M, 1))
        prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
        cfg = AgentConfig(
            num_robots=max(M, 1),
            update_rule=UpdateRule.PARALLEL,
            local_initialization_method=InitMethod.ODOMETRY,
            RTR_gradnorm_tol=0.5,
            dtype="float32",
        )
        eng = RBCDEngine(prob, cfg)
        dt = measure(num_robots=max(M, 1), num_devices=M)
        sweep = dt * eng.num_colors
        print(
            f"M={M} (colors={eng.num_colors}): {dt*1e3:8.2f} ms/step  "
            f"{sweep*1e3:8.2f} ms/sweep",
            flush=True,
        )
