"""Benchmark: sphere2500 5-robot synchronous RBCD throughput on TPU.

Headline config = the reference demo (``launch/dpgo_demo.launch``): 5 robots,
sphere2500 (2,500 poses / 4,949 edges), RoundRobin updates, RTR budget
3 outer × 50 tCG iterations, gradnorm tol 0.5, chordal initialization.

Metric: solver block-updates per second — measured over a fixed fused
on-device run (one XLA program, zero host round-trips) using the framework's
TPU-native *colored-parallel* update rule: robots whose blocks share no
edges update simultaneously (a color class's joint Hessian is block-
diagonal, so the masked trust-region solve IS the independent per-robot
block updates — exact block-coordinate descent over color classes). Each
step performs |color class| block updates at the reference's per-update RTR
budget. The sequential RoundRobin mode (reference parity) is reported on
stderr.

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


def _measure(rule, num_iters):
    """Timed fused run. Returns DEVICE scalars for everything read later:
    on this tunneled runtime the first device-to-host transfer permanently
    degrades every subsequent device sync in the process from ~0.1 ms to
    ~26 ms (measured round 4, docs/PERFORMANCE.md), so all d2h reads are
    deferred to after the LAST timed region."""
    data = load_g2o_dataset("sphere2500", num_robots=5)
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=5,
        update_rule=rule,
        # chordal init = the reference demo config (dpgo_demo.launch:9);
        # its per-robot-shape compiles are one-time and persistently cached
        local_initialization_method=InitMethod.CHORDAL,
        relative_change_tolerance=0.0,  # fixed-length run for clean timing
        max_iteration_number=num_iters,
        RTR_iterations=3,
        RTR_tCG_iterations=50,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    run = eng.make_fused_run(num_iters)
    warm = run(st)
    warm.cost.block_until_ready()
    # best-of-3: the whole solve is sub-millisecond, so single-shot wall
    # timing through the tunnel jitters ±30%
    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = run(st)
        out.cost.block_until_ready()
        dt = min(dt, time.time() - t0)
    return eng, st, out, dt


def _finish(eng, st, out, dt, rule):
    """Host-side reads — only called after every timed region is done."""
    import numpy as np

    f_init = float(st.cost)
    steps = int(out.iteration)
    if rule == UpdateRule.PARALLEL:
        sizes = np.bincount(eng.robot_colors, minlength=eng.num_colors)
        updates = int(
            sum(sizes[s % eng.num_colors] for s in range(steps))
        )
    else:
        updates = steps
    return updates, steps, dt, f_init, float(out.cost)


def main():
    log(f"backend={platform} devices={jax.devices()}")
    # reference-parity sequential mode (stderr diagnostic)
    res_s = _measure(UpdateRule.ROUND_ROBIN, NUM_ITERS)
    # headline: colored-parallel (TPU-native mode)
    res_p = _measure(UpdateRule.PARALLEL, NUM_ITERS)
    upd_s, steps_s, dt_s, fi_s, ff_s = _finish(*res_s, UpdateRule.ROUND_ROBIN)
    log(
        f"RoundRobin: {upd_s} updates in {dt_s:.3f}s "
        f"({upd_s/dt_s:.1f}/s) cost {fi_s:.1f} -> {ff_s:.1f}"
    )
    updates, steps, dt, f_init, f_final = _finish(
        *res_p, UpdateRule.PARALLEL
    )
    iters_per_sec = updates / dt
    print(
        f"# platform={platform} parallel: steps={steps} updates={updates} "
        f"time={dt:.3f}s cost {f_init:.1f} -> {f_final:.1f}",
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
