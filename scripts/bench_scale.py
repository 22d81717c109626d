"""Production-scale single-chip benchmark: fused RTR block solves on
synthetic worlds far beyond the bundled datasets (VMEM-resident up to
~50k poses on one v5e).

The reference's largest dataset is cubicle (5,750 poses); the synthetic
sphere world scales the same banded structure to arbitrary n. Measures
device time per full-budget block solve (R-sweep slope, chordal init —
same methodology as scripts/roofline.py) and block updates/s at the
reference budget for the colored-parallel engine run.

Appends ``scale_bench`` rows to baseline_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dpgo_ros_tpu.io.synthetic import generate_world
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def bench(n, num_robots, iters=60):
    data, T_gt, _ = generate_world(
        "sphere", n=n, num_robots=num_robots, rot_noise=0.01,
        trans_noise=0.05, seed=0,
    )
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=num_robots,
        update_rule=UpdateRule.PARALLEL,
        local_initialization_method=InitMethod.ODOMETRY,
        relative_change_tolerance=0.0,
        max_iteration_number=iters,
        RTR_iterations=3,
        RTR_tCG_iterations=50,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    assert eng._use_fused, "fused kernel unavailable (not on TPU?)"
    st = eng.initialize()
    # work-normalized reporting (round 5): the in-kernel tCG counter
    # rides along where the runner supports it
    tcg_total = None
    try:
        run = eng.make_fused_run(iters, return_stats=True)

        def call(s):
            return run(s)
    except ValueError:
        base = eng.make_fused_run(iters)

        def call(s):
            return base(s), None

    out, tcg = call(st)
    out.cost.block_until_ready()
    t0 = time.time()
    out, tcg = call(st)
    out.cost.block_until_ready()
    dt = time.time() - t0
    steps = int(out.iteration)
    if tcg is not None:
        tcg_total = int(tcg)
    sizes = np.bincount(eng.robot_colors, minlength=eng.num_colors)
    updates = int(sum(sizes[s % eng.num_colors] for s in range(steps)))
    ups = updates / dt
    log(
        f"n={n} R={num_robots}: {steps} steps ({updates} updates, "
        f"tcg={tcg_total}) in "
        f"{dt:.3f}s = {ups:.1f} updates/s; cost {float(st.cost):.3e} -> "
        f"{float(out.cost):.3e}; n_pad={eng._kg.n_pad} "
        f"E_loop={eng._kg.E_loop} diags={eng._kg.diags2}"
    )
    return {
        "n": n,
        "num_robots": num_robots,
        "steps": steps,
        "block_updates_per_sec": ups,
        "tcg_iters": tcg_total,
        "tcg_iters_per_sec": (
            round(tcg_total / dt, 1) if tcg_total else None
        ),
        "ms_per_step": dt / steps * 1e3,
        "final_cost": float(out.cost),
        "n_pad": eng._kg.n_pad,
        "E_loop_onehot": eng._kg.E_loop,
    }


def main():
    log(f"backend={jax.default_backend()}")
    rows = []
    for n, R in ((2500, 5), (10000, 8), (25000, 10), (50000, 16)):
        try:
            rows.append(bench(n, R))
        except Exception as exc:  # VMEM ceiling, etc. — record honestly
            log(f"n={n} FAILED: {type(exc).__name__}: {str(exc)[:200]}")
            rows.append({"n": n, "num_robots": R,
                         "error": str(exc)[:300]})
            break

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline_results.json",
    )
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results["scale_bench_synthetic_sphere"] = {
        "note": "fused colored-parallel engine run, reference RTR budget, "
                "fp32, one v5e chip; worlds from io/synthetic.py",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["scale_bench_synthetic_sphere"]))


if __name__ == "__main__":
    main()
