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
    # large banded worlds route through the HBM windowed kernel, which
    # serves sequential rules (a color class is not one contiguous
    # window); small worlds keep the colored-parallel VMEM path
    rule = UpdateRule.PARALLEL if n <= 16000 else UpdateRule.ROUND_ROBIN
    cfg = AgentConfig(
        num_robots=num_robots,
        update_rule=rule,
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

    # round-5 methodology: chained DISTINCT-input solves (gauge-rotated
    # by a scalar of the previous solve's output — a strict data
    # dependency), one sync at the end. Identical-re-execution timing is
    # served from somewhere cheaper by this runtime (docs/PERFORMANCE.md
    # round 5) and was retracted.
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import make_perturb

    perturb = make_perturb(prob.r)
    out, tcg = call(st)
    sig = jnp.sum(out.X[:, 0, 0])
    st_w = st._replace(X=perturb(st.X, sig, np.float32(0.5)))
    out_w, _ = call(st_w)
    out_w.X.block_until_ready()
    K = 6
    cur = st
    tcgs = []
    t0 = time.time()
    for i in range(K):
        out, tcg = call(cur)
        tcgs.append(tcg)
        if i < K - 1:
            sig = jnp.sum(out.X[:, 0, 0])
            cur = st._replace(
                X=perturb(st.X, sig, np.float32(i + 1.0))
            )
    out.X.block_until_ready()
    dt = (time.time() - t0) / K
    steps = int(out.iteration)
    if tcg is not None:
        tcg_total = int(np.mean([int(np.asarray(t)) for t in tcgs]))
    if rule == UpdateRule.PARALLEL:
        sizes = np.bincount(eng.robot_colors, minlength=eng.num_colors)
        updates = int(sum(sizes[s % eng.num_colors] for s in range(steps)))
    else:
        updates = steps
    ups = updates / dt
    # the HBM-routed runner carries a stale cost (its stats are local
    # window restrictions) — recompute the final cost globally
    from dpgo_ros_tpu.ops import quadratic

    f_final = float(quadratic.cost(out.X, prob.edges))
    log(
        f"n={n} R={num_robots}: {steps} steps ({updates} updates, "
        f"tcg={tcg_total}) in "
        f"{dt:.3f}s/solve = {ups:.1f} updates/s; cost "
        f"{float(st.cost):.3e} -> "
        f"{f_final:.3e}; n_pad={eng._kg.n_pad} "
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
        "final_cost": f_final,
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
        "note": "fused engine run (colored-parallel; ROUND_ROBIN via the HBM windowed kernel for n > 16k), reference RTR budget, chained distinct-input timing, "
                "fp32, one v5e chip; worlds from io/synthetic.py",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["scale_bench_synthetic_sphere"]))


if __name__ == "__main__":
    main()
