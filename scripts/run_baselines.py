"""Run every BASELINE.json config end-to-end and record results.

Writes ``baseline_results.json`` at the repo root:
  1. tinyGrid3D single-agent L2, odometry init
  2. smallGrid3D + cubicle 2-robot synchronous RBCD
  3. sphere2500 5-robot (plain + Nesterov acceleration)
  4. parking-garage + torus3D asynchronous ASAPP, RGD stepsize sweep
  5. tunnels 8-robot GNC-TLS

Optional argv: section numbers to run (e.g. ``python run_baselines.py 4``);
results for re-run sections are merged into the existing json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices

ensure_cpu_devices(8)

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.io.datasets import load_g2o_dataset, load_tunnels
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic
from dpgo_ros_tpu.parallel.asapp import ASAPPEngine
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import (
    AgentConfig,
    InitMethod,
    RobustCostType,
    UpdateRule,
)

RESULTS = {}
_ALL = {1, 2, 3, 4, 5}
for _a in sys.argv[1:]:
    if not (_a.isdigit() and int(_a) in _ALL):
        sys.exit(
            f"run_baselines.py: unrecognized argument {_a!r} — "
            f"pass section numbers from {sorted(_ALL)} (none = all)"
        )
ONLY = {int(a) for a in sys.argv[1:]} or set(_ALL)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def solve(tag, data, cfg, max_iters=None):
    prob = LiftedProblem.from_data(data, r=cfg.relaxation_rank)
    eng = RBCDEngine(prob, cfg)
    t0 = time.time()
    st = eng.initialize()
    f0 = float(st.cost)
    st, info = eng.run(st, max_iters=max_iters)
    T, st = eng.finalize(st)
    out = {
        "init_cost": f0,
        "final_cost": info["final_cost"],
        "iterations": info["iterations"],
        "converged": info["converged"],
        "wall_sec": round(time.time() - t0, 1),
    }
    if "gnc_stats" in info:
        out["gnc_stats"] = info["gnc_stats"]
    RESULTS[tag] = out
    log(f"{tag}: {out}")
    return T, st, eng, prob


# 1 — tinyGrid3D single-agent L2
if 1 in ONLY:
    solve(
        "tinyGrid3D_1robot_L2",
        load_g2o_dataset("tinyGrid3D", num_robots=1),
        AgentConfig(
            num_robots=1,
            local_initialization_method=InitMethod.ODOMETRY,
            relative_change_tolerance=1e-2,
            max_iteration_number=50,
            RTR_gradnorm_tol=0.1,
        ),
    )

# 2 — smallGrid3D + cubicle 2-robot synchronous RBCD
for name, tol in [("smallGrid3D", 1e-2), ("cubicle", 0.5)] if 2 in ONLY else []:
    solve(
        f"{name}_2robot_sync",
        load_g2o_dataset(name, num_robots=2),
        AgentConfig(
            num_robots=2,
            update_rule=UpdateRule.ROUND_ROBIN,
            local_initialization_method=InitMethod.ODOMETRY,
            relative_change_tolerance=tol,
            max_iteration_number=200,
            RTR_gradnorm_tol=0.5,
        ),
    )

# 3 — sphere2500 5-robot demo (plain + accelerated)
for accel in ((False, True) if 3 in ONLY else ()):
    solve(
        f"sphere2500_5robot{'_accel' if accel else ''}",
        load_g2o_dataset("sphere2500", num_robots=5),
        AgentConfig(
            num_robots=5,
            update_rule=UpdateRule.ROUND_ROBIN,
            local_initialization_method=InitMethod.CHORDAL,
            acceleration=accel,
            relative_change_tolerance=0.2,
            max_iteration_number=1000,
            RTR_gradnorm_tol=0.5,
        ),
    )

# 4 — parking-garage + torus3D asynchronous ASAPP: stepsize sweep with the
# O(1/t) decay that removes the bounded-staleness noise ball
# (parallel/asapp.py::_stepsize_at; tight optima: parking-garage 1.2625
# [SE-Sync], torus3D 24227.05 [docs/PERFORMANCE.md golden table])
# parking-garage's optimum is tiny (1.2625) so the movement-based
# termination needs a tighter tol than torus3D to get within a few % of it
# (tol=1e-3 stops at tick ~880 / cost 1.39; tol=1e-4 reaches ~1.28)
for name, sweep, ticks, tol in (
    ("parking-garage", (0.05, 0.1, 0.2), 24000, 1e-4),
    ("torus3D", (0.1, 0.3, 0.5), 6000, 1e-3),
) if 4 in ONLY else ():
    data = load_g2o_dataset(name, num_robots=5)
    prob = LiftedProblem.from_data(data, r=5)
    init_cfg = AgentConfig(
        num_robots=5, asynchronous=True,
        local_initialization_method=InitMethod.CHORDAL,
    )
    st0 = RBCDEngine(prob, init_cfg).initialize()
    f_init = float(quadratic.cost(st0.X, prob.edges))
    best, sweep_log = None, []
    for stepsize in sweep:
        cfg = AgentConfig(
            num_robots=5,
            asynchronous=True,
            RGD_stepsize=stepsize,
            max_delayed_iterations=3,
            asapp_stepsize_decay_ticks=2000,
            local_initialization_method=InitMethod.CHORDAL,
        )
        eng = ASAPPEngine(prob, cfg)
        t0 = time.time()
        st, info = eng.run(st0.X, num_ticks=ticks, chunk=2000, tol=tol)
        f = float(quadratic.cost(st.X, prob.edges))
        sweep_log.append({"stepsize": stepsize, "final_cost": f,
                          "ticks": info["ticks"]})
        log(f"{name} asapp stepsize={stepsize}: {f:.4e} "
            f"({time.time()-t0:.0f}s, ticks={info['ticks']})")
        if best is None or f < best["final_cost"]:
            best = {
                "stepsize": stepsize,
                "init_cost": f_init,
                "final_cost": f,
                "ticks": info["ticks"],
            }
    best["sweep"] = sweep_log
    RESULTS[f"{name}_5robot_asapp"] = best
    log(f"{name}_5robot_asapp best: {best}")

# 5 — tunnels 8-robot GNC, two configs:
# (a) reference dpgo_gnc_demo parity (RoundRobin, 50 inner, 3 resets) — like
#     the reference, this exhausts its 1,598-iteration budget without
#     meeting the rel-change tolerance (the post-reset tail of 398 RoundRobin
#     iterations cannot re-converge from odometry init);
# (b) the TPU-native configuration (colored-parallel rule, no resets,
#     30 inner) — converges inside the same reference budget.
if 5 in ONLY:
    solve(
        "tunnels_8robot_gnc_reference_demo",
        load_tunnels(),
        AgentConfig(
            num_robots=8,
            update_rule=UpdateRule.ROUND_ROBIN,
            local_initialization_method=InitMethod.ODOMETRY,
            robust_cost_type=RobustCostType.GNC_TLS,
            GNC_use_probability=False,
            GNC_barc=3.0,
            robust_opt_num_weight_updates=3,
            robust_opt_num_resets=3,
            robust_opt_inner_iters_per_robot=50,
            relative_change_tolerance=0.2,
            RTR_gradnorm_tol=0.5,
        ),
    )
    solve(
        "tunnels_8robot_gnc",
        load_tunnels(),
        AgentConfig(
            num_robots=8,
            update_rule=UpdateRule.PARALLEL,
            local_initialization_method=InitMethod.ODOMETRY,
            robust_cost_type=RobustCostType.GNC_TLS,
            GNC_use_probability=False,
            GNC_barc=3.0,
            robust_opt_num_weight_updates=3,
            robust_opt_num_resets=0,
            robust_opt_inner_iters_per_robot=30,
            relative_change_tolerance=0.2,
            RTR_gradnorm_tol=0.5,
        ),
    )

_out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "baseline_results.json")
merged = {}
if os.path.exists(_out):
    # always merge: a partial run must never drop sections that didn't run
    with open(_out) as f:
        merged = json.load(f)
merged.update(RESULTS)
with open(_out, "w") as f:
    json.dump(merged, f, indent=1)
log("wrote baseline_results.json")
