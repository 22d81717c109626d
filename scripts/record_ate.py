"""ATE parity at demo scale (VERDICT r1 #7) → ATE_r02.json.

BASELINE target: "match reference trajectories within ATE bound". The
reference publishes no ATE numbers (SURVEY.md §6), so the oracle is our own
tight centralized solve (the same comparison the reference papers make
against SE-Sync-style centralized solutions):

* sphere2500, 5 robots: distributed demo config (RoundRobin, chordal init,
  rel tol 0.2 — ``launch/dpgo_demo.launch``) vs the tight single-block
  centralized solve; translational RMSE after Umeyama alignment.
* tunnels, 8 robots, GNC: the colored-parallel converged solve vs an
  independent RoundRobin converged solve (different schedule, same
  problem) — schedule-independence ATE plus accept/reject agreement.
  (No centralized single-robot loader exists for the 8-file CSV fleet, and
  no ground-truth trajectory ships with either repo.)

All fp64 on CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices

ensure_cpu_devices(1)

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.io.datasets import load_g2o_dataset, load_tunnels
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import rounding
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import (
    AgentConfig,
    InitMethod,
    RobustCostType,
    UpdateRule,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ATE_r02.json")
RESULTS = {}


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def solve(data, cfg, label):
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float64)
    eng = RBCDEngine(prob, cfg)
    t0 = time.time()
    st, info = eng.run(eng.initialize())
    T, st = eng.finalize(st)
    log(f"{label}: {info['iterations']} iters cost {info['final_cost']:.3f} "
        f"conv={info['converged']} ({time.time()-t0:.0f}s)")
    return np.asarray(T), st, info


# --- sphere2500: distributed demo vs tight centralized -----------------------
data5 = load_g2o_dataset("sphere2500", num_robots=5)
T_dist, _, info_d = solve(
    data5,
    AgentConfig(
        num_robots=5, update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.CHORDAL,
        relative_change_tolerance=0.2, RTR_gradnorm_tol=0.5,
        max_iteration_number=1000,
    ),
    "sphere2500 distributed demo",
)
data1 = load_g2o_dataset("sphere2500", num_robots=1)
T_cent, _, info_c = solve(
    data1,
    AgentConfig(
        num_robots=1, update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.CHORDAL,
        relative_change_tolerance=1e-3, RTR_gradnorm_tol=1e-2,
        max_iteration_number=300,
    ),
    "sphere2500 centralized tight",
)
ate = float(rounding.ate_translation(jnp.asarray(T_dist), jnp.asarray(T_cent)))
span = float(np.ptp(T_cent[:, :, 3], axis=0).max())
RESULTS["sphere2500_5robot_vs_centralized"] = {
    "ate_rmse": ate,
    "trajectory_span": span,
    "ate_over_span": ate / span,
    "distributed_iters": info_d["iterations"],
    "distributed_cost": info_d["final_cost"],
    "centralized_cost": info_c["final_cost"],
}
log(f"sphere2500 ATE {ate:.4f} over span {span:.1f}")

# --- tunnels GNC: schedule-independence -------------------------------------
tun = load_tunnels()


def tun_cfg(rule, inner):
    return AgentConfig(
        num_robots=8, update_rule=rule,
        local_initialization_method=InitMethod.ODOMETRY,
        robust_cost_type=RobustCostType.GNC_TLS, GNC_use_probability=False,
        GNC_barc=3.0, robust_opt_num_weight_updates=3,
        robust_opt_num_resets=0, robust_opt_inner_iters_per_robot=inner,
        relative_change_tolerance=0.2, RTR_gradnorm_tol=0.5,
    )


# NOTE: tunnels' robot adjacency graph is complete (every robot pair shares
# loop closures), so the greedy coloring degenerates to 8 singleton colors
# and PARALLEL ≡ RoundRobin there; Uniform (seeded random token order) is
# the genuinely different schedule.
T_par, st_par, info_p = solve(
    tun, tun_cfg(UpdateRule.ROUND_ROBIN, 30), "tunnels RoundRobin GNC")
T_rr, st_rr, info_r = solve(
    tun, tun_cfg(UpdateRule.UNIFORM, 30), "tunnels Uniform GNC")
ate_t = float(rounding.ate_translation(jnp.asarray(T_par), jnp.asarray(T_rr)))
span_t = float(np.ptp(T_rr[:, :, 3], axis=0).max())
w_p = np.asarray(st_par.weights)
w_r = np.asarray(st_rr.weights)
prob_t = LiftedProblem.from_data(tun, r=5, dtype=jnp.float64)
loop = (np.asarray(prob_t.edges.is_loop) > 0) & (
    np.asarray(prob_t.edges.mask) > 0)
dec_p = w_p[loop] >= 0.5
dec_r = w_r[loop] >= 0.5
agree = float((dec_p == dec_r).mean())
RESULTS["tunnels_8robot_gnc_schedule_independence"] = {
    "ate_rmse": ate_t,
    "trajectory_span": span_t,
    "ate_over_span": ate_t / span_t,
    "accept_reject_agreement": agree,
    "round_robin": {"iters": info_p["iterations"],
                     "cost": info_p["final_cost"],
                     "converged": info_p["converged"]},
    "uniform": {"iters": info_r["iterations"],
                "cost": info_r["final_cost"],
                "converged": info_r["converged"]},
}
log(f"tunnels ATE {ate_t:.4f} over span {span_t:.1f}; "
    f"decision agreement {agree:.4f}")

with open(OUT, "w") as f:
    json.dump(RESULTS, f, indent=2)
log(f"wrote {OUT}")
