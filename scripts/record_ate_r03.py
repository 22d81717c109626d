"""ATE_r03.json: round-3 ATE parity artifact (VERDICT r2 #3 closure).

* sphere2500 5-robot demo vs tight centralized oracle — re-measured after
  the round-3 termination fix (neighbor invalidation of stale rel-change).
* tunnels 8-robot GNC cross-schedule stability — taken from the measured
  experiment artifact (exp_tunnels_schedule.json, config 'final' =
  convergence-gated weight rounds): agreement, ATE, and the common-accept-
  set refit attribution.
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

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import rounding
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "ATE_r03.json")


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


RESULTS = {}

data5 = load_g2o_dataset("sphere2500", num_robots=5)
T_dist, _, info_d = solve(
    data5,
    AgentConfig(
        num_robots=5, update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.CHORDAL,
        relative_change_tolerance=0.2, RTR_gradnorm_tol=0.5,
        max_iteration_number=1000, dtype="float64",
    ),
    "sphere2500 distributed demo (post termination fix)",
)
data1 = load_g2o_dataset("sphere2500", num_robots=1)
T_cent, _, info_c = solve(
    data1,
    AgentConfig(
        num_robots=1, update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.CHORDAL,
        relative_change_tolerance=1e-3, RTR_gradnorm_tol=1e-2,
        max_iteration_number=300, dtype="float64",
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
    "note": "post round-3 neighbor-invalidation termination fix",
}
log(f"sphere2500 ATE {ate:.4f} over span {span:.1f}")

with open(os.path.join(HERE, "exp_tunnels_schedule.json")) as f:
    exp = json.load(f)
fin = exp["final"]
RESULTS["tunnels_8robot_gnc_schedule_independence"] = {
    "config": fin["config"],
    "accept_reject_agreement": fin["agreement"],
    "num_flipped": fin["num_flipped"],
    "ate_rmse": fin["ate_rmse"],
    "trajectory_span": fin["span"],
    "ate_over_span": fin["ate_over_span"],
    "common_accept_set_refit_ate": fin.get("common_set_refit_ate"),
    "common_accept_set_refit_ate_over_span": fin.get(
        "common_set_refit_ate_over_span"
    ),
    "runs": fin["runs"],
    "flip_characterization": (
        "every flipped edge sits at the barc decision boundary "
        "(residual/barc in [0.8, 1.3] - coherently ambiguous, not random "
        "instability); with identical accept sets the refit ATE equals "
        "the raw cross-schedule ATE, so the flips contribute nothing "
        "beyond convergence depth. Round 2: 97.7% / 1.39% of span; "
        "round 3 (convergence-gated weight rounds, "
        "robust_opt_inner_tol=0.15): 99.5% / 0.145%."
    ),
}

with open(OUT, "w") as f:
    json.dump(RESULTS, f, indent=2)
print("wrote", OUT)
