"""Synthetic-world generator tests (io/synthetic.py).

The bundled datasets carry no loop-closure ground-truth labels (tunnels —
docs/PARITY.md) and cap at 5,750 poses; the generator provides exact
ground truth at any size. These tests pin: exact recovery on noise-free
worlds, edge-classification consistency, and GNC precision/recall against
REAL planted-outlier labels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_ros_tpu.io.synthetic import generate_world
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic, rounding, stiefel
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.types import EdgeType
from dpgo_ros_tpu.utils.config import (
    AgentConfig,
    RobustCostType,
    UpdateRule,
)


def _gt_cost(data, T_gt):
    prob = LiftedProblem.from_data(data, r=5)
    Ylift = jnp.concatenate(
        [jnp.eye(3), jnp.zeros((2, 3))], axis=0
    )
    X = stiefel.lift_trajectory(jnp.asarray(T_gt), Ylift)
    return float(quadratic.cost(X, prob.edges)), prob


@pytest.mark.parametrize("kind,kw", [
    ("sphere", dict(n=300)),
    ("grid3d", dict(grid_shape=(6, 6, 5))),
])
def test_noise_free_world_is_consistent(kind, kw):
    data, T_gt, out = generate_world(
        kind, num_robots=2, rot_noise=0.0, trans_noise=0.0, **kw
    )
    assert not out.any()
    c, prob = _gt_cost(data, T_gt)
    assert c < 1e-12
    # classification parity: same-robot consecutive chain edges are
    # odometry; the (num_robots-1) robot-boundary chain edges classify as
    # SHARED loop closures (reference rules) — so odometry = n - R
    odo, priv, shared = data.counts_by_type()
    assert odo == data.total_poses - data.num_robots
    assert priv + shared > 0


@pytest.mark.slow
def test_noise_free_solve_recovers_ground_truth():
    data, T_gt, _ = generate_world(
        "sphere", n=300, num_robots=2, rot_noise=0.0, trans_noise=0.0
    )
    prob = LiftedProblem.from_data(data, r=5)
    eng = RBCDEngine(
        prob,
        AgentConfig(
            num_robots=2, update_rule=UpdateRule.ROUND_ROBIN,
            relative_change_tolerance=1e-4, max_iteration_number=100,
            RTR_gradnorm_tol=1e-6,
        ),
    )
    st, info = eng.run(eng.initialize())
    T, _ = eng.finalize(st)
    assert info["final_cost"] < 1e-10
    ate = float(
        rounding.ate_translation(jnp.asarray(np.asarray(T)),
                                 jnp.asarray(T_gt))
    )
    assert ate < 1e-6


@pytest.mark.slow
def test_gnc_perfect_precision_recall_on_planted_outliers():
    """With exact labels (which tunnels lacks), GNC at barc 3.0 must
    reject every planted outlier and keep every genuine loop closure."""
    data, T_gt, out = generate_world(
        "sphere", n=300, num_robots=2, rot_noise=0.01,
        trans_noise=0.05, outlier_ratio=0.2, seed=1,
    )
    assert out.sum() > 20
    prob = LiftedProblem.from_data(data, r=5)
    eng = RBCDEngine(
        prob,
        AgentConfig(
            num_robots=2, update_rule=UpdateRule.PARALLEL,
            robust_cost_type=RobustCostType.GNC_TLS,
            GNC_use_probability=False, GNC_barc=3.0,
            robust_opt_num_weight_updates=3,
            robust_opt_inner_iters_per_robot=20,
            relative_change_tolerance=0.05,
            max_iteration_number=400,
        ),
    )
    st, info = eng.run(eng.initialize())
    w = np.asarray(st.weights)[: len(data.measurements)]
    loops = np.asarray(data.measurements.edge_type) != EdgeType.ODOMETRY
    rejected = w < 0.5
    # perfect recall: every planted outlier rejected
    assert np.all(rejected[out])
    # precision: at most a couple of boundary false rejections
    assert int((rejected & loops & ~out).sum()) <= max(
        2, int(0.01 * loops.sum())
    )
    T, _ = eng.finalize(st)
    ate = float(
        rounding.ate_translation(jnp.asarray(np.asarray(T)),
                                 jnp.asarray(T_gt))
    )
    span = float(np.ptp(T_gt[:, :, 3], axis=0).max())
    assert ate < 0.02 * span


def test_work_balanced_synthetic_partition():
    data, _, _ = generate_world(
        "sphere", n=500, num_robots=4, balance="work", seed=2
    )
    assert data.num_robots == 4
    assert int(np.sum(data.num_poses)) == 500
    odo, _, _ = data.counts_by_type()
    assert odo == 500 - 4
