"""End-to-end solver tests: golden convergence on the bundled datasets
(SURVEY.md §4 'Implication for the rebuild': numeric convergence tests the
reference lacks).

Golden values established with this framework at fp64 and cross-checked for
internal consistency (distributed cost == centralized cost); the
tinyGrid3D optimum ~18.52 is stable across solvers/partitions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.local_solvers import RTRParams, rtr_solve
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic, rounding, stiefel
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import (
    AgentConfig,
    InitMethod,
    SolverMethod,
    UpdateRule,
)

TINY_OPT_COST = 18.52  # tinyGrid3D L2 optimum (this framework, fp64)


def _engine(name, num_robots, **kw):
    data = load_g2o_dataset(name, num_robots=num_robots)
    prob = LiftedProblem.from_data(data, r=kw.pop("r", 5))
    cfg = AgentConfig(
        num_robots=num_robots,
        relative_change_tolerance=kw.pop("tol", 1e-2),
        max_iteration_number=kw.pop("max_iters", 100),
        RTR_gradnorm_tol=kw.pop("gradnorm_tol", 0.5),
        **kw,
    )
    return RBCDEngine(prob, cfg)


def test_single_robot_tinygrid_converges():
    eng = _engine("tinyGrid3D", 1, max_iters=50)
    st = eng.initialize()
    f0 = float(st.cost)
    st, info = eng.run(st)
    assert info["final_cost"] < f0 * 0.2
    assert info["final_cost"] < TINY_OPT_COST * 1.01
    # solution stays on the manifold
    assert float(stiefel.check_on_manifold(st.X)) < 1e-8
    T, _ = eng.finalize(st)
    assert T.shape == (9, 3, 4)
    # anchored at identity
    assert np.allclose(T[0, :, :3], np.eye(3), atol=1e-9)
    assert np.allclose(T[0, :, 3], 0, atol=1e-9)


def test_two_robot_rbcd_matches_centralized():
    eng1 = _engine("tinyGrid3D", 1, max_iters=50)
    _, info1 = eng1.run()
    eng2 = _engine("tinyGrid3D", 2, max_iters=100,
                   update_rule=UpdateRule.ROUND_ROBIN)
    _, info2 = eng2.run()
    assert info2["final_cost"] < info1["final_cost"] * 1.02 + 1e-6


def test_parallel_update_rule_matches_sequential():
    eng = _engine("tinyGrid3D", 2, max_iters=100,
                  update_rule=UpdateRule.PARALLEL)
    _, info = eng.run()
    assert info["final_cost"] < TINY_OPT_COST * 1.02


def test_rgd_solver_decreases_cost():
    eng = _engine("tinyGrid3D", 1, max_iters=30, solver=SolverMethod.RGD,
                  RGD_stepsize=1e-2, tol=1e-4)
    st = eng.initialize()
    f0 = float(st.cost)
    st, info = eng.run(st)
    assert info["final_cost"] < f0


def test_acceleration_not_worse():
    eng_p = _engine("tinyGrid3D", 2, max_iters=100, acceleration=True,
                    update_rule=UpdateRule.ROUND_ROBIN)
    _, info = eng_p.run()
    assert info["final_cost"] < TINY_OPT_COST * 1.05


@pytest.mark.slow
def test_chordal_init_lower_cost_than_odometry():
    ec = _engine("smallGrid3D", 1,
                 local_initialization_method=InitMethod.CHORDAL)
    eo = _engine("smallGrid3D", 1,
                 local_initialization_method=InitMethod.ODOMETRY)
    fc = float(ec.initialize().cost)
    fo = float(eo.initialize().cost)
    assert fc < fo


def test_rtr_monotone_descent():
    """RTR never increases the cost (trust-region acceptance)."""
    data = load_g2o_dataset("tinyGrid3D", num_robots=1)
    prob = LiftedProblem.from_data(data, r=5)
    eng = _engine("tinyGrid3D", 1)
    st = eng.initialize()
    X = st.X
    e = prob.edges
    mask = jnp.ones((prob.n, 1, 1))
    P = quadratic.precond_inverse(quadratic.precond_blocks(e, prob.n))
    f_prev = float(quadratic.cost(X, e))
    for _ in range(5):
        X, res = rtr_solve(X, e, mask, P, RTRParams(max_iterations=2))
        f = float(res.f_opt)
        assert f <= f_prev + 1e-9
        f_prev = f


def test_fused_runner_matches_host_driven():
    """The single-XLA-program fused runner (bench hot path) must reach the
    same cost region as the host-driven loop, and stop on the same
    termination rule."""
    for rule in (UpdateRule.ROUND_ROBIN, UpdateRule.UNIFORM):
        eng = _engine("tinyGrid3D", 2, max_iters=60, update_rule=rule)
        st0 = eng.initialize()
        st_host, info = eng.run(st0)
        run = eng.make_fused_run(60)
        st_fused = run(st0)
        # Uniform uses the same counter-based on-device PRNG in both paths,
        # so the schedules (and therefore results) agree exactly
        assert abs(float(st_fused.cost) - info["final_cost"]) < 1e-6 * (
            1 + info["final_cost"]
        ), rule
        assert int(st_fused.iteration) == info["iterations"], rule


@pytest.mark.slow
def test_ate_distributed_vs_centralized():
    """ATE parity oracle (BASELINE target 'match reference trajectories
    within the ATE bound'): the distributed 2-robot solution must align to
    the tight centralized solution within a small translational RMSE."""
    # tight centralized oracle
    engc = _engine("smallGrid3D", 1, tol=1e-3, max_iters=50,
                   gradnorm_tol=1e-2)
    stc, _ = engc.run()
    Tc, _ = engc.finalize(stc)
    # distributed solve at demo-like settings
    engd = _engine("smallGrid3D", 2, tol=1e-2, max_iters=100,
                   update_rule=UpdateRule.ROUND_ROBIN)
    std, _ = engd.run()
    Td, _ = engd.finalize(std)
    ate = float(rounding.ate_translation(jnp.asarray(Td), jnp.asarray(Tc)))
    # trajectory spans ~10 units; demand cm-scale agreement
    assert ate < 0.05, ate


def test_run_history_telemetry():
    eng = _engine("tinyGrid3D", 2, max_iters=20)
    _, info = eng.run()
    h = info["history"]
    assert len(h["cost"]) == info["iterations"]
    assert all(t >= 0 for t in h["iter_time_sec"])
    assert len(h["rel_change"]) == info["iterations"]


def test_no_premature_termination_on_stale_rel_change():
    """Round-3 regression (termination fix): a robot's recorded rel-change
    goes stale when a neighbor later moves; without neighbor invalidation
    the 2-robot Uniform tinyGrid run terminated at rel=[0,0] with cost
    21.6 while block 1's true masked gradient norm was 25.4. With the fix
    the run must continue to the certified global optimum."""
    from dpgo_ros_tpu.ops import certificate

    data = load_g2o_dataset("tinyGrid3D", num_robots=2)
    prob = LiftedProblem.from_data(data, r=5)
    cfg = AgentConfig(
        num_robots=2,
        relative_change_tolerance=1e-7,
        RTR_gradnorm_tol=1e-11,
        RTR_iterations=50,
        RTR_tCG_iterations=200,
        max_iteration_number=400,
        dtype="float64",
    )
    eng = RBCDEngine(prob, cfg)
    st, info = eng.run(eng.initialize())
    assert info["final_cost"] == pytest.approx(TINY_OPT_COST, abs=1e-2)
    # the DISTRIBUTED solution itself passes the global-optimality
    # certificate (dual PSD + criticality)
    cert = certificate.certify(
        st.X, eng._edges(st.weights), crit_tol=1e-4, eig_tol=1e-5
    )
    assert cert.is_global
