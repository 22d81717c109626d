"""2D (SE(2)) support: the lifted machinery is dimension-generic (the
reference supports d=2 via the ``dimension`` parameter,
``launch/PGOAgent.launch:11``)."""

import numpy as np
import pytest

from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.types import EdgeType, MeasurementBatch, PoseGraphData
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule


def _rot2(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s], [s, c]])


def _se2_dataset(n=20, num_robots=2, seed=0, noise=0.02):
    rng = np.random.default_rng(seed)
    th = np.cumsum(rng.normal(scale=0.4, size=n))
    t = np.cumsum(rng.normal(scale=1.0, size=(n, 2)), axis=0)
    R = np.stack([_rot2(a) for a in th])
    pairs = [(i, i + 1) for i in range(n - 1)] + [(0, n // 2), (2, n - 1)]
    src = np.array([p[0] for p in pairs], np.int32)
    dst = np.array([p[1] for p in pairs], np.int32)
    Rrel = np.einsum("eji,ejk->eik", R[src], R[dst])
    trel = np.einsum("eji,ej->ei", R[src], t[dst] - t[src])
    for k in range(len(pairs)):
        Rrel[k] = Rrel[k] @ _rot2(rng.normal(scale=noise))
        trel[k] += rng.normal(scale=noise, size=2)
    E = len(pairs)
    per = n // num_robots
    robot = np.minimum(src // per, num_robots - 1), np.minimum(
        dst // per, num_robots - 1
    )
    sr = np.minimum(src // per, num_robots - 1).astype(np.int32)
    dr = np.minimum(dst // per, num_robots - 1).astype(np.int32)
    sf = (src - sr * per).astype(np.int32)
    df = (dst - dr * per).astype(np.int32)
    same = sr == dr
    et = np.where(
        same & (sf + 1 == df),
        EdgeType.ODOMETRY,
        np.where(same, EdgeType.PRIVATE_LOOP_CLOSURE, EdgeType.SHARED_LOOP_CLOSURE),
    ).astype(np.int32)
    m = MeasurementBatch(
        src_robot=sr, src_frame=sf, dst_robot=dr, dst_frame=df,
        R=Rrel, t=trel,
        kappa=np.full(E, 50.0), tau=np.full(E, 100.0),
        weight=np.ones(E), fixed_weight=et == EdgeType.ODOMETRY,
        edge_type=et,
    )
    num_poses = np.array([per] * (num_robots - 1) + [n - per * (num_robots - 1)])
    return PoseGraphData(measurements=m, num_poses=num_poses, d=2)


@pytest.mark.parametrize("r", [2, 3])
@pytest.mark.slow
def test_se2_single_and_two_robot(r):
    data = _se2_dataset()
    prob = LiftedProblem.from_data(data, r=r)
    assert prob.d == 2
    cfg = AgentConfig(
        num_robots=2,
        dimension=2,
        relaxation_rank=r,
        update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.ODOMETRY,
        relative_change_tolerance=1e-2,
        max_iteration_number=60,
        RTR_gradnorm_tol=0.1,
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    f0 = float(st.cost)
    st, info = eng.run(st)
    assert info["final_cost"] < 0.5 * f0 + 1.0
    T, _ = eng.finalize(st)
    assert T.shape == (20, 2, 3)
    # valid SO(2) blocks
    RtR = np.einsum("nij,nik->njk", T[:, :, :2], T[:, :, :2])
    assert np.allclose(RtR, np.eye(2)[None], atol=1e-6)


def test_se2_engine_smoke():
    """Fast SE(2) pin: d=2 problem builds, initializes, and a short XLA-path
    run decreases the cost (the fused-kernel equivalence pin is the slow
    ``test_fused_kernel_se2_matches_xla``)."""
    data = _se2_dataset(n=16, num_robots=2)
    prob = LiftedProblem.from_data(data, r=3)
    assert prob.d == 2
    eng = RBCDEngine(
        prob,
        AgentConfig(
            num_robots=2,
            dimension=2,
            relaxation_rank=3,
            update_rule=UpdateRule.ROUND_ROBIN,
            local_initialization_method=InitMethod.ODOMETRY,
            relative_change_tolerance=0.0,
            max_iteration_number=4,
            RTR_gradnorm_tol=0.1,
        ),
    )
    st = eng.initialize()
    f0 = float(st.cost)
    st, info = eng.run(st)
    assert np.isfinite(info["final_cost"]) and info["final_cost"] <= f0


@pytest.mark.slow
def test_fused_kernel_se2_matches_xla():
    """The fused RTR kernel is dimension-generic: a d=2 engine run with
    use_fused_kernel=True (interpret mode on CPU) matches the XLA path."""
    import jax.numpy as jnp

    data = _se2_dataset(n=24, num_robots=2)
    out = {}
    for fused in (False, True):
        prob = LiftedProblem.from_data(data, r=3, dtype=jnp.float32)
        eng = RBCDEngine(
            prob,
            AgentConfig(
                num_robots=2,
                dimension=2,
                relaxation_rank=3,
                update_rule=UpdateRule.ROUND_ROBIN,
                relative_change_tolerance=0.0,
                max_iteration_number=8,
                RTR_gradnorm_tol=0.1,
                dtype="float32",
                use_fused_kernel=fused,
            ),
        )
        assert eng._use_fused == fused
        run = eng.make_fused_run(8)
        st = run(eng.initialize())
        out[fused] = float(st.cost)
    assert out[True] == pytest.approx(out[False], rel=2e-3)


def test_fused_single_solve_se2_matches_xla_fast():
    """Fast-suite d=2 numerical pin (ADVICE r3): one fused single-kernel
    block solve against the XLA rtr_solve on a small SE(2) world — keeps
    the dimension-generic kernel path covered without the slow engine
    equivalence runs."""
    import jax
    import jax.numpy as jnp

    from dpgo_ros_tpu.models.local_solvers import RTRParams, rtr_solve
    from dpgo_ros_tpu.ops import fused_rtr, quadratic

    data = _se2_dataset(n=16, num_robots=2)
    prob = LiftedProblem.from_data(data, r=3, dtype=jnp.float32)
    kg = fused_rtr.build_kernel_graph(prob)
    e = prob.edges
    params = RTRParams(
        max_iterations=2, max_tcg_iterations=12, gradnorm_tol=0.1
    )
    key = jax.random.PRNGKey(2)
    from dpgo_ros_tpu.ops import stiefel

    Y = stiefel.random_stiefel(key, prob.n, prob.r, prob.d, jnp.float32)
    p = 0.1 * jax.random.normal(key, (prob.n, prob.r, 1), jnp.float32)
    X = jnp.concatenate([Y, p], axis=-1)
    mask = prob.block_mask(0, jnp.float32)
    Pinv = quadratic.precond_inverse(quadratic.precond_blocks(e, prob.n))
    X_ref, res = rtr_solve(X, e, mask, Pinv, params)
    Xt, stats = fused_rtr.rtr_solve_fused(
        fused_rtr.to_t(X, kg.n_pad),
        fused_rtr.mask_to_row(mask, kg.n_pad),
        fused_rtr.pinv_to_t(Pinv, kg.n_pad),
        kg.weight_rows(e, e.weight),
        kg,
        params,
        interpret=jax.default_backend() != "tpu",
    )
    X_f = fused_rtr.from_t(Xt, prob.n, prob.r, prob.d + 1)
    X_f = jnp.where(mask > 0, X_f, X)
    assert float(stats[0, 1]) == pytest.approx(float(res.f_opt), rel=1e-4)
    rel = float(jnp.max(jnp.abs(X_f - X_ref)) / jnp.max(jnp.abs(X_ref)))
    assert rel < 1e-3
