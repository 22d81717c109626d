"""Fused single-Pallas-kernel RTR solve (ops/fused_rtr.py) vs the XLA path.

Runs in Pallas interpreter mode on the CPU test backend; the TPU driver
exercises the compiled kernel through bench.py / __graft_entry__.entry().
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.local_solvers import RTRParams, rtr_solve
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import fused_rtr, quadratic, stiefel
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule


@pytest.fixture(scope="module")
def small_problem():
    data = load_g2o_dataset("smallGrid3D", num_robots=2)
    return LiftedProblem.from_data(data, r=5, dtype=jnp.float32)


def _noisy_state(prob, key=0):
    k = jax.random.PRNGKey(key)
    Y = stiefel.random_stiefel(k, prob.n, prob.r, prob.d, jnp.float32)
    p = 0.1 * jax.random.normal(k, (prob.n, prob.r, 1), jnp.float32)
    return jnp.concatenate([Y, p], axis=-1)


def test_kernel_graph_covers_all_edges(small_problem):
    prob = small_problem
    kg = fused_rtr.build_kernel_graph(prob)
    E_real = int(np.sum(np.asarray(prob.edges.mask) > 0))
    D = max(1, len(kg.diags2))
    n_chain = int(np.sum(kg.chain_lane_of_edge < kg.n_pad))
    n_loop = int(np.sum(kg.loop_slot_of_edge < kg.E_loop_pad))
    n_diag = int(np.sum(kg.diag_lane_of_edge < D * kg.n_pad))
    assert n_chain + n_loop + n_diag == E_real
    assert kg.E_loop == n_loop
    # chain lanes really are consecutive-index edges
    src = np.asarray(prob.edges.src)
    dst = np.asarray(prob.edges.dst)
    lanes = kg.chain_lane_of_edge
    for e in np.where(lanes < kg.n_pad)[0]:
        assert dst[e] == src[e] + 1 and lanes[e] == src[e]
    # diagonal lanes really are offset-Δ edges on the claimed lane
    for e in np.where(kg.diag_lane_of_edge < D * kg.n_pad)[0]:
        j, lane = divmod(int(kg.diag_lane_of_edge[e]), kg.n_pad)
        assert lane == src[e]
        assert dst[e] - src[e] == kg.diags2[j]


def test_kernel_graph_diag_extraction(small_problem):
    """Forcing a low threshold extracts smallGrid3D's banded loop closures
    (offsets ±3/±5/±7/±9 of the 5×5×5 grid) into diagonal lane classes."""
    prob = small_problem
    kg = fused_rtr.KernelGraph.build(
        prob.edges, prob.n, prob.num_robots, prob.offsets, prob.num_poses,
        windowed=True, diag_min=10,
    ).with_rank(prob.r)
    assert len(kg.diags2) >= 4
    kg0 = fused_rtr.build_kernel_graph(prob)
    # every diagonal-claimed edge left the one-hot loop-slot set
    assert kg.E_loop < kg0.E_loop or len(kg0.diags2) > 0


def test_fused_single_solve_matches_xla(small_problem):
    prob = small_problem
    e = prob.edges
    kg = fused_rtr.build_kernel_graph(prob)
    params = RTRParams(max_iterations=3, max_tcg_iterations=50,
                       gradnorm_tol=0.5)
    X = _noisy_state(prob)
    mask = prob.block_mask(0, jnp.float32)
    Pinv = quadratic.precond_inverse(quadratic.precond_blocks(e, prob.n))

    X_ref, res_ref = rtr_solve(X, e, mask, Pinv, params)

    Xt = fused_rtr.to_t(X, kg.n_pad)
    Xt_new, stats = fused_rtr.rtr_solve_fused(
        Xt,
        fused_rtr.mask_to_row(mask, kg.n_pad),
        fused_rtr.pinv_to_t(Pinv, kg.n_pad),
        kg.weight_rows(e, e.weight),
        kg,
        params,
        interpret=jax.default_backend() != "tpu",
    )
    s = np.asarray(stats)[0]
    # identical telemetry (same TR decisions) to fp32/hi-lo tolerance
    assert s[0] == pytest.approx(float(res_ref.f_init), rel=1e-4)
    assert s[1] == pytest.approx(float(res_ref.f_opt), rel=1e-3)
    assert s[2] == pytest.approx(float(res_ref.gradnorm_init), rel=1e-3)
    assert int(s[4]) == int(res_ref.iterations)
    X_f = fused_rtr.from_t(Xt_new, prob.n, prob.r, prob.d + 1)
    X_f = jnp.where(mask > 0, X_f, X)
    rel = float(
        jnp.max(jnp.abs(X_f - X_ref)) / jnp.max(jnp.abs(X_ref))
    )
    assert rel < 1e-3
    # block masking respected: only robot 0's block moved
    moved = s[fused_rtr._S_MOVED:fused_rtr._S_MOVED + 2]
    upd = s[fused_rtr._S_UPD:fused_rtr._S_UPD + 2]
    assert moved[0] > 0 and moved[1] == 0
    assert upd[0] == 1.0 and upd[1] == 0.0


@pytest.mark.slow
def test_fused_engine_run_matches_xla_engine(small_problem):
    prob = small_problem
    base = dict(
        num_robots=2,
        update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.ODOMETRY,
        relative_change_tolerance=0.0,
        max_iteration_number=6,
        dtype="float32",
    )
    outs = {}
    for fused in (False, True):
        eng = RBCDEngine(prob, AgentConfig(use_fused_kernel=fused, **base))
        assert eng._use_fused == fused
        st = eng.initialize()
        outs[fused] = eng.make_fused_run(6)(st)
    c_xla = float(outs[False].cost)
    c_fus = float(outs[True].cost)
    assert c_fus == pytest.approx(c_xla, rel=2e-3)
    assert int(outs[True].iteration) == int(outs[False].iteration)


def test_fused_tabled_matches_chunked(small_problem):
    """The opt-in precomputed-one-hot-table kernel is numerically identical
    to the chunked on-the-fly path (same matmul semantics)."""
    prob = small_problem
    e = prob.edges
    kg = fused_rtr.build_kernel_graph(prob)
    params = RTRParams(max_iterations=2, max_tcg_iterations=20,
                       gradnorm_tol=0.5)
    X = _noisy_state(prob, key=11)
    mask = prob.block_mask(1, jnp.float32)
    Pinv = quadratic.precond_inverse(quadratic.precond_blocks(e, prob.n))
    common = (
        fused_rtr.to_t(X, kg.n_pad),
        fused_rtr.mask_to_row(mask, kg.n_pad),
        fused_rtr.pinv_to_t(Pinv, kg.n_pad),
        kg.weight_rows(e, e.weight),
        kg,
        params,
    )
    interp = jax.default_backend() != "tpu"
    X_c, s_c = fused_rtr.rtr_solve_fused(*common, interpret=interp)
    X_t, s_t = fused_rtr.rtr_solve_fused(
        *common, interpret=interp, oh=kg.oh_table()
    )
    np.testing.assert_allclose(
        np.asarray(X_t), np.asarray(X_c), rtol=1e-5, atol=1e-5
    )
    assert int(s_t[0, 4]) == int(s_c[0, 4])


def test_weight_rows_reproduce_cost(small_problem):
    """Per-lane effective weights must reproduce quadratic.cost under
    arbitrary (GNC-style) weights — the weight-round refresh path."""
    prob = small_problem
    e = prob.edges
    kg = fused_rtr.build_kernel_graph(prob)
    key = jax.random.PRNGKey(3)
    w = jax.random.uniform(key, (e.num_edges,), jnp.float32)
    e_w = quadratic.EdgeSet(
        src=e.src, dst=e.dst, R=e.R, t=e.t, kappa=e.kappa, tau=e.tau,
        weight=w, mask=e.mask, is_loop=e.is_loop, pull=e.pull,
    )
    X = _noisy_state(prob, key=7)
    f_ref = float(quadratic.cost(X, e_w))

    # a 0-iteration fused solve reports f0 under the given weight rows
    params = RTRParams(max_iterations=0, max_tcg_iterations=1,
                       gradnorm_tol=0.0)
    Pinv = quadratic.precond_inverse(quadratic.precond_blocks(e_w, prob.n))
    _, stats = fused_rtr.rtr_solve_fused(
        fused_rtr.to_t(X, kg.n_pad),
        fused_rtr.mask_to_row(prob.block_mask(0, jnp.float32), kg.n_pad),
        fused_rtr.pinv_to_t(Pinv, kg.n_pad),
        kg.weight_rows(e_w, w),
        kg,
        params,
        interpret=jax.default_backend() != "tpu",
    )
    assert float(stats[0, 0]) == pytest.approx(f_ref, rel=1e-4)


@pytest.mark.slow
def test_spmd_fused_kernel_matches_xla_mesh():
    """The fused kernel inside the shard_map program (per-device KernelGraph
    constants) tracks the XLA spmd path on a virtual 4-device mesh."""
    from jax.sharding import Mesh

    from dpgo_ros_tpu.parallel.spmd import (
        ShardedProblem,
        build_spmd_step,
        gather_trajectory,
    )

    data = load_g2o_dataset("smallGrid3D", num_robots=4)
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    outs = {}
    for fused in (False, True):
        cfg = AgentConfig(
            num_robots=4,
            update_rule=UpdateRule.PARALLEL,
            local_initialization_method=InitMethod.ODOMETRY,
            RTR_gradnorm_tol=0.5,
            dtype="float32",
            use_fused_kernel=fused,
        )
        eng = RBCDEngine(prob, cfg)
        st0 = eng.initialize()
        sp = ShardedProblem.build(
            prob, np.asarray(st0.X, np.float32), eng.robot_colors,
            num_devices=4,
        )
        mesh = Mesh(np.array(jax.devices()[:4]), ("robots",))
        st, step = build_spmd_step(sp, mesh, cfg)
        for it in range(8):
            st = step(np.int32(it), np.int32(0), st)
        Xg = gather_trajectory(sp, st, prob.num_poses)
        outs[fused] = float(quadratic.cost(jnp.asarray(Xg), prob.edges))
    assert outs[True] == pytest.approx(outs[False], rel=2e-3)


def test_weight_rows_gather_matches_scatter(small_problem):
    """The gather-based per-lane weight refresh (SPMD per-step path) equals
    the scatter-based KernelGraph.weight_rows."""
    prob = small_problem
    e = prob.edges
    kg = fused_rtr.build_kernel_graph(prob)
    w = jax.random.uniform(jax.random.PRNGKey(5), (e.num_edges,), jnp.float32)
    ref = kg.weight_rows(e, w)
    cel, les, del_ = kg.weight_rows_arrays()
    got = fused_rtr.weight_rows_gather(
        e.kappa, e.tau, e.mask, w, cel, les, del_, kg.n_pad
    )
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_host_cache_matches_device(small_problem):
    """The host-numpy solver cache (_host_cache_np — used by the TPU
    host-composed runner, round 4) reproduces the device cache: weight
    rows EXACTLY, the preconditioner inverse to conditioning-amplified
    fp32 tolerance."""
    prob = small_problem
    cfg = AgentConfig(
        num_robots=2, use_fused_kernel=True, dtype="float32"
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    kg = eng._kg
    e = eng._edges(st.weights)
    pt_d = fused_rtr.pinv_to_t(eng._precond_inv(e), kg.n_pad)
    cel, les, dle = kg.weight_rows_arrays()
    e0 = prob.edges
    wr_d = fused_rtr.weight_rows_gather(
        e0.kappa, e0.tau, e0.mask, st.weights, cel, les, dle, kg.n_pad
    )
    pt_h, wr_h = eng._host_cache_np(np.asarray(prob.host_edges.weight))
    for a, b in zip(wr_d, wr_h):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    scale = float(jnp.max(jnp.abs(pt_d)))
    assert float(jnp.max(jnp.abs(pt_d - pt_h))) < 2e-2 * scale


def test_host_composed_run_matches_engine(small_problem, monkeypatch):
    """DPGO_FUSED_HOSTRUN=1 forces the host-composed runner (prep jit →
    standalone kernel → post jit) on the CPU backend; it must track the
    in-jit runner to preconditioner-noise tolerance and take the same
    number of iterations."""
    monkeypatch.setenv("DPGO_FUSED_HOSTRUN", "1")
    prob = small_problem
    cfg = AgentConfig(
        num_robots=2,
        update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.ODOMETRY,
        relative_change_tolerance=0.0,
        max_iteration_number=6,
        use_fused_kernel=True,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    out_h = eng.make_fused_run(6)(st)
    monkeypatch.setenv("DPGO_FUSED_HOSTRUN", "0")
    out_j = eng.make_fused_run(6)(st)
    assert int(out_h.iteration) == int(out_j.iteration) == 6
    # same optimization trajectory modulo preconditioner ULP noise
    assert float(out_h.cost) == pytest.approx(float(out_j.cost), rel=2e-2)
    # converged-state invariance: a run from an already-terminated state
    # is the identity on both paths (in-kernel stop0)
    import dataclasses as _dc

    cfg2 = _dc.replace(cfg, relative_change_tolerance=1e9)
    eng2 = RBCDEngine(prob, cfg2)
    st2 = eng2.initialize()._replace(
        rel_change=jnp.zeros((2,), jnp.float32)
    )
    monkeypatch.setenv("DPGO_FUSED_HOSTRUN", "1")
    out2 = eng2.make_fused_run(6)(st2)
    assert int(out2.iteration) == 0
    np.testing.assert_array_equal(np.asarray(out2.X), np.asarray(st2.X))
