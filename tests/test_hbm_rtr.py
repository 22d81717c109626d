"""HBM-resident windowed-DMA RTR kernel (ops/hbm_rtr.py, VERDICT r4 #3):
equivalence vs the VMEM-resident kernel on banded problems. The slab
window covers block + halo + alignment slack; solves must reproduce the
full-width kernel's iterates and iteration counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import fused_rtr, hbm_rtr
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule


def _setup(dataset, num_robots, **data_kw):
    if dataset == "synthetic":
        from dpgo_ros_tpu.io.synthetic import generate_world

        data, _, _ = generate_world(
            kind="sphere", n=1200, num_robots=num_robots, seed=0, **data_kw
        )
    else:
        data = load_g2o_dataset(dataset, num_robots=num_robots)
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=num_robots,
        update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.ODOMETRY,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
        use_fused_kernel=True,
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    return prob, eng, st


@pytest.mark.parametrize("dataset", ["sphere2500", "synthetic"])
def test_hbm_solve_matches_vmem_kernel(dataset):
    prob, eng, st = _setup(dataset, 5)
    kg = eng._kg
    assert kg.E_loop == 0, "banded fixture expected"
    e = eng._edges(st.weights)
    Xt = fused_rtr.to_t(st.X, kg.n_pad)
    pt = fused_rtr.pinv_to_t(eng._precond_inv(e), kg.n_pad)
    wrows = kg.weight_rows(e, e.weight)
    for rb in range(prob.num_robots):
        o, nk = kg.offsets[rb], kg.num_poses[rb]
        mask = np.zeros((prob.n, 1, 1), np.float32)
        mask[o : o + nk] = 1.0
        mrow = fused_rtr.mask_to_row(jnp.asarray(mask), kg.n_pad)
        Xv, sv = fused_rtr.rtr_solve_fused(
            Xt, mrow, pt, wrows, kg, eng.rtr_params,
            interpret=True, oh=eng._kg_oh,
        )
        Xh, sh = hbm_rtr.rtr_solve_hbm(
            Xt,
            jnp.asarray(o, jnp.int32),
            jnp.asarray(nk, jnp.int32),
            pt, wrows, kg, eng.rtr_params, interpret=True,
        )
        sv, sh = np.asarray(sv)[0], np.asarray(sh)[0]
        # identical trust-region trajectory: same TR + tCG iteration
        # counts, same masked gradient norms, iterates to fp noise
        assert sv[4] == sh[4], (rb, sv[4], sh[4])
        assert sv[5] == sh[5], (rb, sv[5], sh[5])
        # window-width reductions reorder fp sums → 1e-3 relative
        np.testing.assert_allclose(sh[3], sv[3], rtol=1e-3)
        scale = float(np.abs(np.asarray(Xv)).max())
        dv = float(np.abs(np.asarray(Xv) - np.asarray(Xh)).max())
        assert dv < 1e-3 * max(scale, 1.0), (rb, dv)


def test_hbm_rejects_loop_closures():
    """Irregular loop-closure graphs must fall back to the VMEM kernel."""
    prob, eng, st = _setup("smallGrid3D", 2)
    kg = eng._kg
    if kg.E_loop == 0:
        pytest.skip("fixture unexpectedly banded")
    e = eng._edges(st.weights)
    Xt = fused_rtr.to_t(st.X, kg.n_pad)
    pt = fused_rtr.pinv_to_t(eng._precond_inv(e), kg.n_pad)
    wrows = kg.weight_rows(e, e.weight)
    with pytest.raises(ValueError):
        hbm_rtr.rtr_solve_hbm(
            Xt, jnp.asarray(0, jnp.int32), jnp.asarray(5, jnp.int32),
            pt, wrows, kg, eng.rtr_params, interpret=True,
        )


def test_hbm_window_width_covers_alignment_slack():
    """Regression: interior blocks whose aligned window start sits up to
    255 lanes left of block-halo must still be fully covered."""
    prob, eng, st = _setup("sphere2500", 5)
    kg = eng._kg
    W = hbm_rtr.window_width(kg)
    halo = max([1, *map(abs, kg.diags2)])
    for rb in range(prob.num_robots):
        o, nk = kg.offsets[rb], kg.num_poses[rb]
        off = max(min(((max(o - halo, 0)) // 256) * 256, kg.n_pad - W), 0)
        assert off <= max(o - halo, 0)
        assert off + W >= min(o + nk + halo, kg.n_pad), (rb, off, W)


def test_engine_hbm_path_matches_vmem(monkeypatch):
    """Round 5: the engine routes large banded worlds through the HBM
    windowed kernel (DPGO_HBM_NPAD_MIN gates it; lowered here so a small
    world exercises the path). RoundRobin runs on the HBM and VMEM paths
    must produce the same trajectory to fp tolerance."""
    monkeypatch.setenv("DPGO_FUSED_MULTISTEP", "0")  # per-step t-runner
    prob, eng_ref, st_ref0 = _setup("synthetic", 3)
    cfg = eng_ref.config
    run_ref = eng_ref.make_fused_run(9)
    out_ref = run_ref(st_ref0)

    monkeypatch.setenv("DPGO_HBM_NPAD_MIN", "128")
    from dpgo_ros_tpu.parallel.rbcd import RBCDEngine

    eng_h = RBCDEngine(prob, cfg)
    assert eng_h._use_hbm, "HBM path not engaged"
    st_h0 = eng_h.initialize()
    out_h = eng_h.make_fused_run(9)(st_h0)
    assert int(out_h.iteration) == int(out_ref.iteration) == 9
    scale = float(np.abs(np.asarray(out_ref.X)).max())
    dv = float(np.abs(np.asarray(out_ref.X) - np.asarray(out_h.X)).max())
    assert dv < 5e-3 * max(scale, 1.0), dv
    np.testing.assert_allclose(
        np.asarray(out_h.rel_change), np.asarray(out_ref.rel_change),
        rtol=5e-3, atol=5e-4,
    )
