"""Roofline accounting for the fused RTR block-solve kernel.

Round 4 (VERDICT r3 #3): all six benchmark problems (sphere2500, cubicle,
torus3D, parking-garage, 8-robot tunnels + its GNC weight-round program)
and a MEASURED attainable-VPU calibration (scripts/measure_peaks.py)
alongside the spec-derived nominals. The measured elementwise-chain rate
on this v5e is ~1 TF/s fp32 — ~12x below the 12.3 TF/s nominal (which
assumed 4 dual-issue ALUs) and within ~10%% of the fused kernel's
observed per-tCG rate, i.e. the kernel runs at the attainable elementwise
rate and the round-3 "8.8%% of ideal" framing measured the spec sheet,
not kernel headroom.

Computes ANALYTIC per-phase op counts for the fused kernel (ops/fused_rtr.py)
from the KernelGraph's static edge layout, measures ATTAINABLE device peaks
with calibration kernels, measures the real kernel's per-tCG-iteration cost
by a budget-sweep slope fit (forced-iteration RTR params: tcg_kappa=0 never
converges, huge radius never hits the boundary, gradnorm_tol=0 never stops
early), and reports measured-vs-floor fractions.

Methodology notes (also in docs/PERFORMANCE.md):
- Synthetic calibration kernels through this tunneled runtime proved
  UNRELIABLE in both directions: loop bodies whose values saturate (inf) or
  whose recurrences are affine get folded/hoisted by the toolchain (measured
  "peaks" of 2.6-37 PFLOP/s, physically impossible for one v5e), while
  serially-dependent matmul chains stall the MXU pipeline (29 TFLOP/s).
  The REAL kernel's budget sweeps scale perfectly linearly (cubicle
  K=1/10/50 slopes agree to 1%), so measured numbers here come from the
  real kernel and the ceilings are spec-derived:
    MXU 197 TFLOP/s bf16 (public v5e spec);
    VPU 12.3 TFLOP/s fp32 (8 sublanes x 128 lanes x 4 ALUs x 2 FLOP x
    ~1.5 GHz, consistent with the one sane FMA-chain measurement of
    13.6 TFLOP/s before the folding threshold).
- Forced-budget sweeps initialize from the CHORDAL solution: from a random
  X the very first tCG direction hits negative curvature (dHd <= 0) and
  the loop exits after ~1 iteration regardless of the budget — the sweep
  must run where curvature is positive for the slope to mean anything.
- Per-dispatch wall time through the tunnel has a ~0.1-1 ms floor; all
  measurements chain R solves inside ONE jitted fori_loop (true data
  dependency) and fit the slope over R.
- HBM traffic is one-shot (all state is VMEM-resident for the whole solve):
  bytes_in/out / 819 GB/s is charged once per solve, not per iteration.

Writes ROOFLINE.json at the repo root and prints the table.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.local_solvers import RTRParams
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import fused_rtr
from dpgo_ros_tpu.ops.fused_rtr import CHUNK

V5E_MXU_BF16 = 197e12  # nominal peak (public spec)
V5E_VPU_FP32 = 12.3e12  # spec-derived: 8x128 lanes x 4 ALUs x 2 FLOP x 1.5 GHz
V5E_HBM_BPS = 819e9
NS_ITERS = 20  # Newton–Schulz retraction iterations in the kernel


def log(m):
    print(m, flush=True)


# ---------------------------------------------------------- analytic counts

def edge_pass_ops_per_lane(r, d):
    """VPU arithmetic ops per lane for one full edge pass
    (edge_terms + edge_contribs + combine) in the kernel — counted from the
    kernel source (ops/fused_rtr.py::edge_terms/edge_contribs)."""
    terms = d * ((2 * d + 5) * r) + (2 * d + 1) * r + 5 * r
    contribs = d * ((2 * d + 2) * r) + r
    combine = (d + 1) * r
    return terms + contribs + combine


def analytic(kg, r):
    d = kg.d
    C = r * (d + 1)
    npad = kg.n_pad
    D = len(kg.diags2)
    lane_pass = edge_pass_ops_per_lane(r, d)
    # one egrad_and_cost = chain pass + D diagonal passes + loop chunks
    vpu_edges = (1 + D) * lane_pass * npad
    # one-hot loop slots (chunked fallback): construction iota-compares +
    # edge algebra per slot + hi/lo reconstruction
    E2 = kg.E_loop_pad
    win = kg.loop_win_w if kg.loop_win_off is not None else npad
    onehot_elems = (npad + win) * E2  # dst full height + src windowed
    vpu_loops = (lane_pass + 8 * C) * E2 + onehot_elems
    # MXU: gather (2C x win x chunk) + NT scatter per chunk, hi/lo doubled
    mxu_flops = 2 * (2 * C) * (win + npad) * E2 * 2 if E2 and kg.E_loop else 0
    q_vpu = vpu_edges + (vpu_loops if kg.E_loop else 0)

    # per-tCG iteration: hess (= 1 egrad + curvature 2*d*d*r + proj) +
    # proj (2*d*d*r for S + 2*d*d*r apply) + precond 2*(d+1)^2*r +
    # ~6 inner products (2C each) + ~10 C-row vector updates
    tcg_extra = (
        2 * d * d * r * 3 + 2 * (d + 1) * (d + 1) * r + 6 * 2 * C + 10 * C
    ) * npad
    tcg_vpu = q_vpu + tcg_extra

    # retraction: NS_ITERS x (d² rowsums (2r) + d x (2d+1)r rows)
    retract_vpu = NS_ITERS * (2 * d * d * r + d * (2 * d + 1) * r) * npad

    # TR iteration: tcg-loop + retract + 1 egrad (trial) + bookkeeping
    return {
        "C": C,
        "n_pad": npad,
        "D_diag": D,
        "E_loop": kg.E_loop,
        "q_vpu_flops": q_vpu,
        "q_mxu_flops": mxu_flops,
        "tcg_vpu_flops": tcg_vpu,
        "retract_vpu_flops": retract_vpu,
    }


# ------------------------------------------------------------- measurements

def build(name, num_robots, r=5):
    if name == "tunnels":
        from dpgo_ros_tpu.io.datasets import load_tunnels

        data = load_tunnels(num_robots=num_robots)
    else:
        data = load_g2o_dataset(name, num_robots=num_robots)
    prob = LiftedProblem.from_data(data, r=r, dtype=jnp.float32)
    kg = fused_rtr.build_kernel_graph(prob)
    return prob, kg


def _init_state(prob, kg, presteps=0):
    """Chordal-init transposed state; with ``presteps`` > 0 the state is
    advanced by that many reference-budget full-mask solves first — a
    MID-SOLVE state where tCG curvature is positive (the parking-garage
    chordal state exits on dHd <= 0 at the first tCG iteration, which
    voided its round-4 row)."""
    from dpgo_ros_tpu.ops import chordal, quadratic, rounding, stiefel

    key = jax.random.PRNGKey(0)
    T0 = chordal.chordal_initialization(prob.edges, prob.n)
    T0 = rounding.anchor_to_first_pose(jnp.asarray(T0, jnp.float32))
    Ylift = stiefel.random_lifting_matrix(
        key, prob.r, prob.d, jnp.float32
    )
    X = stiefel.lift_trajectory(T0, Ylift)
    Xt = fused_rtr.to_t(X, kg.n_pad)
    mrow = jnp.ones((1, kg.n_pad), jnp.float32)
    P = quadratic.precond_blocks(prob.edges, prob.n, 1e-2)
    pt = fused_rtr.pinv_to_t(
        jnp.linalg.inv(P).astype(jnp.float32), kg.n_pad
    )
    wrows = kg.weight_rows(prob.edges, prob.edges.weight)
    wins = (
        jnp.asarray(fused_rtr.wins_row(kg))
        if kg.loop_win_off is not None
        else None
    )
    ctx = (mrow, pt, wrows, wins)
    if presteps:
        ref = RTRParams(
            max_iterations=3, max_tcg_iterations=50, gradnorm_tol=0.5
        )
        for _ in range(presteps):
            Xt, _ = fused_rtr.rtr_solve_fused(
                Xt, mrow, pt, wrows, kg, ref, wins=wins
            )
        Xt.block_until_ready()
    return Xt, ctx


def solve_time(prob, kg, params, state, reps=(8, 136), n_est=6):
    """Per-solve device time at the given params, WITH an error bar.

    The tunneled runtime floors every dispatch at ~0.9 ms wall, masking
    sub-ms kernels — so R chained solves (Xt carried through, a true data
    dependency) run inside ONE jitted program (R is a traced fori bound:
    both rep counts share one compile) and the per-solve time is the
    slope between the two R values. Round 5: the slope is estimated
    ``n_est`` times from interleaved (t_lo, t_hi) pairs; the reported
    value is the MEDIAN with the standard deviation as the error bar —
    the round-4 single-difference estimate went negative on sub-noise
    quantities and recorded physically impossible times."""
    Xt, (mrow, pt, wrows, wins) = state

    def body(_, xt):
        xt_new, _stats = fused_rtr.rtr_solve_fused(
            xt, mrow, pt, wrows, kg, params, wins=wins
        )
        return xt_new

    @jax.jit
    def chained(xt, R):
        return jax.lax.fori_loop(0, R, body, xt)

    def timed(R):
        t0 = time.time()
        out = chained(Xt, R)
        jax.block_until_ready(out)
        return time.time() - t0

    r1, r2 = reps
    # warm both rep counts (one compile; dispatch paths identical)
    timed(r1)
    timed(r2)
    slopes = []
    for _ in range(n_est):
        t1 = timed(r1)
        t2 = timed(r2)
        slopes.append((t2 - t1) / (r2 - r1))
    med = float(np.median(slopes))
    std = float(np.std(slopes))
    return med, std


def _time_weight_round(prob):
    """Wall time of one GNC weight-round program (engine
    _weight_update_impl) — the non-kernel piece of the robust program."""
    from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
    from dpgo_ros_tpu.utils.config import AgentConfig, RobustCostType

    cfg = AgentConfig(
        num_robots=prob.num_robots,
        robust_cost_type=RobustCostType.GNC_TLS,
        GNC_use_probability=False,
        GNC_barc=3.0,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    out = eng._weight_upd(st)
    jax.block_until_ready(out.weights)
    ts = []
    for _ in range(5):
        t0 = time.time()
        out = eng._weight_upd(st)
        jax.block_until_ready(out.weights)
        ts.append(time.time() - t0)
    return min(ts)


def forced_params(K):
    """RTR params that provably execute 3 x K tCG iterations: kappa=0 makes
    the residual target 0 (never converges), radius 1e8 never hits the
    boundary, gradnorm_tol=0 never stops the outer loop early."""
    return RTRParams(
        max_iterations=3,
        max_tcg_iterations=K,
        gradnorm_tol=0.0,
        initial_radius=1e8,
        max_radius=1e8,
        tcg_kappa=0.0,
        tcg_theta=1.0,
    )


def main():
    out = {"platform": jax.default_backend(), "datasets": {}}
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    vpu = V5E_VPU_FP32
    out["vpu_peak_flops_nominal"] = vpu
    out["mxu_peak_flops_nominal"] = V5E_MXU_BF16
    log(f"VPU ceiling (spec-derived): {vpu/1e12:.2f} TFLOP/s")

    # round 4: MEASURED attainable VPU rate (validated logistic-chain
    # calibration; see scripts/measure_peaks.py) — the spec-derived
    # nominal assumed 4 dual-issue ALUs and overestimates this chip's
    # elementwise-chain throughput ~10x
    import measure_peaks

    cal = measure_peaks.measure_vpu_attainable()
    out["vpu_attainable_calibration"] = cal
    vpu_att = cal["vpu_attainable_flops"] if cal["valid"] else None
    if vpu_att:
        log(f"VPU attainable (measured): {vpu_att/1e12:.2f} TFLOP/s")
    # round 5 (VERDICT r4 #4): SECOND independent witness — a Pallas
    # coupled-map-lattice chain with a different op mix; the attainable
    # denominator is only load-bearing if both witnesses agree within 2x
    cal2 = measure_peaks.measure_vpu_cml()
    out["vpu_cml_calibration"] = cal2
    if vpu_att and cal2.get("valid") and cal2["vpu_attainable_flops"]:
        ratio = cal2["vpu_attainable_flops"] / vpu_att
        out["witness_agreement_ratio"] = round(ratio, 3)
        out["two_witness_valid"] = bool(0.5 < ratio < 2.0)
        log(
            f"VPU attainable (2nd witness, CML): "
            f"{cal2['vpu_attainable_flops']/1e12:.2f} TFLOP/s "
            f"(agreement {ratio:.2f}x)"
        )
    else:
        out["two_witness_valid"] = False

    for name, num_robots in [
        ("sphere2500", 5), ("cubicle", 2), ("torus3D", 2),
        ("parking-garage", 2), ("tunnels", 8),
    ]:
        prob, kg = build(name, num_robots)
        a = analytic(kg, prob.r)
        # parking-garage's chordal state exits tCG on negative curvature
        # immediately (round-4 row was void); sweep from a MID-SOLVE state
        presteps = 12 if name == "parking-garage" else 0
        state = _init_state(prob, kg, presteps)
        ks = [1, 10, 50]
        times = {}
        stds = {}
        for K in ks:
            dt, sd = solve_time(prob, kg, forced_params(K), state)
            times[K], stds[K] = dt, sd
            log(
                f"{name}: forced 3x{K} tCG -> {dt*1e3:.3f} "
                f"± {sd*1e3:.3f} ms"
            )
        # per-tCG slope from the K sweep (3 TR iterations each)
        slope = (times[50] - times[1]) / (3 * (50 - 1))
        slope_std = (stds[50] ** 2 + stds[1] ** 2) ** 0.5 / (3 * 49)
        intercept = times[1] - 3 * slope  # per-solve fixed + 3x(retract+trial)
        # validity (round 5): monotone positive sweep, every recorded time
        # positive, and the slope resolved beyond its own 2-sigma error bar
        slope_valid = (
            times[50] > times[10] > times[1] > 0
            and slope > 0.05 * (times[50] / (3 * 50))
            and slope > 2.0 * slope_std
        )
        # reference-budget solve (the bench config)
        bench_dt, bench_sd = solve_time(
            prob, kg,
            RTRParams(max_iterations=3, max_tcg_iterations=50,
                      gradnorm_tol=0.5),
            state,
        )
        floor_tcg = a["tcg_vpu_flops"] / vpu + a["q_mxu_flops"] / V5E_MXU_BF16
        floor_att = (
            (a["tcg_vpu_flops"] / vpu_att + a["q_mxu_flops"] / V5E_MXU_BF16)
            if vpu_att
            else None
        )
        # sublane-tile derate: row ops ride (r, n_pad) and (1, n_pad) slices
        # of the native (8,128) VPU tile -> r/8 occupancy on the dominant ops
        derate = prob.r / 8.0
        d = {
            **a,
            "slope_valid": slope_valid,
            "sweep_state": (
                f"mid-solve ({presteps} ref-budget presteps)"
                if presteps
                else "chordal"
            ),
            "per_tcg_iter_measured_s": slope,
            "per_tcg_iter_std_s": slope_std,
            "per_solve_intercept_s": intercept,
            "forced_times_s": {str(k): times[k] for k in ks},
            "forced_times_std_s": {str(k): stds[k] for k in ks},
            "bench_budget_solve_s": bench_dt,
            "bench_budget_solve_std_s": bench_sd,
            "per_tcg_floor_ideal_s": floor_tcg,
            "per_tcg_floor_tiled_s": floor_tcg / derate,
            "fraction_of_ideal": floor_tcg / slope,
            "fraction_of_tiled": (floor_tcg / derate) / slope,
            "per_tcg_floor_attainable_s": floor_att,
            "fraction_of_attainable": (
                floor_att / slope if floor_att else None
            ),
            "hbm_oneshot_s": (
                (a["C"] * a["n_pad"] * 4 * 2 + kg.E_loop_pad * 64)
                / V5E_HBM_BPS
            ),
        }
        if not slope_valid:
            for k in (
                "fraction_of_ideal", "fraction_of_tiled",
                "fraction_of_attainable",
            ):
                d[k] = None
            d["slope_invalid_reason"] = (
                "forced-budget sweep unresolved: either tCG exits on "
                "negative curvature at this sweep state (all budgets cost "
                "the same) or the slope did not clear its 2-sigma error "
                "bar — no load-bearing slope exists"
            )
        if name == "tunnels":
            # GNC program accounting: the robust outer loop adds one
            # weight-round XLA program per round (residuals on the rounded
            # trajectory + TLS weights + cache refresh) — time it
            d["gnc_weight_round_s"] = _time_weight_round(prob)
        out["datasets"][name] = d
        if slope_valid:
            log(
                f"{name}: slope {slope*1e6:.2f} us/tCG-iter; ideal floor "
                f"{floor_tcg*1e6:.2f} us "
                f"({100*d['fraction_of_ideal']:.1f}%), "
                f"tile-derated floor {floor_tcg/derate*1e6:.2f} us "
                f"({100*d['fraction_of_tiled']:.1f}%)"
                + (
                    f", attainable floor {floor_att*1e6:.2f} us "
                    f"({100*d['fraction_of_attainable']:.1f}%)"
                    if floor_att
                    else ""
                )
            )
        else:
            log(f"{name}: slope INVALID ({d['slope_invalid_reason']})")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ROOFLINE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
