"""Large-world scale bench for the HBM windowed-DMA kernel (VERDICT r4 #3).

Compares the HBM-resident windowed kernel (``ops/hbm_rtr.py`` — VMEM
working set independent of n) against the VMEM-resident kernel at sizes
where both compile, then pushes past the VMEM kernel's 25k compile
ceiling (remote compile service HTTP 500, bisected round 4) with the
much smaller windowed program.

Harness: K chained block solves (solve i+1 consumes solve i's output
state — a real RBCD sweep over robots, no identical re-execution), one
sync at the end (round-5 bench methodology). Reports per-solve wall and
the in-kernel tCG counter.

Writes HBM_SCALE_r05.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

os.makedirs("/tmp/jax_cache_tpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.io.synthetic import generate_world
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import fused_rtr, hbm_rtr
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule

K_SOLVES = 40


def log(m):
    print(f"# [{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def setup(n, num_robots):
    data, _, _ = generate_world(
        "sphere", n=n, num_robots=num_robots, rot_noise=0.01,
        trans_noise=0.05, seed=0,
    )
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=num_robots,
        update_rule=UpdateRule.ROUND_ROBIN,
        local_initialization_method=InitMethod.ODOMETRY,
        RTR_iterations=3,
        RTR_tCG_iterations=50,
        RTR_gradnorm_tol=0.5,
        dtype="float32",
    )
    eng = RBCDEngine(prob, cfg)
    st = eng.initialize()
    kg = eng._kg
    e = eng._edges(st.weights)
    Xt = fused_rtr.to_t(st.X, kg.n_pad)
    pt = fused_rtr.pinv_to_t(eng._precond_inv(e), kg.n_pad)
    wrows = kg.weight_rows(e, e.weight)
    return prob, eng, kg, Xt, pt, wrows


def chain(run_one, Xt, R, k):
    """k chained solves sweeping robots round-robin; sync once."""
    stats = []
    t0 = time.perf_counter()
    for i in range(k):
        Xt, s = run_one(Xt, i % R)
        stats.append(s)
    Xt.block_until_ready()
    dt = time.perf_counter() - t0
    return dt, Xt, stats


def bench_one(n, num_robots, compare_vmem):
    prob, eng, kg, Xt0, pt, wrows = setup(n, num_robots)
    if kg.E_loop > 0:
        return {"n": n, "error": f"E_loop={kg.E_loop} not banded"}
    W = hbm_rtr.window_width(kg)
    row = {
        "n": n, "num_robots": num_robots, "n_pad": kg.n_pad,
        "diags2": list(kg.diags2), "window_W": W, "k_solves": K_SOLVES,
    }
    offs = [int(o) for o in kg.offsets]
    lens = [int(p) for p in kg.num_poses]
    prepared = hbm_rtr.prepare_operands(kg, pt, wrows)

    def run_hbm(Xt, rb):
        return hbm_rtr.rtr_solve_hbm(
            Xt, jnp.asarray(offs[rb], jnp.int32),
            jnp.asarray(lens[rb], jnp.int32),
            pt, wrows, kg, eng.rtr_params, prepared=prepared,
        )

    # warm + compile (this is the 30k+ compile attempt)
    try:
        Xw, sw = run_hbm(Xt0, 0)
        Xw.block_until_ready()
    except Exception as exc:
        row["hbm_error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
        log(f"n={n}: HBM kernel FAILED: {row['hbm_error']}")
        return row
    dt, _, stats = chain(run_hbm, Xt0, num_robots, K_SOLVES)
    tcg = [int(np.asarray(s)[0, 5]) for s in stats]
    row["hbm_ms_per_solve"] = round(dt / K_SOLVES * 1e3, 4)
    row["hbm_tcg_per_solve"] = round(float(np.mean(tcg)), 1)
    row["hbm_solves_per_sec"] = round(K_SOLVES / dt, 2)
    log(
        f"n={n}: HBM {row['hbm_ms_per_solve']} ms/solve "
        f"({row['hbm_tcg_per_solve']} tCG/solve, W={W})"
    )

    if compare_vmem:
        mrows = []
        for rb in range(num_robots):
            m = np.zeros((prob.n, 1, 1), np.float32)
            m[offs[rb]: offs[rb] + lens[rb]] = 1.0
            mrows.append(fused_rtr.mask_to_row(jnp.asarray(m), kg.n_pad))

        def run_vmem(Xt, rb):
            return fused_rtr.rtr_solve_fused(
                Xt, mrows[rb], pt, wrows, kg, eng.rtr_params,
                oh=eng._kg_oh,
            )

        try:
            Xw, _ = run_vmem(Xt0, 0)
            Xw.block_until_ready()
            dtv, _, statsv = chain(run_vmem, Xt0, num_robots, K_SOLVES)
            tcgv = [int(np.asarray(s)[0, 5]) for s in statsv]
            row["vmem_ms_per_solve"] = round(dtv / K_SOLVES * 1e3, 4)
            row["vmem_tcg_per_solve"] = round(float(np.mean(tcgv)), 1)
            row["hbm_overhead_x"] = round(
                row["hbm_ms_per_solve"] / row["vmem_ms_per_solve"], 3
            )
            log(
                f"n={n}: VMEM {row['vmem_ms_per_solve']} ms/solve → "
                f"HBM overhead {row['hbm_overhead_x']}x"
            )
        except Exception as exc:
            row["vmem_error"] = f"{type(exc).__name__}: {str(exc)[:300]}"
            log(f"n={n}: VMEM kernel failed: {row['vmem_error']}")
    return row


def main():
    log(f"backend={jax.default_backend()}")
    rows = []
    for n, R, cmp_v in (
        (2500, 5, True),
        (25000, 10, True),
        (30000, 12, False),
        (50000, 16, False),
    ):
        try:
            rows.append(bench_one(n, R, cmp_v))
        except Exception as exc:
            log(f"n={n} setup FAILED: {type(exc).__name__}: {str(exc)[:200]}")
            rows.append({"n": n, "error": str(exc)[:300]})
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "HBM_SCALE_r05.json",
    )
    out = {
        "platform": jax.default_backend(),
        "note": "chained distinct-state solves, one end sync; HBM windowed "
                "kernel vs VMEM-resident kernel (ops/hbm_rtr.py)",
        "rows": rows,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
