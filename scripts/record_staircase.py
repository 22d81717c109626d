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
    # parking-garage's SDP optimal face contains a rank-4 optimizer
    # (see CertifiedResult docstring): a staircase STARTED at rank d=3
    # finds the best rank-3 critical point, which the certificate must
    # reject with genuine negative curvature — a real ascent with no
    # adversarial init needed
    rows = [run_one("parking-garage", seed=0, init="chordal")]
    out = {
        "note": "Riemannian-staircase rank ascent exercised on a real "
                "bundled dataset: parking-garage started AT rank d=3 "
                "(its SDP optimizer has rank 4, so the best rank-3 "
                "critical point genuinely fails the dual certificate "
                "with negative curvature and the escape must ascend). "
                "min_eig_check/margin_verified: second-shift Lanczos "
                "margin guard (ops/certificate.py).",
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
