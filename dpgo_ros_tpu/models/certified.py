"""Certifiably-correct centralized solve: the Riemannian staircase.

The reference's accuracy claims rest on the SE-Sync certifiable-correctness
line of work (``/root/reference/README.md:79-112``), but the reference stack
never *checks* its answers. This module closes the loop: solve the rank-r
relaxation tight, run the dual certificate (:mod:`dpgo_ros_tpu.ops
.certificate`), and if S has negative curvature, ascend one rank along the
escape eigenvector and re-solve — terminating with a *certified global
optimum* of the SDP relaxation (and, when rank(X) = d, of the original
SE(d) synchronization problem).

Used by the golden-optima pipeline (``scripts/golden_solves.py``) to prove
the published optima in docs/PERFORMANCE.md are the global optima of the
bundled dataset copies — turning the sphere2500 1693.5-vs-1687.0
"different dataset copy" annotation into a theorem about our copy.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.models.local_solvers import RTRParams, rtr_solve
from dpgo_ros_tpu.ops import certificate, chordal, quadratic, rounding, stiefel
from dpgo_ros_tpu.ops.quadratic import EdgeSet


class CertifiedResult(NamedTuple):
    X: jnp.ndarray  # final lifted solution (n, r_final, d+1)
    T: np.ndarray  # rounded(+refined) SE(d) trajectory (n, d, d+1)
    cost: float  # f(X) — the certified SDP optimum when certified
    rounded_cost: float  # f of the raw rank-d rounding
    refined_cost: float  # f after rank-d local refinement of the rounding;
    # == cost (to solver tolerance) ⟺ the relaxation is tight and T is the
    # certified global SE(d) optimum (parking-garage: the SDP face contains
    # a rank-4 optimizer the staircase lands on, raw rounding gives 1.77,
    # refinement recovers the rank-3 optimizer at the SDP value 1.26256)
    certified: bool
    rank: int
    min_eig: float
    crit_residual: float
    ranks_tried: tuple


def _tight_rtr(X, e, params: RTRParams, rounds: int):
    """Repeat the (jit-compiled, fixed-budget) RTR program until the
    gradient tolerance is actually met — each call resumes from the last
    iterate, so ``rounds × max_iterations`` is the true outer budget."""
    mask = jnp.ones((X.shape[0], 1, 1), X.dtype)
    Pinv = quadratic.precond_inverse(
        quadratic.precond_blocks(e, X.shape[0], damping=1e-2)
    )
    res = None
    for _ in range(rounds):
        X, res = rtr_solve(X, e, mask, Pinv, params)
        if float(res.gradnorm_opt) <= params.gradnorm_tol:
            break
    return X, res


def certified_solve(
    data,
    r0: Optional[int] = None,
    max_rank: Optional[int] = None,
    gradnorm_tol: float = 1e-6,
    eig_tol: float = 1e-5,
    crit_tol: float = 1e-4,
    rtr_iterations: int = 200,
    rtr_tcg_iterations: int = 400,
    rtr_rounds: int = 20,
    escape_step: float = 1e-2,
    dtype=jnp.float64,
    verbose: bool = False,
    lanczos_maxiter: Optional[int] = None,
) -> CertifiedResult:
    """Centralized certified solve of a PoseGraphData problem.

    Chordal init at rank ``r0`` (default d+2, the SE-Sync starting rung) →
    tight RTR → dual certificate → on failure, rank-ascend along the
    negative eigenvector with a backtracking step and re-solve.
    """
    from dpgo_ros_tpu.models.problem import LiftedProblem

    d = data.d
    r = r0 or d + 2
    max_rank = max_rank or d + 6
    prob = LiftedProblem.from_data(data, r=r, dtype=dtype)
    e = prob.edges
    params = RTRParams(
        max_iterations=rtr_iterations,
        max_tcg_iterations=rtr_tcg_iterations,
        gradnorm_tol=gradnorm_tol,
    )

    T0 = chordal.chordal_initialization(e, prob.n)
    T0 = rounding.anchor_to_first_pose(jnp.asarray(T0, dtype))
    if r == d:
        Ylift = jnp.eye(d, dtype=dtype)
    else:
        Ylift = stiefel.random_lifting_matrix(
            jax.random.PRNGKey(0), r, d, dtype
        )
    X = stiefel.lift_trajectory(T0, Ylift)

    ranks = []
    cert = None
    while True:
        ranks.append(X.shape[1])
        X, res = _tight_rtr(X, e, params, rtr_rounds)
        cert = certificate.certify(
            X, e, eig_tol=eig_tol, crit_tol=crit_tol,
            maxiter=lanczos_maxiter,
        )
        if verbose:
            print(
                f"[certified_solve] rank={X.shape[1]} "
                f"f={float(quadratic.cost(X, e)):.6f} "
                f"gradnorm={float(res.gradnorm_opt):.2e} "
                f"crit={cert.crit_residual:.2e} "
                f"min_eig={cert.min_eig:.3e} global={cert.is_global}",
                flush=True,
            )
        if cert.is_global or X.shape[1] >= max_rank:
            break
        # staircase: ascend one rank along the negative eigenvector with a
        # backtracking step (guaranteed descent for small enough alpha)
        Xp, dirn = certificate.escape_direction(X, cert)
        f0 = float(quadratic.cost(Xp, e))
        scale = float(jnp.linalg.norm(X)) / max(
            1.0, float(jnp.linalg.norm(dirn))
        )
        alpha = escape_step * scale
        for _ in range(30):
            X_try = stiefel.retract_polar(Xp, alpha * dirn)
            if float(quadratic.cost(X_try, e)) < f0:
                break
            alpha *= 0.5
        X = X_try

    T = np.asarray(
        rounding.anchor_to_first_pose(rounding.round_solution(X))
    )
    # cost of the rank-d rounding: evaluate at r = d — the PGO cost is
    # gauge-invariant, so lift by I_d
    eye_d = jnp.eye(d, dtype=dtype)
    Xr = stiefel.lift_trajectory(jnp.asarray(T, dtype), eye_d)
    rounded_cost = float(quadratic.cost(Xr, e))
    # SE-Sync-style local refinement of the rounding at rank d: when the
    # SDP face contains optimizers of rank > d, the raw SVD rounding is a
    # nearby but suboptimal SE(d) point; a rank-d RTR from it recovers the
    # rank-d optimizer (refined == cost ⟹ tight ⟹ T is certified optimal)
    Xr, _res = _tight_rtr(Xr, e, params, rtr_rounds)
    refined_cost = float(quadratic.cost(Xr, e))
    if refined_cost < rounded_cost:
        T = np.asarray(
            rounding.anchor_to_first_pose(
                rounding.round_solution(Xr)
            )
        )
    return CertifiedResult(
        X=X,
        T=T,
        cost=float(quadratic.cost(X, e)),
        rounded_cost=rounded_cost,
        refined_cost=refined_cost,
        certified=bool(cert.is_global),
        rank=int(X.shape[1]),
        min_eig=float(cert.min_eig),
        crit_residual=float(cert.crit_residual),
        ranks_tried=tuple(ranks),
    )
