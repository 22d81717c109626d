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
    # second-shift margin guard (ops/certificate.py, round 4)
    min_eig_check: Optional[float] = None
    margin_verified: bool = True


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
    init: str = "chordal",
    init_seed: int = 0,
) -> CertifiedResult:
    """Centralized certified solve of a PoseGraphData problem.

    Init at rank ``r0`` (default d+2, the SE-Sync starting rung) →
    tight RTR → dual certificate → on failure, rank-ascend along the
    negative eigenvector with a backtracking step and re-solve.

    ``init="random"`` starts from a random point instead of chordal —
    with ``r0=d`` this reliably lands in suboptimal critical points and
    exercises the staircase's escape path on real datasets (round 4,
    ``scripts/record_staircase.py``).
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

    if init == "random":
        key = jax.random.PRNGKey(init_seed)
        Y0 = stiefel.random_stiefel(key, prob.n, r, d, dtype)
        p0 = 2.0 * jax.random.normal(
            jax.random.fold_in(key, 1), (prob.n, r, 1), dtype
        )
        X = jnp.concatenate([Y0, p0], axis=-1)
    elif init == "perturbed":
        # chordal init + a large tangent kick: lands in suboptimal basins
        # at r0=d (exercising the staircase escape on real datasets)
        # while staying well-conditioned enough for RTR to reach a
        # critical point — fully-random inits were observed to stall
        # short of criticality on smallGrid3D (round 4)
        key = jax.random.PRNGKey(init_seed)
        T0 = chordal.chordal_initialization(e, prob.n)
        T0 = rounding.anchor_to_first_pose(jnp.asarray(T0, dtype))
        Ylift = (
            jnp.eye(d, dtype=dtype)
            if r == d
            else stiefel.random_lifting_matrix(key, r, d, dtype)
        )
        X = stiefel.lift_trajectory(T0, Ylift)
        noise = jax.random.normal(
            jax.random.fold_in(key, 2), X.shape, dtype
        )
        X = stiefel.retract_polar(
            X, 3.0 * stiefel.proj_tangent(X, noise)
        )
    else:
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
    crit_retries = 0
    while True:
        if not ranks or ranks[-1] != X.shape[1]:
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
        if cert.eigvec is None:
            # not yet critical to crit_tol (adversarial inits can need
            # more than one tight-RTR budget at a rank) — keep solving at
            # the SAME rank; an escape needs the certificate eigenvector
            crit_retries += 1
            if crit_retries > 5:
                break  # give up: report the uncertified point honestly
            continue
        crit_retries = 0
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
        min_eig_check=(
            None if cert.min_eig_check is None
            else float(cert.min_eig_check)
        ),
        margin_verified=bool(cert.margin_verified),
    )
