"""Robust costs and the GNC-TLS graduated non-convexity loop.

Capability parity with DPGO's ``RobustCost`` family
(``RobustCostParameters{Type∈{L2,L1,Huber,TLS,GM,GNC_TLS}, GNCBarc,
GNCMuStep, GNCInitMu}``, reference ``src/PGOAgentROSNode.cpp:174-211``) and
the wrapper's weight-update round (``updateMeasurementWeights`` /
``setMeasurementWeight``, ``src/PGOAgentROS.cpp:1211-1233, 1315-1353``).

Residual convention: per-edge whitened residual
    r_e = sqrt( κ_e ||R_j − R_i R_e||_F² + τ_e ||t_j − t_i − R_i t_e||² )
evaluated on the current *rounded* SE(d) trajectory, compared against the
GNC threshold ``barc`` (χ²-quantile-derived when GNC_use_probability).
"""

from __future__ import annotations

import jax.numpy as jnp

from dpgo_ros_tpu.ops.quadratic import EdgeSet


def measurement_residuals(T: jnp.ndarray, e: EdgeSet) -> jnp.ndarray:
    """Whitened residual r_e per edge on an SE(d) trajectory T (n, d, d+1).

    Parity with ``PGOAgent::computeMeasurementResidual`` call sites
    (reference ``src/PGOAgentROS.cpp:1049``).
    """
    d = T.shape[1]
    Ti, Tj = T[e.src], T[e.dst]
    Ri, ti = Ti[:, :, :d], Ti[:, :, d]
    Rj, tj = Tj[:, :, :d], Tj[:, :, d]
    dR = Rj - jnp.einsum("eab,ebc->eac", Ri, e.R)
    dt = tj - ti - jnp.einsum("eab,eb->ea", Ri, e.t)
    sq = e.kappa * jnp.sum(dR * dR, axis=(-2, -1)) + e.tau * jnp.sum(
        dt * dt, axis=-1
    )
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def gnc_tls_weights(
    residuals: jnp.ndarray, mu: jnp.ndarray, barc: float
) -> jnp.ndarray:
    """GNC-TLS weight update (Yang et al., 'Graduated Non-Convexity for
    Robust Spatial Perception', RA-L 2020 — the scheme behind DPGO's
    GNC_TLS robust cost):

        w = 0                                if r² ≥ ((μ+1)/μ) c̄²
        w = 1                                if r² ≤ (μ/(μ+1)) c̄²
        w = (c̄/r)·sqrt(μ(μ+1)) − μ          otherwise
    """
    r2 = residuals * residuals
    c2 = barc * barc
    hi = (mu + 1.0) / mu * c2
    lo = mu / (mu + 1.0) * c2
    mid = barc / jnp.maximum(residuals, 1e-12) * jnp.sqrt(
        mu * (mu + 1.0)
    ) - mu
    w = jnp.where(r2 >= hi, 0.0, jnp.where(r2 <= lo, 1.0, mid))
    return jnp.clip(w, 0.0, 1.0)


def robust_weight(rtype: str, residuals: jnp.ndarray, barc: float) -> jnp.ndarray:
    """IRLS weights for the non-GNC robust costs (DPGO
    ``mRobustCost.weight(residual)``, reference ``PGOAgentROS.cpp:1050``)."""
    r = jnp.maximum(jnp.abs(residuals), 1e-12)
    if rtype == "L2":
        return jnp.ones_like(r)
    if rtype == "L1":
        return 1.0 / r
    if rtype == "Huber":
        return jnp.where(r <= barc, 1.0, barc / r)
    if rtype == "TLS":
        return (r <= barc).astype(r.dtype)
    if rtype == "GM":  # Geman-McClure
        return (barc**2 / (barc**2 + r * r)) ** 2
    raise ValueError(f"unknown robust cost {rtype}")


def mu_for_round(
    weight_update_count,
    cfg,
    mu_state,
    dtype=jnp.float64,
    residuals=None,
    loop_mask=None,
):
    """μ for the current GNC round under the configured schedule (jit-safe).

    "adaptive" (default): anneal the hard-rejection cutoff from the current
    residual scale down to ~barc. The TLS w=0 cutoff is
    c(μ) = √((μ+1)/μ)·c̄; round k of K uses
    cutoff_k = max(1.05·c̄, P90(r_loops)^(1−α) · (1.05·c̄)^α), α=(k+1)/K,
    i.e. geometric interpolation in log-space — nothing is hard-rejected
    faster than the trajectory can tighten, and the last round is
    (near-)hard TLS. μ = c̄²/(cutoff² − c̄²). GNC with a residual-scale-aware
    μ is standard practice (GTSAM's GncOptimizer initializes
    μ₀ = c̄²/(2 r_max² − c̄²)); the fixed reference schedule
    (init_mu·mu_step^k from 1e-5) cannot reject anything nor accept anything
    within its demo budget.

    "geometric": μ interpolates GNC_mu_start → GNC_mu_end across rounds.
    "reference": the running μ state (init_mu · mu_step^k).
    """
    schedule = getattr(cfg, "GNC_schedule", "reference")
    if schedule == "reference":
        return mu_state
    K = max(int(cfg.robust_opt_num_weight_updates), 1)
    k = jnp.asarray(weight_update_count, dtype)
    if schedule == "geometric":
        frac = k / max(K - 1, 1)
        log_mu = jnp.log(cfg.GNC_mu_start) + frac * (
            jnp.log(cfg.GNC_mu_end) - jnp.log(cfg.GNC_mu_start)
        )
        return jnp.exp(log_mu)
    # adaptive
    assert residuals is not None and loop_mask is not None
    barc = cfg.GNC_barc
    floor = 1.05 * barc
    r = jnp.where(loop_mask > 0, residuals, jnp.nan)
    p90 = jnp.nan_to_num(jnp.nanpercentile(r, 90.0), nan=floor)
    p90 = jnp.maximum(p90, floor)
    alpha = (k + 1.0) / K
    cutoff = jnp.exp(
        (1.0 - alpha) * jnp.log(p90) + alpha * jnp.log(floor)
    )
    cutoff = jnp.maximum(cutoff, floor)
    return (barc * barc) / (cutoff * cutoff - barc * barc)


def gnc_round_params(
    weight_update_count,
    cfg,
    mu_state,
    residuals,
    loop_mask,
    dtype=jnp.float64,
):
    """(μ, barc) to use for this GNC round.

    "adaptive" (default) anneals the *threshold* with full-strength weights:
    barc_k shrinks geometrically from the current loop-residual P90 to the
    configured barc across the K scheduled rounds, while μ is held at O(1)
    (μ=3 ⇒ w=1 for r ≤ 0.87·barc_k, w=0 for r ≥ 1.15·barc_k). Unlike
    μ-annealing — whose mid-region weights (c̄/r)√μ are ≪1 until μ≈1 and
    therefore never let plausible inliers pull the trajectory — threshold
    annealing keeps plausible edges at full weight each round, so their
    residuals actually tighten before the cutoff reaches barc.

    Other schedules anneal μ against the fixed configured barc
    (see :func:`mu_for_round`).
    """
    schedule = getattr(cfg, "GNC_schedule", "reference")
    if schedule != "adaptive":
        mu = mu_for_round(
            weight_update_count, cfg, mu_state, dtype=dtype,
            residuals=residuals, loop_mask=loop_mask,
        )
        return mu, jnp.asarray(cfg.GNC_barc, dtype)
    K = max(int(cfg.robust_opt_num_weight_updates), 1)
    k = jnp.asarray(weight_update_count, dtype)
    barc = cfg.GNC_barc
    r = jnp.where(loop_mask > 0, residuals, jnp.nan)
    p90 = jnp.nan_to_num(jnp.nanpercentile(r, 90.0), nan=barc)
    p90 = jnp.maximum(p90, barc)
    alpha = (k + 1.0) / K
    barc_k = jnp.exp(
        (1.0 - alpha) * jnp.log(p90) + alpha * jnp.log(barc)
    )
    barc_k = jnp.maximum(barc_k, barc)
    return jnp.asarray(3.0, dtype), barc_k


def update_weights_gnc(
    weights: jnp.ndarray,
    fixed_mask: jnp.ndarray,
    residuals: jnp.ndarray,
    mu: jnp.ndarray,
    barc: float,
    mu_step: float,
):
    """One GNC outer-loop weight update.

    Fixed-weight edges (odometry / known inliers / converged-frozen) keep
    their weight (reference fixedWeight semantics, ``utils.cpp:141-149``,
    freeze at ``PGOAgentROS.cpp:1044-1069``). Returns (weights, next_mu).
    """
    w_new = gnc_tls_weights(residuals, mu, barc)
    w = jnp.where(fixed_mask > 0, weights, w_new)
    return w, mu * mu_step


def classify_weights(weights: jnp.ndarray, is_loop: jnp.ndarray, mask: jnp.ndarray):
    """(accepted, rejected, undecided) loop-closure counts — the reference's
    GNC statistics at TERMINATE (``PoseGraph::statistics()``,
    ``PGOAgentROS.cpp:1058-1067``)."""
    sel = (is_loop > 0) & (mask > 0)
    acc = jnp.sum(sel & (weights >= 1.0 - 1e-6))
    rej = jnp.sum(sel & (weights <= 1e-6))
    und = jnp.sum(sel) - acc - rej
    return acc, rej, und
