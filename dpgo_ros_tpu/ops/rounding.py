"""Rounding a rank-r solution back to SE(d), and gauge/anchor handling.

Capability parity with DPGO's solution recovery
(``getTrajectoryInGlobalFrame`` / ``setGlobalAnchor`` semantics, SURVEY.md
§2.3): SE-Sync-style rounding via a thin SVD of the stacked lifted state,
determinant sign fix, per-pose projection to SO(d), and anchoring of the
first pose to the identity (reference ``anchorFirstPose``,
``src/PGOAgentROS.cpp:360,412-441``).
"""

from __future__ import annotations

import jax.numpy as jnp

from dpgo_ros_tpu.ops.lie import project_to_so, se_compose, se_inverse


def round_solution(X: jnp.ndarray) -> jnp.ndarray:
    """Round lifted X (n, r, d+1) to an SE(d) trajectory (n, d, d+1).

    SE-Sync rounding: stack X into an r × n(d+1) matrix, take the top-d left
    singular subspace U_d, project X through it, fix the global reflection by
    majority determinant vote, then re-project each rotation block to SO(d).
    """
    n, r, dp1 = X.shape
    d = dp1 - 1
    M = jnp.transpose(X, (1, 0, 2)).reshape(r, n * dp1)
    U, s, Vt = jnp.linalg.svd(M, full_matrices=False)
    Ud = U[:, :d]  # (r, d)
    Xd = jnp.einsum("rd,nrk->ndk", Ud, X)  # (n, d, d+1)
    # majority determinant vote decides the global reflection
    dets = jnp.linalg.det(Xd[:, :, :d])
    flip = jnp.where(jnp.sum(jnp.sign(dets)) < 0, -1.0, 1.0)
    Xd = Xd.at[:, d - 1, :].multiply(flip)
    Rr = project_to_so(Xd[:, :, :d])
    return jnp.concatenate([Rr, Xd[:, :, d:]], axis=-1)


def round_via_lifting(X: jnp.ndarray, Ylift: jnp.ndarray) -> jnp.ndarray:
    """Per-pose world-frame recovery through the shared lifting matrix:
    R_i = proj_SO(YLiftᵀ Y_i), t_i = YLiftᵀ p_i.

    This is how a robot recovers SE(d) poses *locally mid-solve* — the
    reference's ``getPoseInGlobalFrame`` / ``getTrajectoryInGlobalFrame``
    (SURVEY.md §2.3) — no global SVD needed. Exact when X = YLift·T; the
    thin-SVD rounding (``round_solution``) is the final-answer variant.
    """
    d = X.shape[-1] - 1
    Z = jnp.einsum("rd,nrk->ndk", Ylift, X)  # (n, d, d+1)
    R = project_to_so(Z[:, :, :d])
    return jnp.concatenate([R, Z[:, :, d:]], axis=-1)


def anchor_to_first_pose(T: jnp.ndarray, anchor: jnp.ndarray | None = None) -> jnp.ndarray:
    """Express trajectory relative to its first pose (or a given anchor pose).

    T'_i = anchor ∘ T_0^{-1} ∘ T_i, so T'_0 == anchor (identity by default).
    This is the reference's global-frame convention: the leader anchors its
    first pose (``anchorFirstPose``) and rounds are re-anchored to the cached
    optimized pose across instances (``src/PGOAgentROS.cpp:353-361``).
    """
    T0inv = se_inverse(T[0])
    rel = se_compose(T0inv[None], T)
    if anchor is not None:
        rel = se_compose(anchor[None], rel)
    return rel


def align_umeyama(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """SE(d)-align est translations to ref (no scale) — for ATE evaluation.

    Returns the aligned copy of ``est`` (n, d, d+1).
    """
    d = est.shape[1]
    te, tr = est[:, :, d], ref[:, :, d]
    mue, mur = jnp.mean(te, axis=0), jnp.mean(tr, axis=0)
    H = (te - mue).T @ (tr - mur)
    # R maps est → ref
    R = project_to_so(H.T)
    t = mur - R @ mue
    A = jnp.concatenate([R, t[:, None]], axis=-1)  # (d, d+1)
    return se_compose(jnp.broadcast_to(A, (est.shape[0], d, d + 1)), est)


def ate_translation(est: jnp.ndarray, ref: jnp.ndarray, align: bool = True) -> jnp.ndarray:
    """RMSE absolute trajectory error over translations."""
    d = est.shape[1]
    if align:
        est = align_umeyama(est, ref)
    diff = est[:, :, d] - ref[:, :, d]
    return jnp.sqrt(jnp.mean(jnp.sum(diff * diff, axis=-1)))
