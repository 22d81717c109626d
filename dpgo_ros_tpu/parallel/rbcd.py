"""The multi-robot RBCD engine — the framework's core solver loop.

This is the TPU-native re-design of the reference's distributed round
structure (SURVEY.md §3.2): the event-driven FSM over lossy pub/sub becomes a
deterministic schedule over jit-compiled block updates on a single global
lifted state X. The three update rules:

* ``Uniform`` / ``RoundRobin`` — sequential token passing, exactly the
  reference's synchronous RBCD (``publishUpdateCommand``,
  ``src/PGOAgentROS.cpp:443-504``): one robot optimizes its block per
  iteration, everyone else only observes.
* ``Parallel`` — the TPU-native generalization: a greedy coloring of the
  robot adjacency graph (robots adjacent iff they share loop closures); all
  robots of one color update *simultaneously* each iteration. Within a color
  class the joint Hessian is block-diagonal, so a single masked trust-region
  solve on the union mask IS the set of independent per-robot block solves —
  provably convergent (it is exact block-coordinate descent over color
  classes), with num_colors ≤ num_robots steps per sweep instead of
  num_robots. (SURVEY.md §2.4 notes the sequential token is an artifact of
  lossy robot networks, not of the math.)

Nesterov acceleration maintains the auxiliary sequence the reference
exchanges as ``is_auxiliary`` PublicPoses (``src/PGOAgentROS.cpp:662-690``),
with adaptive + periodic restart (``restart_interval``). GNC-TLS outer
rounds mirror ``commandCallback(UPDATE_WEIGHT)`` (``PGOAgentROS.cpp:1211-1233``).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.models import robust
from dpgo_ros_tpu.models.local_solvers import (
    OptResult,
    RGDParams,
    RTRParams,
    rgd_solve,
    rtr_solve,
)
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import chordal as chordal_ops
from dpgo_ros_tpu.ops import fused_rtr, lie, quadratic, rounding, stiefel
from dpgo_ros_tpu.types import EdgeType
from dpgo_ros_tpu.utils.config import (
    AgentConfig,
    InitMethod,
    RobustCostType,
    SolverMethod,
    UpdateRule,
)


class RBCDState(NamedTuple):
    """Device-resident solver state (a pytree; one per fleet)."""

    X: jnp.ndarray  # (n, r, d+1) lifted main iterate, global frame
    X_prev: jnp.ndarray  # per-block previous accepted iterate (momentum)
    V: jnp.ndarray  # auxiliary (extrapolated) sequence — what neighbors see;
    # the reference exchanges it as is_auxiliary PublicPoses
    # (``src/PGOAgentROS.cpp:662-690``)
    theta: jnp.ndarray  # Nesterov scalar sequence
    iteration: jnp.ndarray  # i32
    cost: jnp.ndarray
    rel_change: jnp.ndarray  # (num_robots,) last per-robot relative change
    weights: jnp.ndarray  # (E,) current robust weights
    fixed_mask: jnp.ndarray  # (E,) 1.0 where weight is frozen
    mu: jnp.ndarray  # GNC mu
    weight_update_count: jnp.ndarray  # i32


class RBCDEngine:
    """Owns a LiftedProblem + AgentConfig; exposes jitted step functions and
    a host-side driver (`run`) implementing the reference round protocol."""

    def __init__(self, problem: LiftedProblem, config: AgentConfig):
        self.problem = problem
        self.config = config.resolve()
        self.dtype = jnp.float64 if self.config.dtype == "float64" else jnp.float32
        cfg = self.config
        self.rtr_params = RTRParams(
            max_iterations=cfg.RTR_iterations,
            max_tcg_iterations=cfg.RTR_tCG_iterations,
            gradnorm_tol=cfg.RTR_gradnorm_tol,
        )
        self.rgd_params = RGDParams(
            stepsize=cfg.RGD_stepsize,
            use_preconditioner=cfg.RGD_use_preconditioner,
        )
        # (num_robots, n, 1, 1) stack of block masks — built in numpy and
        # transferred once (per-robot device ops would each pay the remote
        # dispatch/compile cost on a tunneled TPU runtime)
        rof = np.asarray(problem.robot_of_pose)
        np_dt = np.float64 if self.dtype == jnp.float64 else np.float32
        masks_np = np.stack(
            [
                (rof == k).astype(np_dt)[:, None, None]
                for k in range(problem.num_robots)
            ],
            axis=0,
        )
        self._masks_np = masks_np  # host copies: prep stays d2h-free
        self._masks = jnp.asarray(masks_np)
        self._all_mask = jnp.ones_like(self._masks[0])
        # greedy coloring of the robot adjacency graph for the Parallel rule
        self.robot_colors = self._color_robots()
        self.num_colors = int(self.robot_colors.max()) + 1
        color_masks_np = np.stack(
            [
                np.clip(
                    sum(
                        masks_np[k]
                        for k in range(problem.num_robots)
                        if self.robot_colors[k] == c
                    ),
                    0.0,
                    1.0,
                )
                for c in range(self.num_colors)
            ],
            axis=0,
        )
        self._color_masks_np = color_masks_np
        self._color_masks = jnp.asarray(color_masks_np)
        self._adjf = jnp.asarray(self._adj_np.astype(np_dt))  # (R, R)
        self.Ylift: Optional[jnp.ndarray] = None

        # single-Pallas-kernel RTR solve (ops/fused_rtr.py): collapses a full
        # block update into one kernel execution — the fp32 TPU hot path
        auto = (
            self.dtype == jnp.float32
            and jax.default_backend() == "tpu"
        )
        want = cfg.use_fused_kernel if cfg.use_fused_kernel is not None else auto
        self._use_fused = bool(
            want
            and self.config.solver == SolverMethod.RTR
            and self.dtype == jnp.float32
            and problem.num_robots <= fused_rtr.MAX_ROBOTS
        )
        self._interpret_fused = jax.default_backend() != "tpu"
        self._kg = (
            fused_rtr.build_kernel_graph(problem) if self._use_fused else None
        )
        # HBM windowed-DMA block solve (ops/hbm_rtr.py, round 5): large
        # banded worlds exceed the remote compile service's program-size
        # ceiling for every VMEM-resident kernel (bisected ~25k poses,
        # HTTP 500); the windowed kernel's program is independent of n.
        # Sequential update rules only (a color class is not one
        # contiguous window).
        import os as _os

        _hbm_min = int(_os.environ.get("DPGO_HBM_NPAD_MIN", "16384"))
        self._use_hbm = bool(
            self._use_fused
            and self._kg is not None
            and self._kg.E_loop == 0
            and self._kg.n_pad > _hbm_min
            and cfg.update_rule != UpdateRule.PARALLEL
        )
        # precomputed bf16 one-hot gather/scatter table (VMEM-resident for
        # the whole solve) — the round-3 fast path; None falls back to the
        # chunked on-the-fly construction for tables too big for VMEM
        self._kg_oh = (
            self._kg.oh_table()
            if self._use_fused and self._kg.want_tabled()
            else None
        )

        self._step_seq = jax.jit(self._step_sequential_impl)
        self._step_par = jax.jit(self._step_parallel_impl)
        self._weight_upd = jax.jit(self._weight_update_impl)

    def _color_robots(self) -> np.ndarray:
        """Greedy coloring of robots; adjacent iff they share measurements
        (the separator structure, reference shared loop closures)."""
        prob = self.problem
        nR = prob.num_robots
        he = prob.host_edges
        src_r = np.asarray(prob.robot_of_pose)[np.asarray(he.src)]
        dst_r = np.asarray(prob.robot_of_pose)[np.asarray(he.dst)]
        mask = np.asarray(he.mask) > 0
        adj = np.zeros((nR, nR), bool)
        cross = mask & (src_r != dst_r)
        adj[src_r[cross], dst_r[cross]] = True
        adj[dst_r[cross], src_r[cross]] = True
        self._adj_np = adj  # robot adjacency — also used for the
        # neighbor-invalidation termination rule (_finish_step)
        colors = -np.ones(nR, np.int32)
        for k in np.argsort(-adj.sum(1)):  # highest degree first
            used = set(colors[adj[k]]) - {-1}
            c = 0
            while c in used:
                c += 1
            colors[k] = c
        return colors

    # ------------------------------------------------------------------ init

    def _edges(self, weights: jnp.ndarray) -> quadratic.EdgeSet:
        return dataclasses.replace(self.problem.edges, weight=weights)

    def _local_subgraph_traj(self, robot: int) -> np.ndarray:
        """Local initialization for one robot on its private subgraph
        (odometry + private LCs), per ``localInitializationMethod``
        (reference ``PGOAgentROSNode.cpp:104-117``)."""
        prob, cfg = self.problem, self.config
        data = prob.data
        assert data is not None
        m = data.measurements
        nk = int(prob.num_poses[robot])
        mine = (
            (m.src_robot == robot)
            & (m.dst_robot == robot)
        )
        if cfg.local_initialization_method == InitMethod.ODOMETRY:
            odo = mine & (m.edge_type == EdgeType.ODOMETRY)
            idx = np.argsort(m.src_frame[np.asarray(odo)])
            R = m.R[np.asarray(odo)][idx]
            t = m.t[np.asarray(odo)][idx]
            frames = m.src_frame[np.asarray(odo)][idx]
            rel = np.zeros((nk - 1, prob.d, prob.d + 1))
            rel[:, :, : prob.d] = np.eye(prob.d)
            for a, f in enumerate(frames):
                if f < nk - 1:
                    rel[f, :, : prob.d] = R[a]
                    rel[f, :, prob.d] = t[a]
            return np.asarray(lie.odometry_chain(jnp.asarray(rel, self.dtype)))
        else:  # Chordal, or GNC_TLS robust local initialization
            sel = np.asarray(mine)
            E = int(sel.sum())
            odo = jnp.asarray(
                (m.edge_type[sel] == EdgeType.ODOMETRY).astype(np.float64),
                self.dtype,
            )
            es = quadratic.EdgeSet(
                src=jnp.asarray(m.src_frame[sel].astype(np.int32)),
                dst=jnp.asarray(m.dst_frame[sel].astype(np.int32)),
                R=jnp.asarray(m.R[sel], self.dtype),
                t=jnp.asarray(m.t[sel], self.dtype),
                kappa=jnp.asarray(m.kappa[sel], self.dtype),
                tau=jnp.asarray(m.tau[sel], self.dtype),
                weight=jnp.asarray(m.weight[sel], self.dtype),
                mask=jnp.ones((E,), self.dtype),
                is_loop=jnp.zeros((E,), self.dtype),
            )
            T = np.asarray(
                chordal_ops.chordal_initialization(es, nk, max_iters=500)
            )
            if cfg.local_initialization_method == InitMethod.GNC_TLS:
                # robust local init (reference GNC_TLS init method): annealed
                # truncation — reject private loop closures whose residual
                # exceeds a shrinking cutoff, re-solving chordally each
                # round. robustInitMinInliers (reference
                # ``PGOAgentROSNode.cpp:212-221``): never truncate below the
                # minimum inlier count — stop tightening instead.
                barc = cfg.GNC_barc
                for factor in (10.0, 3.0, 1.5):
                    r_e = robust.measurement_residuals(
                        jnp.asarray(T, self.dtype), es
                    )
                    keep = np.asarray(odo > 0) | (
                        np.asarray(r_e) <= factor * barc
                    )
                    n_inlier_loops = int((keep & ~np.asarray(odo > 0)).sum())
                    if n_inlier_loops < cfg.robust_init_min_inliers:
                        break
                    es = dataclasses.replace(
                        es,
                        weight=jnp.asarray(
                            keep.astype(np.float64), self.dtype
                        ),
                    )
                    T = np.asarray(
                        chordal_ops.chordal_initialization(
                            es, nk, max_iters=500
                        )
                    )
            return T

    def _align_robot_frames(self, local_trajs: List[np.ndarray]) -> np.ndarray:
        """Multi-robot initialization: BFS frame alignment over the robot
        adjacency graph using shared measurements — the deterministic
        equivalent of the reference's distributed initialization rounds
        (``tryInitialize`` / ``initializeInGlobalFrame``,
        ``src/PGOAgentROS.cpp:322-366``; leader = robot 0 anchors the global
        frame)."""
        prob = self.problem
        data = prob.data
        assert data is not None
        m = data.measurements
        nR = prob.num_robots
        G: List[Optional[np.ndarray]] = [None] * nR
        G[0] = np.concatenate(
            [np.eye(prob.d), np.zeros((prob.d, 1))], axis=-1
        )
        shared = m.edge_type == EdgeType.SHARED_LOOP_CLOSURE
        order = np.where(np.asarray(shared))[0]
        # BFS over robots
        frontier = [0]
        visited = {0}
        while frontier:
            a = frontier.pop(0)
            for k in order:
                ra, rb = int(m.src_robot[k]), int(m.dst_robot[k])
                if ra == a and rb not in visited:
                    G[rb] = self._align_pair(G[a], local_trajs[a], local_trajs[rb], m, k, src_side=True)
                    visited.add(rb)
                    frontier.append(rb)
                elif rb == a and ra not in visited:
                    G[ra] = self._align_pair(G[a], local_trajs[a], local_trajs[ra], m, k, src_side=False)
                    visited.add(ra)
                    frontier.append(ra)
        for rb in range(nR):
            if G[rb] is None:  # disconnected robot: keep local frame
                G[rb] = np.concatenate(
                    [np.eye(prob.d), np.zeros((prob.d, 1))], axis=-1
                )
        out = []
        for rb in range(nR):
            Gk = jnp.asarray(G[rb], self.dtype)
            Tk = jnp.asarray(local_trajs[rb], self.dtype)
            out.append(
                np.asarray(
                    lie.se_compose(
                        jnp.broadcast_to(Gk, Tk.shape[:1] + Gk.shape), Tk
                    )
                )
            )
        return np.concatenate(out, axis=0)

    def _align_pair(self, Ga, traj_a, traj_b, m, k, src_side: bool):
        """Frame of robot b from one shared edge k between a (known frame Ga)
        and b: global constraint  G_a T_i M_e = G_b T_j."""
        d = self.problem.d
        Me = np.concatenate([m.R[k], m.t[k][:, None]], axis=-1)
        i, j = int(m.src_frame[k]), int(m.dst_frame[k])
        comp = lambda A, B: np.asarray(
            lie.se_compose(jnp.asarray(A, self.dtype), jnp.asarray(B, self.dtype))
        )
        inv = lambda A: np.asarray(lie.se_inverse(jnp.asarray(A, self.dtype)))
        if src_side:  # a = src robot, b = dst robot
            lhs = comp(comp(Ga, traj_a[i]), Me)
            return comp(lhs, inv(traj_b[j]))
        else:  # a = dst robot, b = src robot: G_b T_i M_e = G_a T_j
            lhs = comp(Ga, traj_a[j])
            return comp(lhs, inv(comp(traj_b[i], Me)))

    def initialize(
        self, key: Optional[jax.Array] = None, trajectory: Optional[np.ndarray] = None
    ) -> RBCDState:
        """Build the initial lifted state: local init per robot → frame
        alignment → anchor → lift through a shared sampled YLift
        (reference lifting-matrix broadcast, ``PGOAgentROS.cpp:402-410``)."""
        from dpgo_ros_tpu.utils.hostenv import host_compute

        prob, cfg = self.problem, self.config
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        if trajectory is None:
            # initialization is many tiny distinct-shape programs (per-robot
            # odometry chains / chordal solves / SE(3) composes) — run them
            # on the local CPU backend (see hostenv.host_compute)
            with host_compute():
                locals_ = [
                    self._local_subgraph_traj(k)
                    for k in range(prob.num_robots)
                ]
                if cfg.multirobot_initialization and prob.num_robots > 1:
                    T = self._align_robot_frames(locals_)
                else:
                    T = np.concatenate(locals_, axis=0)
        else:
            T = np.asarray(trajectory)
        T = rounding.anchor_to_first_pose(jnp.asarray(T, self.dtype))
        if prob.r == prob.d:
            self.Ylift = jnp.eye(prob.d, dtype=self.dtype)
        else:
            self.Ylift = stiefel.random_lifting_matrix(
                key, prob.r, prob.d, self.dtype
            )
        X = stiefel.lift_trajectory(T, self.Ylift)
        E = prob.edges.num_edges
        weights = jnp.asarray(self.problem.edges.weight, self.dtype)
        # remembered so the host-composed runner can recognize "the weights
        # initialize() produced" by identity and skip any device→host read
        self._init_weights = weights
        fixed = 1.0 - jnp.asarray(self.problem.edges.is_loop, self.dtype)
        if self.config.robust_cost_type == RobustCostType.L2:
            fixed = jnp.ones_like(fixed)
        e = self._edges(weights)
        return RBCDState(
            X=X,
            X_prev=X,
            V=X,
            theta=jnp.asarray(1.0, self.dtype),
            iteration=jnp.asarray(0, jnp.int32),
            cost=quadratic.cost(X, e),
            rel_change=jnp.full((prob.num_robots,), jnp.inf, self.dtype),
            weights=weights,
            fixed_mask=fixed,
            mu=jnp.asarray(self.config.GNC_init_mu, self.dtype),
            weight_update_count=jnp.asarray(0, jnp.int32),
        )

    # ------------------------------------------------------------------ steps

    def _solver_cache(self, e):
        """Weight-dependent solver constants, hoisted off the hot loop: the
        block-Jacobi inverse and — on the fused-kernel path — its transposed
        layout plus the per-lane effective-weight rows (recomputed once per
        GNC weight round, like the reference's ``clearDataMatrices``
        invalidation, ``src/PGOAgentROS.cpp:1351``)."""
        P = self._precond_inv(e)
        if self._use_fused:
            return (
                fused_rtr.pinv_to_t(P, self._kg.n_pad),
                self._kg.weight_rows(e, e.weight),
            )
        return (P, None)

    def _local_solve(self, X, e, mask, cache):
        if self._use_fused:
            pt, wrows = cache
            kg = self._kg
            prob = self.problem
            Xt = fused_rtr.to_t(X, kg.n_pad)
            if self._use_hbm:
                # contiguous single-block mask → window coordinates
                # (traced scalars; the kernel reads them from SMEM)
                from dpgo_ros_tpu.ops import hbm_rtr

                flat = mask[:, 0, 0] > 0
                start = jnp.argmax(flat).astype(jnp.int32)
                length = jnp.sum(flat).astype(jnp.int32)
                Xt_new, stats = hbm_rtr.rtr_solve_hbm(
                    Xt, start, length, pt, wrows, kg, self.rtr_params,
                    interpret=self._interpret_fused,
                )
                # stats f values are LOCAL cost restrictions (window
                # edges only) — fine for telemetry; rel-change and
                # termination use the X displacement, not f
            else:
                mrow = fused_rtr.mask_to_row(mask, kg.n_pad)
                Xt_new, stats = fused_rtr.rtr_solve_fused(
                    Xt, mrow, pt, wrows, kg, self.rtr_params,
                    interpret=self._interpret_fused,
                    oh=self._kg_oh,
                )
            X_new = jnp.where(
                mask > 0,
                fused_rtr.from_t(Xt_new, prob.n, prob.r, prob.d + 1),
                X,
            )
            res = OptResult(
                success=jnp.asarray(True),
                f_init=stats[0, 0],
                f_opt=stats[0, 1],
                gradnorm_init=stats[0, 2],
                gradnorm_opt=stats[0, 3],
                iterations=stats[0, 4].astype(jnp.int32),
            )
            return X_new, res
        P = cache[0]
        if self.config.solver == SolverMethod.RTR:
            return rtr_solve(X, e, mask, P, self.rtr_params)
        return rgd_solve(X, e, mask, P, self.rgd_params)

    def _block_update(self, st: RBCDState, mask, e, cache):
        """One masked block update, optionally Nesterov-accelerated.

        Accelerated RBCD requires the block subproblem to be solved against
        the *auxiliary* (extrapolated) state V — solving from an extrapolated
        starting point alone is a no-op when the block is minimized (nearly)
        exactly, since the minimizer doesn't depend on the start. This is why
        the reference exchanges a second is_auxiliary pose stream
        (``src/PGOAgentROS.cpp:662-690``). After the solve, the block's
        auxiliary value is extrapolated: V_k = Retr(X_k, β (X_k − X_k^prev)),
        with β from the standard Nesterov θ-sequence, adaptive restart on
        cost increase, and periodic restart (``restart_interval``).

        Returns (X_new, V_new, res, theta_new).
        """
        cfg = self.config
        if not cfg.acceleration:
            X_new, res = self._local_solve(st.X, e, mask, cache)
            return X_new, X_new, res, st.theta

        theta_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * st.theta**2))
        if cfg.acceleration_beta is not None:
            beta = jnp.asarray(cfg.acceleration_beta, st.X.dtype)
        else:
            beta = (st.theta - 1.0) / theta_new
        # solve block against neighbors at their auxiliary values
        Z, res_acc = self._local_solve(st.V, e, mask, cache)
        X_acc = jnp.where(mask > 0, Z, st.X)
        f_acc = quadratic.cost(X_acc, e)

        def accept():
            Vk = stiefel.retract_polar_ns(
                X_acc,
                beta * stiefel.proj_tangent(X_acc, mask * (X_acc - st.X_prev)),
            )
            V_new = jnp.where(mask > 0, Vk, st.V)
            r = res_acc._replace(f_opt=f_acc)
            return X_acc, V_new, r, theta_new

        def restart():
            X_r, res_r = self._local_solve(st.X, e, mask, cache)
            return X_r, X_r, res_r, jnp.asarray(1.0, st.theta.dtype)

        if cfg.acceleration_safeguard:
            ok = f_acc <= st.cost
            X_new, V_new, res, theta = jax.lax.cond(ok, accept, restart)
        else:
            X_new, V_new, res, theta = accept()
        theta = jnp.where(
            (st.iteration + 1) % cfg.restart_interval == 0, 1.0, theta
        )
        return X_new, V_new, res, theta

    def _finish_step(self, st: RBCDState, X_new, V_new, res, theta, mask):
        """Common epilogue: relative change, momentum memory, counters.

        Relative change per robot is the Frobenius norm of its block's
        update (``relative_change_metric="block_frobenius"``, the
        DPGO-calibrated default matching the reference's ~240-iteration
        sphere2500 convergence at tol 0.2) or the max per-pose update norm
        (``"max_pose"``, a looser uniform metric)."""
        per_pose2 = jnp.sum((X_new - st.X) ** 2, axis=(-2, -1))  # (n,)
        sel = mask[:, 0, 0]
        if getattr(self.config, "relative_change_metric", "block_frobenius") == "max_pose":
            moved = (
                jnp.zeros((self.problem.num_robots,), self.dtype)
                .at[self.problem.robot_of_pose]
                .max(sel * jnp.sqrt(per_pose2))
            )
            rc = jnp.max(sel * jnp.sqrt(per_pose2))
        else:
            moved = jnp.sqrt(
                jnp.zeros((self.problem.num_robots,), self.dtype)
                .at[self.problem.robot_of_pose]
                .add(sel * per_pose2)
            )
            rc = jnp.sqrt(jnp.sum(sel * per_pose2))
        updated_robots = (
            jnp.zeros((self.problem.num_robots,), self.dtype)
            .at[self.problem.robot_of_pose]
            .max(sel)
        )
        # neighbor invalidation (round-3 termination fix): a robot's
        # recorded rel-change goes STALE when a neighbor later moves — the
        # reference's last-reported-relative-change termination shares this
        # hazard and can stop at a blockwise-stale non-critical point
        # (observed: tinyGrid 2-robot Uniform run terminating with
        # rel=[0,0] at cost 21.6 while block 1's true gradient norm was
        # 25.4). Movement m_k of robot k bounds the shift of a neighbor's
        # block optimum (continuity), so bump every non-updated neighbor's
        # rel-change to at least max_k adj[k,j]·m_k — termination then
        # requires a full quiescent neighborhood.
        bump = (moved * updated_robots) @ self._adjf
        rel_change = jnp.where(
            updated_robots > 0,
            moved,
            jnp.maximum(st.rel_change, bump),
        )
        X_prev = jnp.where(mask > 0, st.X, st.X_prev)
        return RBCDState(
            X=X_new,
            X_prev=X_prev,
            V=V_new,
            theta=theta,
            iteration=st.iteration + 1,
            cost=res.f_opt,
            rel_change=rel_change,
            weights=st.weights,
            fixed_mask=st.fixed_mask,
            mu=st.mu,
            weight_update_count=st.weight_update_count,
        ), rc

    def _precond_inv(self, e) -> jnp.ndarray:
        """Damped block-Jacobi inverse for the current weights. Depends only
        on the weights — callers on the hot path should compute it once per
        weight change and pass it through (``Pinv`` argument)."""
        return quadratic.precond_inverse(
            quadratic.precond_blocks(e, self.problem.n)
        )

    def _step_sequential_impl(self, st: RBCDState, robot: jnp.ndarray, cache=None):
        """Synchronous RBCD step: the robot named by the UPDATE token
        optimizes its block (reference ``iterate(true)`` vs ``iterate(false)``,
        ``src/PGOAgentROS.cpp:1161-1189``)."""
        e = self._edges(st.weights)
        mask = self._masks[robot]
        cache = cache if cache is not None else self._solver_cache(e)
        X_new, V_new, res, theta = self._block_update(st, mask, e, cache)
        return self._finish_step(st, X_new, V_new, res, theta, mask)

    def _step_parallel_impl(self, st: RBCDState, color: jnp.ndarray, cache=None):
        """Colored-parallel block update: all robots of ``color`` solve
        simultaneously. Their union mask selects a block-diagonal sub-Hessian
        (no shared edges within a color class), so the masked trust-region
        solve decomposes into the independent per-robot solves — on a device
        mesh this is the shard_map step of parallel/spmd.py."""
        e = self._edges(st.weights)
        mask = self._color_masks[color]
        cache = cache if cache is not None else self._solver_cache(e)
        X_new, V_new, res, theta = self._block_update(st, mask, e, cache)
        return self._finish_step(st, X_new, V_new, res, theta, mask)

    def _weight_update_impl(self, st: RBCDState):
        """Robust weight round (reference UPDATE_WEIGHT,
        ``PGOAgentROS.cpp:1211-1233``): residuals on the rounded trajectory;
        GNC-TLS weights under the scheduled mu, or plain IRLS weights for the
        L1/Huber/TLS/GM robust costs (``mRobustCost.weight(residual)``,
        reference ``PGOAgentROS.cpp:1050``)."""
        cfg = self.config
        e = self._edges(st.weights)
        T = rounding.round_solution(st.X)
        r = robust.measurement_residuals(T, e)
        if cfg.robust_cost_type == RobustCostType.GNC_TLS:
            mu_use, barc_use = robust.gnc_round_params(
                st.weight_update_count,
                cfg,
                st.mu,
                residuals=r,
                loop_mask=e.is_loop * e.mask,
                dtype=self.dtype,
            )
            w_new, _ = robust.update_weights_gnc(
                st.weights, st.fixed_mask, r, mu_use, barc_use, cfg.GNC_mu_step
            )
        else:
            w_irls = robust.robust_weight(
                cfg.robust_cost_type.value, r, cfg.GNC_barc
            )
            w_new = jnp.where(st.fixed_mask > 0, st.weights, w_irls)
        mu_new = st.mu * cfg.GNC_mu_step
        fixed = st.fixed_mask
        if cfg.weight_convergence_threshold > 0:
            # reference semantics (``PGOAgentROS.cpp:1049-1056``): an edge
            # whose GNC weight fell below the threshold is REJECTED and
            # frozen (weight=0, fixedWeight=true) — progressive hard
            # rejection. (Freezing near-1 weights too — "binarized" — was
            # tried and misfires: GNC weights START near 1 under small mu,
            # so the whole outlier set gets frozen as accepts in round 1;
            # measured in exp_tunnels_schedule.json 'freeze6'.)
            newly = (fixed == 0) & (
                w_new < cfg.weight_convergence_threshold
            )
            w_new = jnp.where(newly, 0.0, w_new)
            fixed = jnp.where(newly, 1.0, fixed)
        cost = quadratic.cost(st.X, self._edges(w_new))
        return RBCDState(
            X=st.X,
            X_prev=st.X,  # drop momentum across weight rounds
            V=st.X,
            theta=jnp.asarray(1.0, self.dtype),
            iteration=st.iteration,
            cost=cost,
            rel_change=jnp.full_like(st.rel_change, jnp.inf),
            weights=w_new,
            fixed_mask=fixed,
            mu=mu_new,
            weight_update_count=st.weight_update_count + 1,
        )

    # ------------------------------------------------------------------ driver

    def run(
        self,
        state: Optional[RBCDState] = None,
        max_iters: Optional[int] = None,
        callback=None,
    ) -> Tuple[RBCDState, Dict]:
        """Host-side round driver replicating the reference leader protocol
        (SURVEY.md §3.2): scheduled block updates, GNC weight rounds every
        ``robust_opt_inner_iters_per_robot × num_robots`` iterations, and
        relative-change termination once every robot is ready.

        Returns (final_state, info) where info carries per-iteration history
        with the reference telemetry fields (SURVEY.md §5.1).
        """
        cfg = self.config
        prob = self.problem
        if state is None:
            state = self.initialize()
        max_iters = max_iters or cfg.max_iteration_number
        # Uniform rule: same counter-based PRNG as make_fused_run (fold the
        # seed key with the global iteration index) so host-driven and fused
        # runs take identical schedules for all three update rules
        key0 = jax.random.PRNGKey(cfg.seed)
        # weight rounds run for every robust cost: graduated (GNC_TLS) or
        # plain IRLS reweighting (L1/Huber/TLS/GM)
        gnc = cfg.robust_cost_type != RobustCostType.L2
        inner = cfg.robust_opt_inner_iters_per_robot * prob.num_robots
        history: Dict[str, list] = {
            "iteration": [],
            "cost": [],
            "rel_change": [],
            "rel_change_robots": [],  # (R,) per iteration — CSV telemetry
            "iter_time_sec": [],
            "event": [],
        }
        t_start = time.time()
        it = 0
        cache = self._solver_cache(self._edges(state.weights))
        last_wu_gi = int(state.iteration)
        while it < max_iters:
            # GNC outer round? (global iteration counter — matches the fused
            # path and stays on the same cadence across checkpoint resumes)
            gi = int(state.iteration)
            if cfg.robust_opt_inner_tol is not None:
                # convergence-gated rounds: fire once every robot's block
                # has settled below inner_tol (residuals then sit at the
                # weighted optimum — schedule-independent); the fixed
                # cadence stays as a budget cap
                fire = bool(
                    np.all(
                        np.asarray(state.rel_change)
                        < cfg.robust_opt_inner_tol
                    )
                ) or (gi - last_wu_gi) >= inner
            else:
                fire = gi % inner == 0
            if gnc and gi > 0 and fire and (
                state.weight_update_count < cfg.robust_opt_num_weight_updates
            ):
                last_wu_gi = gi
                state = self._weight_upd(state)
                cache = self._solver_cache(self._edges(state.weights))
                history["event"].append((it, "UPDATE_WEIGHT"))
                # optional re-initialization after early weight updates
                # (robustOptNumResets, reference PGOAgentROSNode.cpp:212-221)
                if state.weight_update_count <= cfg.robust_opt_num_resets:
                    w, fm, mu, wuc = (
                        state.weights,
                        state.fixed_mask,
                        state.mu,
                        state.weight_update_count,
                    )
                    st2 = self.initialize()
                    state = st2._replace(
                        weights=w,
                        fixed_mask=fm,
                        mu=mu,
                        weight_update_count=wuc,
                        iteration=state.iteration,
                        cost=quadratic.cost(st2.X, self._edges(w)),
                    )
            t0 = time.time()
            if cfg.update_rule == UpdateRule.PARALLEL:
                c = int(state.iteration) % self.num_colors
                state, rc = self._step_par(state, jnp.asarray(c), cache)
            else:
                if cfg.update_rule == UpdateRule.ROUND_ROBIN:
                    k = int(state.iteration) % prob.num_robots
                else:
                    k = int(
                        jax.random.randint(
                            jax.random.fold_in(key0, int(state.iteration)),
                            (),
                            0,
                            prob.num_robots,
                        )
                    )
                state, rc = self._step_seq(state, jnp.asarray(k), cache)
            state.cost.block_until_ready()
            dt = time.time() - t0
            it += 1
            history["iteration"].append(it)
            history["cost"].append(float(state.cost))
            history["rel_change"].append(float(rc))
            history["rel_change_robots"].append(
                np.asarray(state.rel_change, np.float64)
            )
            history["iter_time_sec"].append(dt)
            if callback is not None:
                callback(it, state)
            # termination: all robots' last relative change below tol
            # (reference readyToTerminate gossip, PGOAgentROS.cpp:192-217),
            # and no pending GNC weight rounds
            ready = bool(
                np.all(
                    np.asarray(state.rel_change)
                    < cfg.relative_change_tolerance
                )
            )
            gnc_done = (not gnc) or (
                int(state.weight_update_count)
                >= cfg.robust_opt_num_weight_updates
            )
            if ready and gnc_done:
                break
        info = {
            "history": history,
            "iterations": it,
            "total_time_sec": time.time() - t_start,
            "final_cost": float(state.cost),
            "converged": bool(
                np.all(
                    np.asarray(state.rel_change) < cfg.relative_change_tolerance
                )
            ),
        }
        if gnc:
            acc, rej, und = robust.classify_weights(
                state.weights, prob.edges.is_loop, prob.edges.mask
            )
            total = int(acc) + int(rej) + int(und)
            ratio = (int(acc) + int(rej)) / max(total, 1)
            info["gnc_stats"] = {
                "accepted": int(acc),
                "rejected": int(rej),
                "undecided": int(und),
                "convergence_ratio": ratio,
            }
            # reference robustOptMinConvergenceRatio gate
            # (``PGOAgentROSNode.cpp:212-221``)
            info["gnc_converged"] = (
                ratio >= cfg.robust_opt_min_convergence_ratio
            )
        return state, info

    def _make_fused_run_t(self, max_iters: int, record: bool = False):
        """Transposed-resident fused runner (round 3): the entire solve loop
        keeps the state in the kernel's (C, n_pad) layout.

        Rationale: the fused kernel's device time on sphere2500 is ~66 µs
        per forced-budget block solve (ROOFLINE.json), but the round-2 fused
        runner paid ~0.55 ms/step in XLA glue around it — to_t/from_t layout
        transposes, a scatter-based per-robot rel-change reduction, and mask
        selects, each a separate fusion on a runtime with a high per-fusion
        floor. Here the while_loop carries Xt directly; the per-robot
        displacement and was-updated flags come from the kernel's own stats
        row (_S_MOVED/_S_UPD — computed in-kernel from static block
        offsets), the masked-lane restore is a single row-broadcast select,
        and the natural-layout state is materialized only at the end and
        inside the (rare) GNC weight-round branch.

        Semantics match make_fused_run exactly for non-accelerated configs
        (pinned by tests/test_fused_rtr.py engine-equivalence); acceleration
        keeps the round-2 path (the auxiliary-sequence retraction is not in
        the kernel yet).
        """
        cfg = self.config
        prob = self.problem
        kg = self._kg
        gnc = cfg.robust_cost_type != RobustCostType.L2
        inner = cfg.robust_opt_inner_iters_per_robot * prob.num_robots
        tol = cfg.relative_change_tolerance
        key0 = jax.random.PRNGKey(cfg.seed)
        R = prob.num_robots

        # static transposed mask rows (robot blocks + color classes)
        mrows = jnp.asarray(
            np.concatenate(
                [
                    fused_rtr.mask_to_row_np(m, kg.n_pad)
                    for m in self._masks_np
                ],
                axis=0,
            )
        )  # (R, n_pad)
        crows = jnp.asarray(
            np.concatenate(
                [
                    fused_rtr.mask_to_row_np(m, kg.n_pad)
                    for m in self._color_masks_np
                ],
                axis=0,
            )
        )  # (num_colors, n_pad)
        consts = kg.constants()
        wins = (
            jnp.asarray(fused_rtr.wins_row(kg))
            if kg.loop_win_off is not None
            else None
        )
        cel, les, dle = kg.weight_rows_arrays()
        e0 = self.problem.edges

        def cache_from_weights(weights):
            e = self._edges(weights)
            pt = fused_rtr.pinv_to_t(self._precond_inv(e), kg.n_pad)
            wrows = fused_rtr.weight_rows_gather(
                e0.kappa, e0.tau, e0.mask, weights, cel, les, dle,
                kg.n_pad,
            )
            return pt, wrows

        def make_do_iter(Xt_init):
          def do_iter(carry):
            (Xt, it, cost, rel, weights, fixed, mu, wuc, last_wu, cache,
             rel_h, ev_h) = carry
            wu_fired = jnp.asarray(False)
            if gnc:
                def wu(args):
                    Xt_in, w_in, fx_in, mu_in, wuc_in, _ = args
                    X = fused_rtr.from_t(Xt_in, prob.n, prob.r, prob.d + 1)
                    s = RBCDState(
                        X=X, X_prev=X, V=X,
                        theta=jnp.asarray(1.0, self.dtype),
                        iteration=it, cost=cost, rel_change=rel,
                        weights=w_in, fixed_mask=fx_in, mu=mu_in,
                        weight_update_count=wuc_in,
                    )
                    s2 = self._weight_update_impl(s)
                    Xt_out = Xt_in
                    cost2 = s2.cost
                    if cfg.robust_opt_num_resets > 0:
                        do_reset = (
                            s2.weight_update_count
                            <= cfg.robust_opt_num_resets
                        )
                        Xt_out = jnp.where(do_reset, Xt_init, Xt_in)
                        cost2 = jnp.where(
                            do_reset,
                            quadratic.cost(
                                fused_rtr.from_t(
                                    Xt_out, prob.n, prob.r, prob.d + 1
                                ),
                                self._edges(s2.weights),
                            ),
                            cost2,
                        )
                    return (
                        Xt_out, s2.weights, s2.fixed_mask, s2.mu,
                        s2.weight_update_count,
                        cache_from_weights(s2.weights),
                    )

                if cfg.robust_opt_inner_tol is not None:
                    # convergence-gated rounds (schedule-independent
                    # residuals); fixed cadence remains as the budget cap
                    fire = jnp.all(
                        rel < cfg.robust_opt_inner_tol
                    ) | ((it - last_wu) >= inner)
                else:
                    fire = jnp.mod(it, inner) == 0
                wu_fired = (
                    (it > 0)
                    & fire
                    & (wuc < cfg.robust_opt_num_weight_updates)
                )
                last_wu = jnp.where(wu_fired, it, last_wu)
                Xt, weights, fixed, mu, wuc, cache = jax.lax.cond(
                    wu_fired,
                    wu,
                    lambda a: a,
                    (Xt, weights, fixed, mu, wuc, cache),
                )
                rel = jnp.where(
                    wu_fired, jnp.full_like(rel, jnp.inf), rel
                )
            pt, wrows = cache
            if cfg.update_rule == UpdateRule.PARALLEL:
                k = jnp.mod(it, self.num_colors)
                mrow = jax.lax.dynamic_index_in_dim(
                    crows, k, keepdims=True
                )
            elif cfg.update_rule == UpdateRule.ROUND_ROBIN:
                k = jnp.mod(it, R)
                mrow = None if self._use_hbm else (
                    jax.lax.dynamic_index_in_dim(mrows, k, keepdims=True)
                )
            else:
                k = jax.random.randint(
                    jax.random.fold_in(key0, it), (), 0, R
                )
                mrow = None if self._use_hbm else (
                    jax.lax.dynamic_index_in_dim(mrows, k, keepdims=True)
                )
            if self._use_hbm and cfg.update_rule != UpdateRule.PARALLEL:
                # HBM windowed kernel (large banded worlds): block
                # coordinates via one-hot selects (gathers poison this
                # runtime's sync path — docs/PERFORMANCE.md round 4)
                from dpgo_ros_tpu.ops import hbm_rtr

                iota_R = jnp.arange(R)
                offs_arr = jnp.asarray(kg.offsets, jnp.int32)
                lens_arr = jnp.asarray(kg.num_poses, jnp.int32)
                sel = (iota_R == k).astype(jnp.int32)
                start = jnp.sum(sel * offs_arr)
                length = jnp.sum(sel * lens_arr)
                Xt2, stats_h = hbm_rtr.rtr_solve_hbm(
                    Xt, start, length, pt, wrows, kg, self.rtr_params,
                    interpret=self._interpret_fused,
                )
                # per-robot moved/upd rows from the single-block stats
                moved = (
                    sel.astype(self.dtype) * stats_h[0, 6].astype(self.dtype)
                )
                upd = sel.astype(jnp.float32)
                stats = stats_h
            else:
                Xt_new, stats = fused_rtr.rtr_solve_fused(
                    Xt, mrow, pt, wrows, kg, self.rtr_params,
                    interpret=self._interpret_fused,
                    consts=consts, wins=wins, oh=self._kg_oh,
                )
                # restore unmasked lanes exactly (NS retraction
                # renormalizes all lanes; drift outside the block must
                # not accumulate)
                Xt2 = Xt + (Xt_new - Xt) * mrow
                moved = jax.lax.dynamic_slice(
                    stats, (0, fused_rtr._S_MOVED), (1, R)
                )[0].astype(self.dtype)
                upd = jax.lax.dynamic_slice(
                    stats, (0, fused_rtr._S_UPD), (1, R)
                )[0]
            # neighbor invalidation — see _finish_step
            bump = (moved * upd.astype(self.dtype)) @ self._adjf
            rel2 = jnp.where(
                upd > 0, moved, jnp.maximum(rel, bump)
            )
            if self._use_hbm and cfg.update_rule != UpdateRule.PARALLEL:
                # HBM stats carry LOCAL window costs — keep the carried
                # global cost (callers recompute the final cost globally)
                cost2 = cost
            else:
                cost2 = stats[0, 1].astype(self.dtype)
            if record:
                rel_h = rel_h.at[it].set(rel2)
                ev_h = ev_h.at[it].set(wu_fired.astype(jnp.int8))
            return (
                Xt2, it + 1, cost2, rel2, weights, fixed, mu, wuc,
                last_wu, cache, rel_h, ev_h,
            )
          return do_iter

        def cond_fn(carry):
            _, it, _, rel, _, _, _, wuc, _, _, _, _ = carry
            ready = jnp.all(rel < tol)
            if gnc:
                ready = ready & (wuc >= cfg.robust_opt_num_weight_updates)
            return (it < max_iters) & ~ready

        @jax.jit
        def run(st: RBCDState):
            Xt0 = fused_rtr.to_t(st.X, kg.n_pad)
            cache = cache_from_weights(st.weights)
            if record:
                rel_h = jnp.full(
                    (max_iters, R), jnp.nan, self.dtype
                )
                ev_h = jnp.zeros((max_iters,), jnp.int8)
            else:
                rel_h = ev_h = jnp.zeros((), jnp.int8)
            carry = (
                Xt0, st.iteration, st.cost, st.rel_change, st.weights,
                st.fixed_mask, st.mu, st.weight_update_count,
                st.iteration, cache, rel_h, ev_h,
            )
            (
                Xt, it, cost, rel, weights, fixed, mu, wuc, _, _,
                rel_h, ev_h,
            ) = jax.lax.while_loop(cond_fn, make_do_iter(Xt0), carry)
            X = fused_rtr.from_t(Xt, prob.n, prob.r, prob.d + 1)
            out = RBCDState(
                X=X, X_prev=X, V=X, theta=st.theta, iteration=it,
                cost=cost, rel_change=rel, weights=weights,
                fixed_mask=fixed, mu=mu, weight_update_count=wuc,
            )
            if record:
                return out, rel_h, ev_h
            return out

        return run

    def _host_cache_np(self, weights_np: np.ndarray):
        """Host-numpy solver cache — (pt, wrows) with the same math as the
        device ``cache_from_weights`` (damped block-Jacobi inverse in the
        transposed layout + per-lane effective-weight rows).

        Used for fixed-weight runs so the TIMED program contains no
        gather/scatter at all: on this tunneled runtime, executing any
        XLA gather op permanently degrades every later device sync in the
        process from ~0.1 ms to ~26 ms (measured round 4,
        docs/PERFORMANCE.md). Math mirrors quadratic.precond_blocks /
        precond_inverse and fused_rtr.weight_rows_gather.
        """
        kg = self._kg
        prob = self.problem
        he = prob.host_edges
        d = prob.d
        n = prob.n
        w = np.asarray(weights_np, np.float32) * np.asarray(
            he.mask, np.float32
        )
        kw = w * np.asarray(he.kappa, np.float32)
        tw = w * np.asarray(he.tau, np.float32)
        t = np.asarray(he.t, np.float32)
        src = np.asarray(he.src)
        dst = np.asarray(he.dst)
        I = np.eye(d, dtype=np.float32)
        ttT = t[:, :, None] * t[:, None, :]
        E = src.shape[0]
        Dii = np.zeros((E, d + 1, d + 1), np.float32)
        Dii[:, :d, :d] = kw[:, None, None] * I + tw[:, None, None] * ttT
        Dii[:, :d, d] = tw[:, None] * t
        Dii[:, d, :d] = tw[:, None] * t
        Dii[:, d, d] = tw
        Djj = np.zeros((E, d + 1, d + 1), np.float32)
        Djj[:, :d, :d] = kw[:, None, None] * I
        Djj[:, d, d] = tw
        D = np.zeros((n, d + 1, d + 1), np.float32)
        np.add.at(D, src, Dii)
        np.add.at(D, dst, Djj)
        scale = np.maximum(
            np.trace(D, axis1=-2, axis2=-1)[:, None, None] / (d + 1), 1.0
        )
        D = D + 0.01 * scale * np.eye(d + 1, dtype=np.float32)
        P = np.linalg.inv(D).astype(np.float32)
        Pt = np.transpose(P, (1, 2, 0)).reshape((d + 1) * (d + 1), n)
        pt = np.zeros(((d + 1) * (d + 1), kg.n_pad), np.float32)
        pt[:, :n] = Pt
        kwp = np.append(kw, 0.0).astype(np.float32)
        twp = np.append(tw, 0.0).astype(np.float32)
        kwc = kwp[kg.chain_edge_of_lane][None, :]
        twc = twp[kg.chain_edge_of_lane][None, :]
        kwl = kwp[kg.loop_edge_of_slot][None, :]
        twl = twp[kg.loop_edge_of_slot][None, :]
        kwd = kwp[kg.diag_edge_of_lane].reshape(-1, kg.n_pad)
        twd = twp[kg.diag_edge_of_lane].reshape(-1, kg.n_pad)
        return jnp.asarray(pt), tuple(
            jnp.asarray(x) for x in (kwc, twc, kwl, twl, kwd, twd)
        )

    def _make_fused_run_multi(
        self, max_iters: int, record: bool = False,
        return_stats: bool = False,
    ):
        """Multi-step-kernel runner (round 4): the ENTIRE stretch of solver
        steps between GNC weight rounds — or the whole run for non-robust
        costs — executes inside ONE Pallas kernel launch
        (ops/fused_rtr.rtr_run_fused).

        Rationale: the round-3 transposed runner still paid ~480 µs per
        step against ~60 µs of kernel device time — the per-launch
        intercept (67.5 µs) plus the XLA glue fusions around each launch
        (mask select, stats slices, rel-change update) dominated
        (ROOFLINE.json sphere2500; round-3 verdict item 1). Moving the step
        loop in-kernel pays those once per GNC stretch. The outer
        `lax.while_loop` survives only to run weight rounds (they need the
        rounded-trajectory residuals — XLA ops on the natural layout) and
        re-launch; an L2 solve is exactly one kernel execution.

        The update schedule (Uniform/RoundRobin/Parallel, reference
        ``publishUpdateCommand`` ``src/PGOAgentROS.cpp:443-504``) is
        precomputed per absolute iteration and rides in SMEM; Uniform draws
        from the same counter-based fold_in PRNG as the host driver, so all
        runner paths take identical schedules.
        """
        cfg = self.config
        prob = self.problem
        kg = self._kg
        gnc = cfg.robust_cost_type != RobustCostType.L2
        inner = cfg.robust_opt_inner_iters_per_robot * prob.num_robots
        tol = cfg.relative_change_tolerance
        R = prob.num_robots
        RELW = fused_rtr._REL_W

        # schedule per absolute iteration + the mask-row bank it indexes
        # (all host-side numpy: prep must stay d2h-free, see edges_np)
        if cfg.update_rule == UpdateRule.PARALLEL:
            sched_np = np.arange(max_iters, dtype=np.int64) % self.num_colors
            bank = self._color_masks_np
        elif cfg.update_rule == UpdateRule.ROUND_ROBIN:
            sched_np = np.arange(max_iters, dtype=np.int64) % R
            bank = self._masks_np
        else:  # Uniform: same counter-based PRNG as the host driver
            from dpgo_ros_tpu.utils.hostenv import host_compute

            with host_compute():
                key0 = jax.random.PRNGKey(cfg.seed)
                sched_np = np.asarray(
                    jax.vmap(
                        lambda i: jax.random.randint(
                            jax.random.fold_in(key0, i), (), 0, R
                        )
                    )(jnp.arange(max_iters))
                )
            bank = self._masks_np
        sched = jnp.asarray(sched_np.astype(np.int32)[None, :])
        m_pad = fused_rtr._rup(bank.shape[0], 8)
        mrows_np = np.zeros((m_pad, kg.n_pad), np.float32)
        for i in range(bank.shape[0]):
            mrows_np[i] = fused_rtr.mask_to_row_np(bank[i], kg.n_pad)[0]
        mrows_pad = jnp.asarray(mrows_np)
        adj_np = np.zeros((RELW, RELW), np.float32)
        adj_np[:R, :R] = self._adj_np.astype(np.float32)
        adj_pad = jnp.asarray(adj_np)

        consts = kg.constants()
        wins = (
            jnp.asarray(fused_rtr.wins_row(kg))
            if kg.loop_win_off is not None
            else None
        )
        cel, les, dle = kg.weight_rows_arrays()
        e0 = self.problem.edges

        def cache_from_weights(weights):
            e = self._edges(weights)
            pt = fused_rtr.pinv_to_t(self._precond_inv(e), kg.n_pad)
            wrows = fused_rtr.weight_rows_gather(
                e0.kappa, e0.tau, e0.mask, weights, cel, les, dle,
                kg.n_pad,
            )
            return pt, wrows

        iota_l = jnp.arange(RELW)[None, :]

        def launch(Xt, it, cost, rel_row, cache, last_wu, pending):
            pt, wrows = cache
            scal = jnp.concatenate(
                [
                    it[None], last_wu[None],
                    pending.astype(jnp.int32)[None],
                    jnp.zeros((5,), jnp.int32),
                ]
            )[None, :]
            out = fused_rtr.rtr_run_fused(
                Xt, mrows_pad, pt, wrows, kg, self.rtr_params,
                adj_pad=adj_pad,
                rel0=rel_row,
                sched=sched,
                scal=scal,
                cost0=cost.astype(jnp.float32)[None, None],
                it_cap=max_iters,
                tol=float(tol),
                gnc=gnc,
                inner=inner,
                inner_tol=cfg.robust_opt_inner_tol,
                record=record,
                interpret=self._interpret_fused,
                consts=consts, wins=wins, oh=self._kg_oh,
            )
            if record:
                Xt2, rel2, stats, relh = out
            else:
                (Xt2, rel2, stats), relh = out, None
            it2 = stats[0, 1].astype(jnp.int32)
            cost2 = stats[0, 0].astype(self.dtype)
            tcg2 = stats[0, 3].astype(jnp.int32)
            return Xt2, it2, cost2, rel2, relh, tcg2

        def do_round(carry):
            (Xt, it, cost, rel_row, weights, fixed, mu, wuc, last_wu,
             cache, rel_h, ev_h, Xt_init, tcg_tot) = carry
            wu_fired = jnp.asarray(False)
            if gnc:
                def wu(args):
                    Xt_in, w_in, fx_in, mu_in, wuc_in, _ = args
                    X = fused_rtr.from_t(Xt_in, prob.n, prob.r, prob.d + 1)
                    rel_vec = rel_row[0, :R].astype(self.dtype)
                    s = RBCDState(
                        X=X, X_prev=X, V=X,
                        theta=jnp.asarray(1.0, self.dtype),
                        iteration=it, cost=cost, rel_change=rel_vec,
                        weights=w_in, fixed_mask=fx_in, mu=mu_in,
                        weight_update_count=wuc_in,
                    )
                    s2 = self._weight_update_impl(s)
                    Xt_out = Xt_in
                    cost2 = s2.cost
                    if cfg.robust_opt_num_resets > 0:
                        do_reset = (
                            s2.weight_update_count
                            <= cfg.robust_opt_num_resets
                        )
                        Xt_out = jnp.where(do_reset, Xt_init, Xt_in)
                        cost2 = jnp.where(
                            do_reset,
                            quadratic.cost(
                                fused_rtr.from_t(
                                    Xt_out, prob.n, prob.r, prob.d + 1
                                ),
                                self._edges(s2.weights),
                            ),
                            cost2,
                        )
                    return (
                        Xt_out, s2.weights, s2.fixed_mask, s2.mu,
                        s2.weight_update_count,
                        cache_from_weights(s2.weights),
                    ), cost2

                # padding lanes must NOT block the all() — pad with -inf so
                # only the R real lanes gate the tolerance clause (matches
                # cond_fn's -1.0 padding and the kernel's relmask handling)
                rel_vecm = jnp.where(iota_l < R, rel_row, -jnp.inf)
                if cfg.robust_opt_inner_tol is not None:
                    fire = jnp.all(
                        rel_vecm < cfg.robust_opt_inner_tol
                    ) | ((it - last_wu) >= inner)
                else:
                    fire = jnp.mod(it, inner) == 0
                wu_fired = (
                    (it > 0)
                    & fire
                    & (wuc < cfg.robust_opt_num_weight_updates)
                )
                last_wu = jnp.where(wu_fired, it, last_wu)

                def wu_wrap(args):
                    new, c2 = wu(args)
                    return new + (c2,)

                (Xt, weights, fixed, mu, wuc, cache, cost) = jax.lax.cond(
                    wu_fired,
                    wu_wrap,
                    lambda a: a + (cost,),
                    (Xt, weights, fixed, mu, wuc, cache),
                )
                rel_row = jnp.where(
                    wu_fired, jnp.full_like(rel_row, jnp.inf), rel_row
                )
            pending = (
                wuc < cfg.robust_opt_num_weight_updates
                if gnc
                else jnp.asarray(False)
            )
            it_wu = it  # weight rounds don't advance the iteration counter
            Xt, it, cost, rel_row, relh, tcg2 = launch(
                Xt, it, cost, rel_row, cache,
                last_wu, jnp.asarray(pending),
            )
            tcg_tot = tcg_tot + tcg2
            if record:
                # merge this launch's history rows (untouched rows = NaN)
                rel_h = jnp.where(jnp.isnan(relh), rel_h, relh)
                if gnc:
                    ev_h = jnp.where(
                        (jnp.arange(max_iters) == it_wu) & wu_fired,
                        jnp.int8(1),
                        ev_h,
                    )
            return (
                Xt, it, cost, rel_row, weights, fixed, mu, wuc, last_wu,
                cache, rel_h, ev_h, Xt_init, tcg_tot,
            )

        def cond_fn(carry):
            _, it, _, rel_row, _, _, _, wuc, *_ = carry
            rel_vecm = jnp.where(iota_l < R, rel_row, -1.0)
            ready = jnp.all(rel_vecm < tol)
            if gnc:
                ready = ready & (wuc >= cfg.robust_opt_num_weight_updates)
            return (it < max_iters) & ~ready

        import os as _os

        _env = _os.environ.get("DPGO_FUSED_HOSTRUN")
        if _env is not None:
            use_host_run = _env not in ("0", "false", "False")
        else:
            use_host_run = not self._interpret_fused
        if not gnc and use_host_run:
            # Fixed-weight (non-robust) runs take a HOST-COMPOSED fast
            # path: a small jit prep program, ONE standalone Pallas-kernel
            # call for the entire solve, and a small jit post program.
            # Default on the real-TPU backend only: the host-numpy
            # preconditioner inverse differs from the device cholesky
            # inverse at conditioning-amplified ULP level (~1e-4), which
            # perturbs tCG trajectories — CPU test runs keep the device
            # cache so the fused-vs-XLA equivalence pins stay bit-exact.
            # Override with DPGO_FUSED_HOSTRUN=0/1.
            #
            # Two measured properties of this tunneled runtime force the
            # structure (round 4, docs/PERFORMANCE.md):
            #  * a Mosaic custom call executed INSIDE a larger jitted XLA
            #    program costs a fixed ~50 ms per execution; the SAME
            #    kernel called standalone is ~1 ms — so the kernel must be
            #    dispatched as its own executable, not nested in an outer
            #    jit/while_loop;
            #  * executing any XLA gather op permanently degrades every
            #    later device sync from ~0.1 ms to ~26 ms — so the solver
            #    cache (preconditioner + weight rows) is precomputed on
            #    the host in numpy (_host_cache_np; the L2 engine never
            #    mutates weights, so the problem weights ARE the run
            #    weights) and the prep/post programs are gather-free.
            default_w = np.asarray(self.problem.host_edges.weight)
            default_cache = self._host_cache_np(default_w)
            cache_memo = {}

            def host_cache_for(w_arr):
                # ADVICE r4: a resumed-checkpoint state may carry weights
                # that differ from the problem's — the solver cache must be
                # built from the STATE's weights, not the problem's.
                # Identity-memoized: the normal path (weights IS the array
                # initialize() produced) stays device-to-host-transfer-free;
                # an unrecognized weights array pays one host read on its
                # first run() call, then hits the memo.
                if w_arr is getattr(self, "_init_weights", None):
                    return default_cache
                hit = cache_memo.get(id(w_arr))
                if hit is not None and hit[0] is w_arr:
                    return hit[1]
                w_np = np.asarray(w_arr, np.float32)
                cache = (
                    default_cache
                    if np.array_equal(w_np, default_w)
                    else self._host_cache_np(w_np)
                )
                cache_memo[id(w_arr)] = (w_arr, cache)
                return cache

            ev_zero = np.zeros((max_iters,), np.int8)

            @jax.jit
            def prep(st: RBCDState):
                Xt0 = fused_rtr.to_t(st.X, kg.n_pad)
                rel_row0 = jnp.concatenate(
                    [
                        st.rel_change.astype(jnp.float32),
                        jnp.full((RELW - R,), -1.0, jnp.float32),
                    ]
                )[None, :]
                scal = jnp.concatenate(
                    [
                        st.iteration[None], st.iteration[None],
                        jnp.zeros((6,), jnp.int32),
                    ]
                )[None, :]
                return (
                    Xt0, rel_row0, scal,
                    st.cost.astype(jnp.float32)[None, None],
                )

            @jax.jit
            def post(Xt, rel_row, stats):
                X = fused_rtr.from_t(Xt, prob.n, prob.r, prob.d + 1)
                return (
                    X,
                    stats[0, 0].astype(self.dtype),
                    stats[0, 1].astype(jnp.int32),
                    rel_row[0, :R].astype(self.dtype),
                    stats[0, 3].astype(jnp.int32),  # total tCG iters
                )

            def run(st: RBCDState):
                pt_h, wrows_h = host_cache_for(st.weights)
                Xt0, rel_row0, scal, cost0 = prep(st)
                out = fused_rtr.rtr_run_fused(
                    Xt0, mrows_pad, pt_h, wrows_h, kg, self.rtr_params,
                    adj_pad=adj_pad, rel0=rel_row0, sched=sched,
                    scal=scal, cost0=cost0, it_cap=max_iters,
                    tol=float(tol), gnc=False, inner=inner,
                    inner_tol=cfg.robust_opt_inner_tol, record=record,
                    interpret=self._interpret_fused,
                    consts=consts, wins=wins, oh=self._kg_oh,
                )
                if record:
                    Xt2, rel2, stats, relh = out
                else:
                    Xt2, rel2, stats = out
                X, cost, it, rel_vec, tcg = post(Xt2, rel2, stats)
                state = RBCDState(
                    X=X, X_prev=X, V=X, theta=st.theta, iteration=it,
                    cost=cost, rel_change=rel_vec, weights=st.weights,
                    fixed_mask=st.fixed_mask, mu=st.mu,
                    weight_update_count=st.weight_update_count,
                )
                extras = []
                if record:
                    extras += [
                        relh[:max_iters, :R].astype(self.dtype),
                        ev_zero,
                    ]
                if return_stats:
                    extras.append(tcg)
                if extras:
                    return (state, *extras)
                return state

            return run

        @jax.jit
        def run(st: RBCDState):
            Xt0 = fused_rtr.to_t(st.X, kg.n_pad)
            cache = cache_from_weights(st.weights)
            rel_row0 = jnp.concatenate(
                [
                    st.rel_change.astype(jnp.float32),
                    jnp.full((RELW - R,), -1.0, jnp.float32),
                ]
            )[None, :]
            if record:
                rel_h = jnp.full(
                    (fused_rtr._rup(max_iters, 8), RELW), jnp.nan,
                    jnp.float32,
                )
                ev_h = jnp.zeros((max_iters,), jnp.int8)
            else:
                rel_h = ev_h = jnp.zeros((), jnp.int8)
            carry = (
                Xt0, st.iteration, st.cost, rel_row0, st.weights,
                st.fixed_mask, st.mu, st.weight_update_count,
                st.iteration, cache, rel_h, ev_h, Xt0,
                jnp.asarray(0, jnp.int32),
            )
            (
                Xt, it, cost, rel_row, weights, fixed, mu, wuc, _, _,
                rel_h, ev_h, _, tcg_tot,
            ) = jax.lax.while_loop(cond_fn, do_round, carry)
            X = fused_rtr.from_t(Xt, prob.n, prob.r, prob.d + 1)
            out = RBCDState(
                X=X, X_prev=X, V=X, theta=st.theta, iteration=it,
                cost=cost.astype(self.dtype),
                rel_change=rel_row[0, :R].astype(self.dtype),
                weights=weights,
                fixed_mask=fixed, mu=mu, weight_update_count=wuc,
            )
            extras = []
            if record:
                extras += [
                    rel_h[:max_iters, :R].astype(self.dtype),
                    ev_h,
                ]
            if return_stats:
                extras.append(tcg_tot)
            if extras:
                return (out, *extras)
            return out

        return run

    def make_fused_run(
        self, max_iters: int, record: bool = False,
        return_stats: bool = False,
    ):
        """Return a jitted runner executing the FULL solve as one XLA program
        (`lax.while_loop` over block updates with on-device termination and
        GNC weight rounds under `lax.cond`) — the TPU-native hot path: zero
        host round-trips, one dispatch for the entire optimization.

        ``robust_opt_num_resets`` re-initialization runs on-device: after
        each of the first ``num_resets`` weight updates the iterate resets to
        the run's starting state (the reference's setXToInitialGuess
        semantics — DPGO resets the trajectory to the initial guess after
        early weight updates; wrapper param ``PGOAgentROSNode.cpp:213``).
        Uniform update rule uses the on-device PRNG.

        With ``record=True`` the runner returns
        ``(state, rel_hist, event_hist)`` — per-iteration (max_iters, R)
        relative changes and (max_iters,) UPDATE_WEIGHT flags collected
        on-device (the reference's per-iteration CSV telemetry fields,
        ``src/PGOAgentROS.cpp:853-907``; rows past the final iteration are
        NaN/0).

        With ``return_stats=True`` (multi-step fused paths only) the runner
        additionally returns the in-kernel total-tCG-iteration counter — the
        work-normalized throughput denominator (Hessian applications, the
        roofline slope's work unit). Appended after the record outputs.
        """
        if self._use_fused and not self.config.acceleration:
            import os

            # very large worlds keep the per-step kernel: the multi-step
            # program at n_pad 25k+ exceeds what this runtime's remote
            # compile service can build (HTTP 500, measured round 4 —
            # the single-solve kernel still compiles at 25k), and at
            # ms-scale solves the per-launch overhead it amortizes is
            # negligible anyway
            multistep_ok = self._kg.n_pad <= 16384
            if os.environ.get("DPGO_FUSED_MULTISTEP", "1") not in (
                "0", "false", "False",
            ) and multistep_ok:
                # round-4 fast path: the step loop lives IN the kernel —
                # one launch per GNC stretch (see _make_fused_run_multi)
                return self._make_fused_run_multi(
                    max_iters, record, return_stats
                )
            # round-3 path: one kernel launch per step, state kept in the
            # kernel's transposed layout (see _make_fused_run_t)
            if return_stats:
                raise ValueError(
                    "return_stats requires the multi-step fused runner"
                )
            return self._make_fused_run_t(max_iters, record)
        if return_stats:
            raise ValueError(
                "return_stats requires the multi-step fused runner"
            )
        cfg = self.config
        prob = self.problem
        gnc = cfg.robust_cost_type != RobustCostType.L2  # any robust cost
        inner = cfg.robust_opt_inner_iters_per_robot * prob.num_robots
        tol = cfg.relative_change_tolerance
        key0 = jax.random.PRNGKey(cfg.seed)

        def make_do_iter(X_init):
          def do_iter(carry):
            st, cache, last_wu, rel_h, ev_h = carry
            i = st.iteration
            wu_fired = jnp.asarray(False)
            if gnc:
                def wu(args):
                    s, _ = args
                    s2 = self._weight_update_impl(s)
                    if cfg.robust_opt_num_resets > 0:
                        # reset-to-initial-guess after early weight updates
                        do_reset = (
                            s2.weight_update_count
                            <= cfg.robust_opt_num_resets
                        )
                        Xr = jnp.where(do_reset, X_init, s2.X)
                        s2 = s2._replace(
                            X=Xr,
                            X_prev=Xr,
                            V=Xr,
                            cost=quadratic.cost(
                                Xr, self._edges(s2.weights)
                            ),
                        )
                    # weights changed → refresh the cached solver constants
                    return s2, self._solver_cache(self._edges(s2.weights))

                if cfg.robust_opt_inner_tol is not None:
                    fire = jnp.all(
                        st.rel_change < cfg.robust_opt_inner_tol
                    ) | ((i - last_wu) >= inner)
                else:
                    fire = jnp.mod(i, inner) == 0
                wu_fired = (
                    (i > 0)
                    & fire
                    & (st.weight_update_count < cfg.robust_opt_num_weight_updates)
                )
                last_wu = jnp.where(wu_fired, i, last_wu)
                st, cache = jax.lax.cond(
                    wu_fired,
                    wu,
                    lambda a: a,
                    (st, cache),
                )
            if cfg.update_rule == UpdateRule.PARALLEL:
                st2, _ = self._step_parallel_impl(
                    st, jnp.mod(i, self.num_colors), cache
                )
            elif cfg.update_rule == UpdateRule.ROUND_ROBIN:
                st2, _ = self._step_sequential_impl(
                    st, jnp.mod(i, prob.num_robots), cache
                )
            else:
                k = jax.random.randint(
                    jax.random.fold_in(key0, i), (), 0, prob.num_robots
                )
                st2, _ = self._step_sequential_impl(st, k, cache)
            if record:
                rel_h = rel_h.at[i].set(st2.rel_change)
                ev_h = ev_h.at[i].set(wu_fired.astype(jnp.int8))
            return st2, cache, last_wu, rel_h, ev_h
          return do_iter

        def cond_fn(carry):
            st, *_ = carry
            ready = jnp.all(st.rel_change < tol)
            if gnc:
                ready = ready & (
                    st.weight_update_count >= cfg.robust_opt_num_weight_updates
                )
            return (st.iteration < max_iters) & ~ready

        @jax.jit
        def run(st: RBCDState):
            cache = self._solver_cache(self._edges(st.weights))
            if record:
                rel_h = jnp.full(
                    (max_iters, prob.num_robots), jnp.nan, self.dtype
                )
                ev_h = jnp.zeros((max_iters,), jnp.int8)
            else:
                rel_h = ev_h = jnp.zeros((), jnp.int8)
            out, _, _, rel_h, ev_h = jax.lax.while_loop(
                cond_fn,
                make_do_iter(st.X),
                (st, cache, st.iteration, rel_h, ev_h),
            )
            if record:
                return out, rel_h, ev_h
            return out

        return run

    def finalize(self, state: RBCDState) -> Tuple[np.ndarray, RBCDState]:
        """TERMINATE semantics (reference ``PGOAgentROS.cpp:1036-1082``):
        resolve undecided GNC weights (by final residual when
        ``gnc_finalize_by_residual``, else reject), round to SE(d), anchor
        the first pose."""
        if self.config.robust_cost_type == RobustCostType.GNC_TLS:
            und = (
                (self.problem.edges.is_loop > 0)
                & (state.weights > 1e-6)
                & (state.weights < 1.0 - 1e-6)
            )
            if self.config.gnc_finalize_by_residual:
                T = rounding.round_solution(state.X)
                r = robust.measurement_residuals(
                    T, self._edges(state.weights)
                )
                w = jnp.where(
                    und,
                    (r <= self.config.GNC_barc).astype(state.weights.dtype),
                    state.weights,
                )
            else:
                w = jnp.where(und, 0.0, state.weights)
            state = state._replace(weights=w)
        T = rounding.round_solution(state.X)
        T = rounding.anchor_to_first_pose(T)
        return np.asarray(T), state
