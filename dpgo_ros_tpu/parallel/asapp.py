"""Asynchronous (ASAPP) mode: bounded-staleness parallel local stepping.

Capability parity with the reference's asynchronous mode
(``runOnceAsynchronous``, ``src/PGOAgentROS.cpp:119-127``; RGD solver pick at
``src/PGOAgentROSNode.cpp:87-93``; demo config ``launch/asapp_demo.launch``:
RGD stepsize 0.2, preconditioner, 100 Hz local loop): every robot runs its
own preconditioned Riemannian-gradient loop continuously, reading neighbor
separator poses that may be several iterations stale (ASAPP, Tian et al.
RA-L 2020 — convergence holds under bounded delay with small stepsizes).

TPU-native design: real wall-clock asynchrony doesn't exist in lockstep SPMD,
so asynchrony is modeled as *deterministic bounded staleness* — a ring buffer
of the last K+1 global states; at tick t robot k sees its own block at t and
every neighbor at t − δ_k(t), δ_k(t) ~ U{0..K} from a seeded PRNG (δ ≡ 0
reproduces the synchronous parallel limit; ``max_delayed_iterations`` is the
reference's staleness gate, ``PGOAgentROS.h:62-63``). Every tick updates ALL
robots simultaneously — one jitted ``lax.scan``, reproducible, and exactly
the claim the ASAPP paper makes (parallel updates under delay).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.models.local_solvers import RGDParams, rgd_step
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic, stiefel
from dpgo_ros_tpu.utils.config import AgentConfig


class ASAPPState(NamedTuple):
    X: jnp.ndarray  # (n, r, d+1) current global state
    hist: jnp.ndarray  # (K+1, n, r, d+1) ring buffer of past states
    tick: jnp.ndarray  # i32
    key: jnp.ndarray


class ASAPPEngine:
    """Bounded-staleness asynchronous PGO over one device (vmap over robots);
    the SPMD analogue delays the all_gathered separator snapshots instead."""

    def __init__(self, problem: LiftedProblem, config: AgentConfig):
        self.problem = problem
        self.config = config.resolve()
        self.dtype = (
            jnp.float64 if self.config.dtype == "float64" else jnp.float32
        )
        self.K = int(self.config.max_delayed_iterations)
        self.rgd = RGDParams(
            stepsize=self.config.RGD_stepsize,
            use_preconditioner=self.config.RGD_use_preconditioner,
        )
        masks = [
            problem.block_mask(k, self.dtype)
            for k in range(problem.num_robots)
        ]
        self._masks = jnp.stack(masks, axis=0)  # (R, n, 1, 1)
        self._tick = jax.jit(self._tick_impl)

    def init_state(self, X0: jnp.ndarray, key=None) -> ASAPPState:
        key = key if key is not None else jax.random.PRNGKey(self.config.seed)
        hist = jnp.broadcast_to(X0, (self.K + 1,) + X0.shape)
        return ASAPPState(
            X=X0, hist=hist, tick=jnp.asarray(0, jnp.int32), key=key
        )

    def _tick_impl(self, st: ASAPPState) -> ASAPPState:
        prob = self.problem
        R = prob.num_robots
        key, sub = jax.random.split(st.key)
        delays = jax.random.randint(sub, (R,), 0, self.K + 1)
        e = prob.edges
        P = quadratic.precond_inverse(quadratic.precond_blocks(e, prob.n))

        def one_robot(mask, delay):
            # robot's view: own block fresh, neighbors delayed
            stale = st.hist[delay % (self.K + 1)]
            Z = jnp.where(mask > 0, st.X, stale)
            Z2 = rgd_step(Z, e, mask, P, self.rgd)
            return Z2

        Z_all = jax.vmap(one_robot)(self._masks, delays)
        X_new = jnp.sum(Z_all * self._masks, axis=0) + st.X * (
            1.0 - jnp.sum(self._masks, axis=0)
        )
        # ring buffer: slot (tick mod K+1) ← current state
        hist = st.hist.at[st.tick % (self.K + 1)].set(st.X)
        return ASAPPState(X=X_new, hist=hist, tick=st.tick + 1, key=key)

    def run(
        self, X0: jnp.ndarray, num_ticks: int, chunk: int = 50
    ) -> Tuple[ASAPPState, dict]:
        """Run ``num_ticks`` asynchronous ticks (chunked jitted scans)."""
        st = self.init_state(X0)
        e = self.problem.edges
        costs = [float(quadratic.cost(st.X, e))]

        @jax.jit
        def run_chunk(s):
            def body(s, _):
                return self._tick_impl(s), ()

            s2, _ = jax.lax.scan(body, s, None, length=chunk)
            return s2

        done = 0
        while done < num_ticks:
            st = run_chunk(st)
            done += chunk
            costs.append(float(quadratic.cost(st.X, e)))
        return st, {"costs": costs, "ticks": done}
