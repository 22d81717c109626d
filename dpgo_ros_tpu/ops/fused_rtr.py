"""Single-Pallas-kernel Riemannian trust-region block solve (the TPU hot path).

Round-1 profiling (docs/PERFORMANCE.md) showed the per-block-update cost on
this runtime is dominated by the ~165 µs per-XLA-fusion dispatch floor: a
block update lowered to ~30 fusion executions ≈ 10 ms with the chip idle
almost all the time. This module collapses the ENTIRE ``rtr_solve`` — cost,
gradient, truncated-CG loop, trust-region acceptance, Newton–Schulz
retraction — into ONE Mosaic kernel with all state VMEM-resident
(sphere2500: X 200 KB, edges <1 MB, CG state ~1 MB — far under the ~16 MB
VMEM), so a block update pays the dispatch floor once instead of ~30×.

TPU-native design decisions:

* **Transposed SoA layout**: state rides as ``(C, n_pad)`` with
  C = r·(d+1) feature rows and poses on the 128-lane axis (component-major
  rows: row ``b·r + a`` holds X[i, a, b]). Every small per-pose algebra —
  edge residuals, tangent projection, block-Jacobi preconditioner,
  Newton–Schulz polar retraction — becomes a handful of full-lane VPU row
  ops instead of thousands of serialized (5×4)·(4×4) matmuls.
* **Chain edges are lane shifts**: any edge with ``dst == src + 1`` in the
  global flattened pose index (all odometry after contiguous partitioning,
  reference ``PGODatasetPublisherNode.cpp:84-135``, plus the consecutive
  shared loop closures at robot boundaries) occupies the dense "chain lane"
  src: endpoint gathers are a one-lane shift and scatter-adds are the
  shifted add — zero gather cost for ~half the edges of a typical pose graph.
* **Diagonal loop-closure classes are lane shifts too** (round 3): pose
  graphs from regular trajectories are *banded* — loop closures cluster on
  a few diagonals of the adjacency matrix (sphere2500: ALL 2,450 loop
  closures have ``dst − src == 50``; torus3D: two offsets cover 100%;
  cubicle: 4 offsets cover ~47%). Every offset Δ claiming ≥ DIAG_MIN edges
  becomes a dense diagonal class: gather = static Δ-lane shift, scatter =
  the −Δ shift, per-class cost one full-lane VPU edge pass — zero MXU
  work. On sphere2500 this empties the one-hot loop-slot set completely;
  only irregular (off-diagonal) edges pay the one-hot matmul. MXU one-hot
  time is ∝ K·N area (independent of the ≤128 LHS rows), so removing slots
  is worth strictly more than widening matmuls — measured in
  docs/PERFORMANCE.md.
* **Loop-closure gathers are one-hot MXU matmuls**: Mosaic (still) cannot
  lower vectorized gathers (``ref[idx_vec]`` → "Cannot do int indexing on
  TPU"), so arbitrary-index gathers/scatter-adds run as
  ``one_hot(idx) @ table`` contractions on the MXU. The one-hot is exact in
  bf16; the fp32 table is split hi/lo into two stacked bf16 operands
  (fp32 = bf16_hi + bf16_lo to ~2⁻¹⁶ relative), so a single fp32-accumulating
  bf16 matmul pair reproduces the fp32 gather to ~1e-6 relative — measured
  6.3e-6 max error on sphere2500 against the XLA fp32 operator.
* **The one-hot tables are PRECOMPUTED, not rebuilt per use** (round 3).
  Edge endpoints never change during a solve, so the stacked
  ``(n_pad, 2·E_loop_pad)`` bf16 table ([src one-hots | dst one-hots]) is
  built once per problem and rides into the kernel as a VMEM-resident input
  (v5e has 128 MB VMEM; a ~112 MB kernel footprint compiles and runs — see
  docs/PERFORMANCE.md roofline). Each Q-application is then exactly TWO
  full-width MXU matmuls — one gather ``X_hilo @ OH`` and one NT scatter
  ``[Ci|Cj]_hilo @ OHᵀ`` — instead of rebuilding ~13M iota-compare one-hot
  elements on the VPU per application (the round-2 bottleneck). Problems
  whose table exceeds the VMEM budget fall back to the round-2 chunked
  on-the-fly construction (``oh=None``).

Capability citations: solver budget semantics per reference
``launch/dpgo_demo.launch:33-35`` (RTR_iterations / RTR_tCG_iterations /
gradnorm_tol); the solve itself replaces ROPTLIB's RTR inside DPGO's
``iterate(true)`` (SURVEY.md §3 hot loop #1).

fp64 runs (golden-accuracy CPU solves) keep the XLA path in
``models/local_solvers.py`` — this kernel is the fp32 TPU throughput path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.ops.quadratic import EdgeSet

CHUNK = 512  # chunked-fallback one-hot matmul width (tabled path: no chunks)
MAX_DIAGS = 16  # diagonal (lane-shift) loop-closure classes per problem
# precomputed-table budget: the VMEM probe compiled+ran a 112 MB-footprint
# kernel on this v5e, and Mosaic's scoped-stack accounting charges the table
# ~3.2× (input + one materialized copy per matmul orientation) plus ~2 MB of
# solver state — so cap the table itself at ~30 MB
TABLE_VMEM_BUDGET = 30 * 2**20
_STATS_W = 128  # stats row width; layout below
# stats layout (single-solve): [0]=f0 [1]=f_opt [2]=gn0 [3]=gn_opt
#   [4]=TR iters [5]=total tCG iterations executed (Hessian applications —
#   the work unit of the roofline slope; work-normalized reporting)
# stats layout (multi-step runner): [0]=cost [1]=iteration [2]=steps this
#   launch [3]=total tCG iterations this launch
_S_MOVED = 8  # [8 : 8+R]   per-robot block Frobenius displacement
_S_UPD = 64  # [64 : 64+R]  per-robot "was updated" flag (mask coverage)
MAX_ROBOTS = _S_UPD - _S_MOVED  # stats-row capacity


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# layout transforms (XLA-side, cheap)
# --------------------------------------------------------------------------


def to_t(X: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """(n, r, d+1) fp32 → (C, n_pad) component-major rows (row b·r+a)."""
    n, r, dp1 = X.shape
    Xt = jnp.transpose(X, (2, 1, 0)).reshape(dp1 * r, n)
    return jnp.pad(Xt, ((0, 0), (0, n_pad - n)))


def from_t(Xt: jnp.ndarray, n: int, r: int, dp1: int) -> jnp.ndarray:
    return jnp.transpose(Xt[:, :n].reshape(dp1, r, n), (2, 1, 0))


def pinv_to_t(Pinv: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """(n, d+1, d+1) → ((d+1)², n_pad); row b·(d+1)+b2 = Pinv[:, b, b2]."""
    n, dp1, _ = Pinv.shape
    Pt = jnp.transpose(Pinv, (1, 2, 0)).reshape(dp1 * dp1, n)
    return jnp.pad(Pt, ((0, 0), (0, n_pad - n)))


def mask_to_row(mask: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """(n, 1, 1) block mask → (1, n_pad) fp32 row."""
    m = mask[:, 0, 0].astype(jnp.float32)
    return jnp.pad(m, (0, n_pad - m.shape[0]))[None, :]


def mask_to_row_np(mask_np: np.ndarray, n_pad: int) -> np.ndarray:
    """Host-side :func:`mask_to_row` — runner prep must not touch the
    device (see LiftedProblem.edges_np on the d2h sync hazard)."""
    m = np.asarray(mask_np)[:, 0, 0].astype(np.float32)
    out = np.zeros((1, n_pad), np.float32)
    out[0, : m.shape[0]] = m
    return out


# --------------------------------------------------------------------------
# static kernel-side edge layout
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KernelGraph:
    """Host-built static layout splitting an EdgeSet into chain lanes
    (dst == src+1: gathers become shifts) and loop slots (one-hot matmuls).

    Geometry (R, t) never changes; robust weights do (GNC rounds), so the
    per-lane effective weights are rebuilt on device via
    :meth:`weight_rows` from the live weight vector.
    """

    n: int
    n_pad: int
    r: int
    d: int
    E_loop: int
    E_loop_pad: int
    num_robots: int
    offsets: Tuple[int, ...]  # robot block starts (static)
    num_poses: Tuple[int, ...]
    chain_R: np.ndarray  # (d*d, n_pad) fp32
    chain_t: np.ndarray  # (d, n_pad)
    loop_idx2: np.ndarray  # (1, 2*E_loop_pad) int32  [src block | dst block]
    loop_R: np.ndarray  # (d*d, E_loop_pad)
    loop_t: np.ndarray  # (d, E_loop_pad)
    # weight-refresh scatter maps over the problem's (padded) edge array
    chain_lane_of_edge: np.ndarray  # (E_pad,) int32; n_pad = dump slot
    loop_slot_of_edge: np.ndarray  # (E_pad,) int32; E_loop_pad = dump slot

    # inverse maps (each chain lane / loop slot is claimed by ≤1 edge):
    # gather-based weight refresh — kwc = kw[edge_of_lane] — instead of a
    # scatter (scatters serialize on TPU; this runs per-step on the SPMD path)
    chain_edge_of_lane: np.ndarray = None  # (n_pad,) int32; E_pad = none
    loop_edge_of_slot: np.ndarray = None  # (E_loop_pad,) int32

    # src-sorted window spec (windowed=True builds): loop slots are sorted by
    # src, so the src endpoints of chunk c live in lanes
    # [loop_win_off[c], loop_win_off[c] + loop_win_w) — the src-side one-hot
    # shrinks from n_pad rows to loop_win_w rows. The offsets ride into the
    # kernel as SMEM *data* (``wins_row``, multiples of 256 so Mosaic can
    # prove lane alignment), so the engine and SPMD paths share one windowed
    # program — per-device offset rows on the SPMD path. Windows only matter
    # for the chunked fallback; the tabled path (``oh_table``) has no chunk
    # loop and ignores them.
    loop_win_off: Optional[Tuple[int, ...]] = None  # per chunk (incl. tail)
    loop_win_w: int = 0

    # diagonal loop-closure classes (module docstring): offsets Δ ∉ {0, 1}
    # claiming ≥ diag_min edges become dense lane classes whose gathers and
    # scatter-adds are static Δ-lane shifts (zero MXU cost). Lane s of class
    # j hosts edge (s, s+Δ_j). diag_lane_of_edge is the FLAT
    # (E_pad,) → j·n_pad + lane scatter map (sentinel = D·n_pad);
    # diag_edge_of_lane its (D·n_pad,) inverse (sentinel = E_pad), D =
    # max(1, len(diags2)).
    diags2: Tuple[int, ...] = ()
    diag_R: np.ndarray = None  # (D*d*d, n_pad) fp32, identity on empty lanes
    diag_t: np.ndarray = None  # (D*d, n_pad)
    diag_lane_of_edge: np.ndarray = None  # (E_pad,) int32 flat
    diag_edge_of_lane: np.ndarray = None  # (D*n_pad,) int32

    @staticmethod
    def build(edges: EdgeSet, n: int, num_robots: int,
              offsets, num_poses, n_pad: Optional[int] = None,
              e_loop_pad: Optional[int] = None,
              windowed: bool = False,
              win_w_force: Optional[int] = None,
              diag_min: Optional[int] = None,
              diags_force: Optional[Tuple[int, ...]] = None,
              ) -> "KernelGraph":
        src = np.asarray(edges.src)
        dst = np.asarray(edges.dst)
        R = np.asarray(edges.R, np.float32)
        t = np.asarray(edges.t, np.float32)
        msk = np.asarray(edges.mask) > 0
        E_pad = src.shape[0]
        d = R.shape[-1]
        r = None  # set by caller via problem; not needed here
        n_pad = n_pad or max(_rup(n, 256), 256)
        assert n_pad >= n and n_pad % 256 == 0

        chain_lane = np.full((E_pad,), n_pad, np.int32)
        claimed = np.zeros((n_pad,), bool)
        loop_edges = []
        for e in range(E_pad):
            if not msk[e]:
                continue
            s, dd = int(src[e]), int(dst[e])
            if dd == s + 1 and not claimed[s]:
                chain_lane[e] = s
                claimed[s] = True
            else:
                loop_edges.append(e)

        # --- diagonal class selection among non-chain edges ----------------
        if diags_force is not None:
            diags2 = tuple(
                int(x) for x in diags_force if int(x) not in (0, 1)
            )
        else:
            dmin = diag_min if diag_min is not None else max(
                64, n_pad // 16
            )
            from collections import Counter

            cnt = Counter(int(dst[e]) - int(src[e]) for e in loop_edges)
            cnt.pop(1, None)
            cnt.pop(0, None)
            diags2 = tuple(
                sorted(
                    (dd for dd, c in cnt.items() if c >= dmin),
                    key=lambda dd: (-cnt[dd], dd),
                )[:MAX_DIAGS]
            )
        D = max(1, len(diags2))
        diag_lane = np.full((E_pad,), D * n_pad, np.int32)
        dclaimed = np.zeros((len(diags2), n_pad), bool)
        dindex = {dd: j for j, dd in enumerate(diags2)}
        rest = []
        for e in loop_edges:
            dd = int(dst[e]) - int(src[e])
            s = int(src[e])
            j = dindex.get(dd)
            if j is not None and not dclaimed[j, s]:
                diag_lane[e] = j * n_pad + s
                dclaimed[j, s] = True
            else:
                rest.append(e)
        loop_edges = rest
        E_loop = len(loop_edges)
        E_loop_pad = e_loop_pad or max(_rup(E_loop, CHUNK // 2), CHUNK // 2)
        assert E_loop_pad >= E_loop and E_loop_pad % (CHUNK // 2) == 0

        loop_win_off, loop_win_w = None, 0
        if windowed:
            # sort slots by src so each chunk's src lanes span a narrow,
            # statically-known window; padded tail slots (src treated as 0)
            # never match a shifted one-hot row and carry zero weight anyway
            loop_edges.sort(key=lambda e: int(src[e]))
            bounds = list(range(0, E_loop_pad, CHUNK))
            spans = []
            for off in bounds:
                real = [int(src[e])
                        for e in loop_edges[off:off + CHUNK]]
                if real:
                    lo = (min(real) // 256) * 256
                    spans.append((lo, max(real) + 1 - lo))
                else:
                    spans.append((0, 1))
            loop_win_w = max(_rup(s[1], 256) for s in spans)
            if win_w_force is not None:
                # shared-program builds (SPMD: one kernel, per-device window
                # rows as data) need a common static width
                loop_win_w = max(loop_win_w, win_w_force)
            loop_win_w = min(loop_win_w, n_pad)
            loop_win_off = tuple(
                min(s[0], n_pad - loop_win_w) for s in spans
            )

        chain_R = np.zeros((d * d, n_pad), np.float32)
        chain_R[:: d + 1, :] = 1.0  # identity on empty lanes (harmless, w=0)
        chain_t = np.zeros((d, n_pad), np.float32)
        for e in range(E_pad):
            lane = chain_lane[e]
            if lane < n_pad:
                for k in range(d):
                    for b in range(d):
                        chain_R[k * d + b, lane] = R[e, k, b]
                    chain_t[k, lane] = t[e, k]

        loop_slot = np.full((E_pad,), E_loop_pad, np.int32)
        loop_idx2 = np.zeros((1, 2 * E_loop_pad), np.int32)
        loop_R = np.zeros((d * d, E_loop_pad), np.float32)
        loop_R[:: d + 1, :] = 1.0
        loop_t = np.zeros((d, E_loop_pad), np.float32)
        for slot, e in enumerate(loop_edges):
            loop_slot[e] = slot
            loop_idx2[0, slot] = src[e]
            loop_idx2[0, E_loop_pad + slot] = dst[e]
            for k in range(d):
                for b in range(d):
                    loop_R[k * d + b, slot] = R[e, k, b]
                loop_t[k, slot] = t[e, k]

        chain_edge_of_lane = np.full((n_pad,), E_pad, np.int32)
        for e in range(E_pad):
            if chain_lane[e] < n_pad:
                chain_edge_of_lane[chain_lane[e]] = e
        loop_edge_of_slot = np.full((E_loop_pad,), E_pad, np.int32)
        for slot, e in enumerate(loop_edges):
            loop_edge_of_slot[slot] = e

        diag_R = np.zeros((D * d * d, n_pad), np.float32)
        for j in range(D):
            diag_R[j * d * d:(j + 1) * d * d:d + 1, :] = 1.0  # identity
        diag_t = np.zeros((D * d, n_pad), np.float32)
        diag_edge_of_lane = np.full((D * n_pad,), E_pad, np.int32)
        for e in range(E_pad):
            fl = diag_lane[e]
            if fl < D * n_pad:
                j, lane = divmod(int(fl), n_pad)
                diag_edge_of_lane[fl] = e
                for k in range(d):
                    for b in range(d):
                        diag_R[j * d * d + k * d + b, lane] = R[e, k, b]
                    diag_t[j * d + k, lane] = t[e, k]

        return KernelGraph(
            n=n,
            n_pad=n_pad,
            r=-1,  # filled by with_rank
            d=d,
            E_loop=E_loop,
            E_loop_pad=E_loop_pad,
            num_robots=num_robots,
            offsets=tuple(int(o) for o in offsets),
            num_poses=tuple(int(k) for k in num_poses),
            chain_R=chain_R,
            chain_t=chain_t,
            loop_idx2=loop_idx2,
            loop_R=loop_R,
            loop_t=loop_t,
            chain_lane_of_edge=chain_lane,
            loop_slot_of_edge=loop_slot,
            chain_edge_of_lane=chain_edge_of_lane,
            loop_edge_of_slot=loop_edge_of_slot,
            loop_win_off=loop_win_off,
            loop_win_w=loop_win_w,
            diags2=diags2,
            diag_R=diag_R,
            diag_t=diag_t,
            diag_lane_of_edge=diag_lane,
            diag_edge_of_lane=diag_edge_of_lane,
        )

    def with_rank(self, r: int) -> "KernelGraph":
        return dataclasses.replace(self, r=r)

    def weight_rows(self, edges: EdgeSet, weights: jnp.ndarray):
        """Device-side rebuild of per-lane effective weights from the live
        weight vector (run once per GNC weight round, off the hot path).

        Returns (kwc, twc, kwl, twl) rows of shapes (1, n_pad)/(1, E_loop_pad).
        """
        w = (weights * edges.mask).astype(jnp.float32)
        kw = w * edges.kappa.astype(jnp.float32)
        tw = w * edges.tau.astype(jnp.float32)
        cl = jnp.asarray(self.chain_lane_of_edge)
        ll = jnp.asarray(self.loop_slot_of_edge)
        kwc = jnp.zeros((self.n_pad + 1,), jnp.float32).at[cl].add(kw)[
            : self.n_pad][None, :]
        twc = jnp.zeros((self.n_pad + 1,), jnp.float32).at[cl].add(tw)[
            : self.n_pad][None, :]
        kwl = jnp.zeros((self.E_loop_pad + 1,), jnp.float32).at[ll].add(kw)[
            : self.E_loop_pad][None, :]
        twl = jnp.zeros((self.E_loop_pad + 1,), jnp.float32).at[ll].add(tw)[
            : self.E_loop_pad][None, :]
        D = max(1, len(self.diags2))
        dl = jnp.asarray(self.diag_lane_of_edge)
        kwd = jnp.zeros((D * self.n_pad + 1,), jnp.float32).at[dl].add(kw)[
            : D * self.n_pad].reshape(D, self.n_pad)
        twd = jnp.zeros((D * self.n_pad + 1,), jnp.float32).at[dl].add(tw)[
            : D * self.n_pad].reshape(D, self.n_pad)
        return kwc, twc, kwl, twl, kwd, twd

    def weight_rows_arrays(self):
        """The (chain_edge_of_lane, loop_edge_of_slot, diag_edge_of_lane)
        inverse maps as device arrays — see :func:`weight_rows_gather`."""
        return (
            jnp.asarray(self.chain_edge_of_lane),
            jnp.asarray(self.loop_edge_of_slot),
            jnp.asarray(self.diag_edge_of_lane),
        )

    def constants(self):
        """Static device constants (chain/loop/diagonal geometry + indices)."""
        return (
            jnp.asarray(self.loop_idx2),
            jnp.asarray(self.chain_R),
            jnp.asarray(self.chain_t),
            jnp.asarray(self.loop_R),
            jnp.asarray(self.loop_t),
            jnp.asarray(self.diag_R),
            jnp.asarray(self.diag_t),
        )

    def oh_table_np(self) -> np.ndarray:
        """The stacked (n_pad, 2·E_loop_pad) bf16 one-hot table: columns
        [0, E_loop_pad) are src endpoint one-hots, [E_loop_pad, 2·E_loop_pad)
        dst. Padded slots carry index 0 (row 0 set), exactly matching the
        chunked path's ``iota == 0`` behaviour — inert because their weight
        rows are zero. One-hot entries are exact in bf16."""
        import ml_dtypes

        E2 = 2 * self.E_loop_pad
        tab = np.zeros((self.n_pad, E2), ml_dtypes.bfloat16)
        tab[self.loop_idx2[0], np.arange(E2)] = 1.0
        return tab

    def oh_table(self) -> jnp.ndarray:
        """Device bf16 one-hot table (see :meth:`oh_table_np`)."""
        return jnp.asarray(self.oh_table_np(), jnp.bfloat16)

    def table_bytes(self) -> int:
        """VMEM bytes of the precomputed one-hot table."""
        return self.n_pad * 2 * self.E_loop_pad * 2

    def want_tabled(self) -> bool:
        """Opt-in (DPGO_FUSED_TABLED=1) precomputed-table kernel. Measured
        on v5e (docs/PERFORMANCE.md roofline): the tabled path is ~19%
        SLOWER than the windowed chunked path on sphere2500 — MXU one-hot
        time is ∝ K·N area regardless of the ≤128 LHS rows, so the
        unwindowed full-width table matmuls cost more than on-the-fly
        windowed one-hot construction, whose VPU cost overlaps the MXU.
        Kept as an explicitly-selectable variant + the measurement's
        witness; the diagonal-class extraction (diags2) is the path that
        actually removes one-hot work."""
        import os

        env = os.environ.get("DPGO_FUSED_TABLED")
        if env is not None and env not in ("0", "false", "False"):
            return self.table_bytes() <= TABLE_VMEM_BUDGET
        return False


def build_kernel_graph(problem, r: Optional[int] = None) -> KernelGraph:
    """KernelGraph from a LiftedProblem (engine path: src-windowed chunks).

    Reads the problem's HOST edge mirror — the layout pass is pure numpy
    and must not pull device arrays back (d2h sync hazard, see
    LiftedProblem.edges_np)."""
    kg = KernelGraph.build(
        problem.host_edges, problem.n, problem.num_robots, problem.offsets,
        problem.num_poses, windowed=True,
    )
    return kg.with_rank(r or problem.r)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------


def _hilo(x: jnp.ndarray) -> jnp.ndarray:
    """fp32 (C, N) → (2C, N) bf16 [hi; lo] with hi+lo ≈ x to ~2⁻¹⁶."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)



def make_edge_alg(
    C, r, d, n_pad, E_loop_pad, n_chunks_l, tail_l,
    windowed, win_w, tabled, has_loops, diags2,
    Rc, tc, kwc, twc, Pt,
    idx2_ref, oh_ref, Rl_ref, tl_ref, kwl_ref, twl_ref,
    d2R_ref, d2t_ref, kwd_ref, twd_ref,
    wins_ref, thl_ref, acc_ref,
):
    """Shared in-kernel edge-pass + manifold row algebra (transposed SoA
    layout) used by BOTH fused kernels — the RTR block solve below and the
    ASAPP RGD tick (ops/fused_asapp.py). Statics are Python values; weight/
    geometry rows are pre-loaded arrays; chunk-sliced tables stay refs.

    Returns a namespace with: shift_left/right/by, edge_terms,
    edge_contribs, egrad_and_cost(T, with_f), rowsum, proj, precond,
    inner, retract.
    """
    import types

    from jax.experimental import pallas as pl

    zcol = jnp.zeros((C, 1), jnp.float32)

    def shift_left(A):  # lane i ← A[:, i+1]
        return jnp.concatenate([A[:, 1:], zcol], axis=1)

    def shift_right(A):  # lane i ← A[:, i-1]
        return jnp.concatenate([zcol, A[:, :-1]], axis=1)

    def shift_by(A, delta):  # lane i ← A[:, i+delta], zero-filled
        if delta == 0:
            return A
        z = jnp.zeros((A.shape[0], abs(delta)), A.dtype)
        if delta > 0:
            return jnp.concatenate([A[:, delta:], z], axis=1)
        return jnp.concatenate([z, A[:, :delta]], axis=1)

    # ---- edge algebra (shared chain/loop; all row-wise VPU) -----------
    def edge_terms(Vi, Vj, Rv, tv, kw, tw, with_f=True):
        """Residual terms: kr1 (list d of (r,N)) = 2·kw·r1_b,
        tr2 (r,N) = 2·tw·r2, f = Σ kw‖r1‖² + tw‖r2‖².

        ``with_f=False`` (Hessian-vector applications) skips the cost
        accumulation — d+1 full-array multiply+scalar-reduce passes per
        edge class that the tCG loop never reads."""
        kr1 = []
        f = jnp.zeros((), jnp.float32)
        for b in range(d):
            acc = Vj[b * r:(b + 1) * r]
            for k in range(d):
                acc = acc - Vi[k * r:(k + 1) * r] * Rv[k * d + b][None, :]
            if with_f:
                f = f + jnp.sum(kw * (acc * acc))
            kr1.append(2.0 * kw * acc)
        r2 = Vj[d * r:(d + 1) * r] - Vi[d * r:(d + 1) * r]
        for k in range(d):
            r2 = r2 - Vi[k * r:(k + 1) * r] * tv[k][None, :]
        if with_f:
            f = f + jnp.sum(tw * (r2 * r2))
        tr2 = 2.0 * tw * r2
        return kr1, tr2, f

    def edge_contribs(kr1, tr2, Rv, tv):
        """Per-edge gradient contributions → Ci (src), Cj (dst)."""
        rows_i = []
        for k in range(d):
            acc = tr2 * tv[k][None, :]
            for b in range(d):
                acc = acc + kr1[b] * Rv[k * d + b][None, :]
            rows_i.append(-acc)
        rows_i.append(-tr2)
        Ci = jnp.concatenate(rows_i, axis=0)
        Cj = jnp.concatenate(kr1 + [tr2], axis=0)
        return Ci, Cj

    def loop_edges_apply(Thl, off, width, f, woff=None, with_f=True):
        """Fused gather → edge compute → scatter-add for one chunk of
        loop slots. Each endpoint one-hot is built ONCE and used in both
        matmul orientations — as the gather RHS (contract n_pad) and as
        the scatter-add RHS (contract the chunk dim; an NT contraction,
        no transpose materialized). One-hot construction is the kernel's
        dominant VPU cost, so this halves it vs separate passes.

        With a src window ``woff`` (slots sorted by src at
        KernelGraph.build; offsets ride in SMEM as multiples of 256 so
        Mosaic can prove lane alignment of the dynamic slices), the src
        one-hot spans ``win_w`` lanes instead of ``n_pad`` — the gather
        LHS is the matching dynamic slice of the hi/lo state staged in
        ``thl_ref``, and the scatter-add targets the same slice of the
        accumulator. Padded slots (src = 0, below any window) match no
        shifted row and carry zero weight, so they contribute nothing
        either way."""
        s_idx = idx2_ref[0, pl.ds(off, width)]
        d_idx = idx2_ref[0, pl.ds(E_loop_pad + off, width)]
        iota_d = jax.lax.broadcasted_iota(jnp.int32, (n_pad, width), 0)
        oh_d = (iota_d == d_idx[None, :]).astype(jnp.bfloat16)
        if woff is None:
            oh_s = (iota_d == s_idx[None, :]).astype(jnp.bfloat16)
            Th_s = Thl
        else:
            iota_s = jax.lax.broadcasted_iota(
                jnp.int32, (win_w, width), 0
            )
            oh_s = (iota_s == (s_idx[None, :] - woff)).astype(
                jnp.bfloat16
            )
            Th_s = thl_ref[:, pl.ds(woff, win_w)]
        Vi2 = jax.lax.dot_general(
            Th_s, oh_s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        Vj2 = jax.lax.dot_general(
            Thl, oh_d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        Vi = Vi2[:C] + Vi2[C:]
        Vj = Vj2[:C] + Vj2[C:]
        Rv = Rl_ref[:, pl.ds(off, width)]
        tv = tl_ref[:, pl.ds(off, width)]
        kw = kwl_ref[:, pl.ds(off, width)]
        tw = twl_ref[:, pl.ds(off, width)]
        kr1, tr2, fc = edge_terms(Vi, Vj, Rv, tv, kw, tw, with_f)
        Ci, Cj = edge_contribs(kr1, tr2, Rv, tv)
        ci_hilo = jax.lax.dot_general(
            _hilo(Ci), oh_s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if woff is None:
            acc_ref[:] += ci_hilo
        else:
            acc_ref[:, pl.ds(woff, win_w)] = (
                acc_ref[:, pl.ds(woff, win_w)] + ci_hilo
            )
        acc_ref[:] += jax.lax.dot_general(
            _hilo(Cj), oh_d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return f + fc

    def egrad_and_cost(T, with_f=True):
        """(∇f(T), f(T)) over chain + diagonal + loop edges — Q.
        ``with_f=False`` skips every cost reduction (tCG hot path)."""
        Vi = T
        Vj = shift_left(T)
        kr1, tr2, f = edge_terms(Vi, Vj, Rc, tc, kwc, twc, with_f)
        Ci, Cj = edge_contribs(kr1, tr2, Rc, tc)
        G = Ci + shift_right(Cj)

        # diagonal classes: gather = static Δ-lane shift, scatter-add =
        # the −Δ shift — a full-lane VPU edge pass per class, zero MXU
        for j, delta in enumerate(diags2):
            Rv = d2R_ref[j * d * d:(j + 1) * d * d, :]
            tv = d2t_ref[j * d:(j + 1) * d, :]
            kw = kwd_ref[j:j + 1, :]
            tw = twd_ref[j:j + 1, :]
            kr1d, tr2d, fd = edge_terms(
                T, shift_by(T, delta), Rv, tv, kw, tw, with_f
            )
            Cid, Cjd = edge_contribs(kr1d, tr2d, Rv, tv)
            G = G + Cid + shift_by(Cjd, -delta)
            f = f + fd

        if not has_loops:
            return G, f
        Thl = _hilo(T)

        if tabled:
            # precomputed one-hot table: ONE full-width MXU gather and
            # ONE NT scatter per Q-application — no iota-compare one-hot
            # construction, no chunk loop (the round-2 VPU bottleneck)
            E = E_loop_pad
            oh = oh_ref[:]  # (n_pad, 2E) bf16 [src | dst]
            V2 = jax.lax.dot_general(
                Thl, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            Vi_l = V2[:C, :E] + V2[C:, :E]
            Vj_l = V2[:C, E:] + V2[C:, E:]
            Rv = Rl_ref[:]
            tv = tl_ref[:]
            kw = kwl_ref[:]
            tw = twl_ref[:]
            kr1l, tr2l, fl = edge_terms(Vi_l, Vj_l, Rv, tv, kw, tw, with_f)
            Cil, Cjl = edge_contribs(kr1l, tr2l, Rv, tv)
            Chl = jnp.concatenate([_hilo(Cil), _hilo(Cjl)], axis=1)
            A = jax.lax.dot_general(
                Chl, oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return G + A[:C] + A[C:], f + fl

        acc_ref[:] = jnp.zeros((2 * C, n_pad), jnp.float32)

        if windowed:
            # one fori_loop body (unrolling blows the Mosaic VMEM
            # stack); every chunk's window offset — tail included — is
            # DATA read from SMEM as a multiple of 256 (alignment
            # provable; per-device rows on the SPMD path)
            thl_ref[:] = Thl

            def wbody(cidx, facc):
                wo = wins_ref[0, cidx] * 256
                return loop_edges_apply(
                    Thl, cidx * CHUNK, CHUNK, facc, wo, with_f
                )

            if n_chunks_l:
                f = jax.lax.fori_loop(0, n_chunks_l, wbody, f)
            if tail_l:
                f = loop_edges_apply(
                    Thl, n_chunks_l * CHUNK, tail_l, f,
                    wins_ref[0, n_chunks_l] * 256, with_f,
                )
        else:
            def body(cidx, facc):
                return loop_edges_apply(
                    Thl, cidx * CHUNK, CHUNK, facc, None, with_f
                )

            if n_chunks_l:
                f = jax.lax.fori_loop(0, n_chunks_l, body, f)
            if tail_l:
                f = loop_edges_apply(
                    Thl, n_chunks_l * CHUNK, tail_l, f, None, with_f
                )
        A = acc_ref[:]
        return G + A[:C] + A[C:], f

    # ---- manifold row algebra -----------------------------------------
    def rowsum(A):  # (rows, N) → (1, N)
        return jnp.sum(A, axis=0, keepdims=True)

    def proj(Xv, V):
        """Tangent projection at Xv: V_Y − Y·sym(YᵀV_Y); p free."""
        S = []  # S[k][l] = Σ_a Y_k[a] V_l[a]  (1, N)
        for k in range(d):
            Yk = Xv[k * r:(k + 1) * r]
            S.append([rowsum(Yk * V[l * r:(l + 1) * r]) for l in range(d)])
        out = []
        for l in range(d):
            acc = V[l * r:(l + 1) * r]
            for k in range(d):
                Skl = 0.5 * (S[k][l] + S[l][k])
                acc = acc - Xv[k * r:(k + 1) * r] * Skl
            out.append(acc)
        out.append(V[d * r:(d + 1) * r])
        return jnp.concatenate(out, axis=0)

    def precond(V):
        """V ← V·P⁻¹ per pose (component-major rows)."""
        return precond_with(V, Pt)

    def precond_with(V, Ptv):
        """precond against an explicit (sliced) transposed inverse — all
        per-lane algebra here is column-independent, so callers may
        restrict to a static lane window (ASAPP per-robot blocks)."""
        out = []
        for b2 in range(d + 1):
            acc = V[0:r] * Ptv[0 * (d + 1) + b2][None, :]
            for b in range(1, d + 1):
                acc = acc + (
                    V[b * r:(b + 1) * r] * Ptv[b * (d + 1) + b2][None, :]
                )
            out.append(acc)
        return jnp.concatenate(out, axis=0)

    def inner(U, V):
        return jnp.sum(U * V)

    def retract(Xv, V):
        """Newton–Schulz polar retraction (20 iters), translations move
        Euclidean — mirrors stiefel.retract_polar_ns."""
        A = Xv[: d * r] + V[: d * r]  # (d·r, N)
        tr = rowsum(A * A)
        s = jax.lax.rsqrt(jnp.maximum(tr, 1e-12))
        Z0 = A * s

        def body(_, Z):
            G3 = []
            for k in range(d):
                Zk = Z[k * r:(k + 1) * r]
                G3.append([rowsum(Zk * Z[l * r:(l + 1) * r])
                           for l in range(d)])
            rows = []
            for l in range(d):
                acc = 3.0 * Z[l * r:(l + 1) * r]
                for k in range(d):
                    acc = acc - Z[k * r:(k + 1) * r] * G3[k][l]
                rows.append(0.5 * acc)
            return jnp.concatenate(rows, axis=0)

        Z = jax.lax.fori_loop(0, 20, body, Z0)
        p = Xv[d * r:(d + 1) * r] + V[d * r:(d + 1) * r]
        return jnp.concatenate([Z, p], axis=0)


    return types.SimpleNamespace(
        shift_left=shift_left,
        shift_right=shift_right,
        shift_by=shift_by,
        edge_terms=edge_terms,
        edge_contribs=edge_contribs,
        egrad_and_cost=egrad_and_cost,
        rowsum=rowsum,
        proj=proj,
        precond=precond,
        precond_with=precond_with,
        inner=inner,
        retract=retract,
    )


def make_rtr_solve(
    alg, C, r, d, n_pad,
    max_iterations, max_tcg_iterations, gradnorm_tol,
    initial_radius, max_radius, tcg_kappa, tcg_theta,
):
    """In-kernel RTR block-solve factory shared by the single-solve kernel
    and the multi-step runner kernel: ``solve(X0, mask)`` runs one full
    truncated-CG trust-region solve of the masked block subproblem and
    returns ``(Xf, f0, ff, gn0, gnf, kf)``. ``mask`` is a (1, n_pad) row —
    a per-call value so the multi-step kernel can switch blocks between
    steps without recompiling."""
    EPS = 1e-30  # fp32-representable guard (XLA path uses 1e-300 in fp64)
    egrad_and_cost = alg.egrad_and_cost
    rowsum = alg.rowsum
    proj = alg.proj
    precond = alg.precond
    inner = alg.inner
    retract = alg.retract

    def solve(X0, mask):
        # ---- truncated CG -----------------------------------------------
        def hess(Xv, Ssym, V):
            """mask ∘ (proj(egrad(V) − VY·sym(YᵀG_Y)))  — rhess_vp."""
            EH, _ = egrad_and_cost(V, with_f=False)
            rows = []
            for b in range(d):
                acc = EH[b * r:(b + 1) * r]
                for k in range(d):
                    acc = acc - V[k * r:(k + 1) * r] * Ssym[k * d + b][None, :]
                rows.append(acc)
            rows.append(EH[d * r:(d + 1) * r])
            corr = jnp.concatenate(rows, axis=0)
            return mask * proj(Xv, corr)

        def make_Ssym(Xv, G):
            """sym(Yᵀ G_Y) rows (d·d, N)."""
            S = {}
            for k in range(d):
                Yk = Xv[k * r:(k + 1) * r]
                for l in range(d):
                    S[(k, l)] = rowsum(Yk * G[l * r:(l + 1) * r])
            rows = [0.5 * (S[(k, l)] + S[(l, k)])
                    for k in range(d) for l in range(d)]
            return jnp.concatenate(rows, axis=0)

        def prec_tangent(Xv, V):
            return mask * proj(Xv, precond(V))

        def tcg(Xv, G, radius):
            g = mask * proj(Xv, G)
            Ssym = make_Ssym(Xv, G)
            r0 = g
            z0 = prec_tangent(Xv, r0)
            r_z0 = inner(r0, z0)
            r0n = jnp.sqrt(jnp.maximum(inner(r0, r0), EPS))
            if tcg_theta == 1.0:
                target = r0n * jnp.minimum(tcg_kappa, r0n)
            else:
                target = r0n * jnp.minimum(
                    tcg_kappa, jnp.power(r0n, tcg_theta)
                )
            Zr = jnp.zeros((C, n_pad), jnp.float32)

            def boundary_step(eta, delta):
                ee = inner(eta, eta)
                ed = inner(eta, delta)
                dd = jnp.maximum(inner(delta, delta), EPS)
                disc = jnp.maximum(ed * ed + dd * (radius * radius - ee), 0.0)
                return (-ed + jnp.sqrt(disc)) / dd

            def cond(s):
                eta, Heta, rr, z, delta, r_z, k, done = s
                return jnp.logical_and(
                    jnp.logical_not(done), k < max_tcg_iterations
                )

            def body(s):
                eta, Heta, rr, z, delta, r_z, k, done = s
                Hd = hess(Xv, Ssym, delta)
                dHd = inner(delta, Hd)
                alpha = r_z / jnp.where(dHd > 0, dHd, 1.0)
                eta_try = eta + alpha * delta
                eta_n2 = inner(eta_try, eta_try)
                hit = jnp.logical_or(dHd <= 0, eta_n2 >= radius * radius)
                tau = boundary_step(eta, delta)
                step = jnp.where(hit, tau, alpha)
                eta_new = eta + step * delta
                Heta_new = Heta + step * Hd
                r_new = rr + alpha * Hd
                r_nrm = jnp.sqrt(jnp.maximum(inner(r_new, r_new), 0.0))
                conv = r_nrm <= target
                z_new = prec_tangent(Xv, r_new)
                r_z_new = inner(r_new, z_new)
                beta = r_z_new / jnp.maximum(r_z, EPS)
                delta_new = -z_new + beta * delta
                done_new = jnp.logical_or(hit, conv)
                return (
                    eta_new,
                    Heta_new,
                    jnp.where(done_new, rr, r_new),
                    jnp.where(done_new, z, z_new),
                    jnp.where(done_new, delta, delta_new),
                    jnp.where(done_new, r_z, r_z_new),
                    k + 1,
                    done_new,
                )

            init = (Zr, Zr, r0, z0, -z0, r_z0,
                    jnp.zeros((), jnp.int32), r0n <= 0.0)
            eta, Heta, _, _, _, _, ktcg, _ = jax.lax.while_loop(
                cond, body, init
            )
            return eta, Heta, g, ktcg

        # ---- trust-region outer loop ------------------------------------
        G0, f0 = egrad_and_cost(X0)
        g0 = mask * proj(X0, G0)
        gn0 = jnp.sqrt(jnp.maximum(inner(g0, g0), 0.0))

        def tr_cond(s):
            Xv, G, f, radius, k, gn, done, ktot = s
            return jnp.logical_and(
                jnp.logical_not(done), k < max_iterations
            )

        def tr_body(s):
            Xv, G, f, radius, k, gn, done, ktot = s
            eta, Heta, g, ktcg = tcg(Xv, G, radius)
            pred = -(inner(g, eta) + 0.5 * inner(eta, Heta))
            X_try = retract(Xv, eta)
            G_try, f_try = egrad_and_cost(X_try)
            ared = f - f_try
            rho = ared / jnp.where(jnp.abs(pred) > EPS, pred, EPS)
            accept = jnp.logical_and(rho > 0.1, pred > 0)
            eta_n = jnp.sqrt(jnp.maximum(inner(eta, eta), 0.0))
            radius_new = jnp.where(
                rho < 0.25,
                0.25 * radius,
                jnp.where(
                    jnp.logical_and(rho > 0.75, eta_n >= 0.99 * radius),
                    jnp.minimum(2.0 * radius, max_radius),
                    radius,
                ),
            )
            X_new = jnp.where(accept, X_try, Xv)
            f_new = jnp.where(accept, f_try, f)
            G_new = jnp.where(accept, G_try, G)
            gN = mask * proj(X_new, G_new)
            gn_new = jnp.sqrt(jnp.maximum(inner(gN, gN), 0.0))
            return (
                X_new, G_new, f_new, radius_new, k + 1, gn_new,
                gn_new <= gradnorm_tol, ktot + ktcg,
            )

        init = (
            X0, G0, f0,
            jnp.asarray(initial_radius, jnp.float32),
            jnp.zeros((), jnp.int32), gn0, gn0 <= gradnorm_tol,
            jnp.zeros((), jnp.int32),
        )
        Xf, Gf, ff, _, kf, gnf, _, ktcg_tot = jax.lax.while_loop(
            tr_cond, tr_body, init
        )
        return Xf, f0, ff, gn0, gnf, kf, ktcg_tot

    return solve


@functools.lru_cache(maxsize=32)
def _make_rtr_kernel(
    n_pad: int,
    E_loop_pad: int,
    r: int,
    d: int,
    num_robots: int,
    offsets: Tuple[int, ...],
    num_poses: Tuple[int, ...],
    max_iterations: int,
    max_tcg_iterations: int,
    gradnorm_tol: float,
    initial_radius: float,
    max_radius: float,
    tcg_kappa: float,
    tcg_theta: float,
    interpret: bool,
    windowed: bool = False,
    win_w: int = 0,
    tabled: bool = False,
    diags2: Tuple[int, ...] = (),
    has_loops: bool = True,
):
    """Compile-cached pallas_call for one full RTR block solve."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = r * (d + 1)
    n_chunks_l = E_loop_pad // CHUNK
    tail_l = E_loop_pad - n_chunks_l * CHUNK  # 0 or 256 (multiple of 256)
    EPS = 1e-30  # fp32-representable guard (XLA path uses 1e-300 in fp64)
    windowed = windowed and has_loops and not tabled

    def kernel(
        xt_ref, mask_ref, pinv_ref, kwc_ref, twc_ref, kwl_ref, twl_ref,
        idx2_ref, Rc_ref, tc_ref, Rl_ref, tl_ref,
        d2R_ref, d2t_ref, kwd_ref, twd_ref,
        *rest,
    ):
        # tabled path: idx2_ref slot carries the precomputed one-hot table
        oh_ref = idx2_ref if tabled else None
        if tabled:
            xout_ref, stats_ref = rest
            wins_ref = thl_ref = acc_ref = None
        elif windowed:
            wins_ref, xout_ref, stats_ref, acc_ref, thl_ref = rest
        else:
            xout_ref, stats_ref, acc_ref = rest
            wins_ref = thl_ref = None
        mask = mask_ref[:]  # (1, n_pad)
        Rc = Rc_ref[:]
        tc = tc_ref[:]
        kwc = kwc_ref[:]
        twc = twc_ref[:]
        Pt = pinv_ref[:]

        alg = make_edge_alg(
            C, r, d, n_pad, E_loop_pad, n_chunks_l, tail_l,
            windowed, win_w, tabled, has_loops, diags2,
            Rc, tc, kwc, twc, Pt,
            idx2_ref if not tabled else None, oh_ref,
            Rl_ref, tl_ref, kwl_ref, twl_ref,
            d2R_ref, d2t_ref, kwd_ref, twd_ref,
            wins_ref, thl_ref, acc_ref,
        )
        solve = make_rtr_solve(
            alg, C, r, d, n_pad,
            max_iterations, max_tcg_iterations, gradnorm_tol,
            initial_radius, max_radius, tcg_kappa, tcg_theta,
        )
        X0 = xt_ref[:]
        Xf, f0, ff, gn0, gnf, kf, ktcg = solve(X0, mask)
        xout_ref[:] = Xf

        # ---- stats row (scalar VMEM stores are illegal: build via selects) --
        vals = {0: f0, 1: ff, 2: gn0, 3: gnf, 4: kf.astype(jnp.float32),
                5: ktcg.astype(jnp.float32)}
        D = (Xf - X0) * mask
        for rb in range(num_robots):
            o, nk = offsets[rb], num_poses[rb]
            blk = D[:, o:o + nk]
            vals[_S_MOVED + rb] = jnp.sqrt(jnp.sum(blk * blk))
            vals[_S_UPD + rb] = jnp.max(mask[:, o:o + nk])
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, _STATS_W), 1)
        stats = jnp.zeros((1, _STATS_W), jnp.float32)
        for pos, v in vals.items():
            stats = jnp.where(iota_s == pos, v, stats)
        stats_ref[:] = stats

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16
    if tabled:
        scratch = []
        # Mosaic's scoped-stack accounting charges the table ~3× (input +
        # one materialized copy per matmul orientation); proven ceiling
        # ~112 MB on this v5e (see docs/PERFORMANCE.md VMEM probe)
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20,
        )
    else:
        # the default 16 MB scoped-VMEM cap is conservative (v5e has 128 MB);
        # big-n problems (cubicle n_pad=5888, D=4 diag classes) exceed it
        # once XLA wraps the call in a loop with double-buffered copies.
        # Very large worlds (synthetic n >= 25k: tCG carries ~12 (C, n_pad)
        # live arrays) need the full budget.
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=(
                112 * 2**20 if n_pad > 16384 else 64 * 2**20
            ),
        )
        scratch = [
            pltpu.VMEM((2 * C, n_pad), jnp.float32),  # scatter accumulator
        ]
        if windowed:
            # windows/256 row in SMEM
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            scratch.append(pltpu.VMEM((2 * C, n_pad), jnp.bfloat16))  # X hilo
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, _STATS_W), jnp.float32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )


def rtr_solve_fused(
    Xt: jnp.ndarray,
    mask_row: jnp.ndarray,
    pinv_t: jnp.ndarray,
    wrows: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    kg: KernelGraph,
    params,
    interpret: bool = False,
    consts=None,
    wins: Optional[jnp.ndarray] = None,
    oh: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full RTR block solve as a single Pallas kernel.

    Args: transposed state (C, n_pad), (1, n_pad) block-mask row, transposed
    block-Jacobi inverse, per-lane weight rows from
    :meth:`KernelGraph.weight_rows`, and RTRParams. Passing ``oh`` (the
    precomputed bf16 one-hot table from :meth:`KernelGraph.oh_table`)
    selects the tabled kernel — the fast path whenever the table fits VMEM
    (:meth:`KernelGraph.want_tabled`).

    Returns (Xt_new, stats) — stats layout at module top.
    """
    tabled = oh is not None
    has_loops = kg.E_loop > 0
    fk = _make_rtr_kernel(
        kg.n_pad,
        kg.E_loop_pad,
        kg.r,
        kg.d,
        kg.num_robots,
        kg.offsets,
        kg.num_poses,
        int(params.max_iterations),
        int(params.max_tcg_iterations),
        float(params.gradnorm_tol),
        float(params.initial_radius),
        float(params.max_radius),
        float(params.tcg_kappa),
        float(params.tcg_theta),
        interpret,
        kg.loop_win_off is not None,
        int(kg.loop_win_w),
        tabled,
        tuple(kg.diags2),
        has_loops,
    )
    cs = consts if consts is not None else kg.constants()
    idx2, Rc, tc, Rl, tl, d2R, d2t = cs
    kwc, twc, kwl, twl, kwd, twd = wrows
    first = oh if tabled else idx2
    args = [
        Xt, mask_row, pinv_t, kwc, twc, kwl, twl, first, Rc, tc, Rl, tl,
        d2R, d2t, kwd, twd,
    ]
    if kg.loop_win_off is not None and has_loops and not tabled:
        if wins is None:
            wins = wins_row(kg)
        args.append(wins)
    return fk(*args)


# --------------------------------------------------------------------------
# multi-step runner kernel (round 4)
# --------------------------------------------------------------------------

_REL_W = 128  # rel-change row width (lane-padded; lanes >= R inert)


@functools.lru_cache(maxsize=32)
def _make_rtr_multistep_kernel(
    n_pad: int,
    E_loop_pad: int,
    r: int,
    d: int,
    num_robots: int,
    offsets: Tuple[int, ...],
    num_poses: Tuple[int, ...],
    max_iterations: int,
    max_tcg_iterations: int,
    gradnorm_tol: float,
    initial_radius: float,
    max_radius: float,
    tcg_kappa: float,
    tcg_theta: float,
    interpret: bool,
    windowed: bool,
    win_w: int,
    tabled: bool,
    diags2: Tuple[int, ...],
    has_loops: bool,
    # runner statics
    it_cap: int,  # max_iters — also the schedule length
    m_pad: int,  # sublane-padded mask-row count
    tol: float,  # relative-change termination tolerance
    gnc: bool,  # any robust cost (weight rounds pending possible)
    inner: int,  # weight-round cadence (inner iters × robots)
    use_inner_tol: bool,
    inner_tol: float,
    record: bool,
    rgd_stepsize: float = 0.0,
):
    """One Pallas kernel running MANY solver steps (round-4 top perf item).

    ``rgd_stepsize > 0`` replaces each scheduled step's trust-region block
    solve with ONE preconditioned Riemannian-gradient tick (the ASAPP
    update rule, mirroring ``ops/fused_asapp.py``) — the staleness-robust
    step used by the SPMD stretch mode (``parallel/spmd.py``): full block
    solves against S-step-stale separators diverge (measured, round 5),
    small RGD steps under bounded staleness are exactly the ASAPP regime
    (reference ``launch/asapp_demo.launch``).

    The round-3 fused runner paid ~480 µs per step for ~60 µs of kernel
    device time: each `lax.while_loop` iteration re-launched the Mosaic
    kernel (67.5 µs fixed intercept) plus several XLA glue fusions
    (mask-row select, stats slices, rel-change update), each with its own
    launch floor. Here the step loop itself lives IN the kernel: the update
    schedule rides in SMEM, the mask row is selected by a one-hot
    sublane-reduce, the per-robot relative-change/termination bookkeeping is
    VPU row algebra, and the kernel only exits when the run terminates, the
    iteration cap is hit, or a GNC weight round must fire on the host side
    of the launch boundary (weight rounds need the rounded-trajectory
    residuals — a per-problem XLA program — and happen ≤ a handful of times
    per solve). Launch + layout glue are paid once per GNC stretch instead
    of once per block update.

    Replaces the hot loop of reference ``src/PGOAgentROS.cpp:160``
    (``iterate(true)`` under the UPDATE token protocol) at the whole-run
    granularity.

    Exit conditions (evaluated after each step at it2 = it+1, matching the
    top-of-body evaluation of the per-step runner):
      * terminated: all real rel-change lanes < tol and no pending GNC
        weight rounds (``gnc_pending`` SMEM scalar = 0)
      * it2 == it_cap
      * GNC fire: pending and (use_inner_tol ? all(rel) < inner_tol or
        it2 − last_wu ≥ inner : it2 % inner == 0)

    With ``record=True`` the kernel also emits the (it_cap, _REL_W)
    per-iteration rel-change history (rows written at the absolute
    iteration index; untouched rows stay NaN) — the reference's
    per-iteration CSV telemetry fields (``src/PGOAgentROS.cpp:853-907``).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = r * (d + 1)
    windowed = windowed and has_loops and not tabled
    R = num_robots

    def kernel(
        xt_ref, mrows_ref, pinv_ref, kwc_ref, twc_ref, kwl_ref, twl_ref,
        idx2_ref, Rc_ref, tc_ref, Rl_ref, tl_ref,
        d2R_ref, d2t_ref, kwd_ref, twd_ref,
        adj_ref, rel0_ref, sched_ref, scal_ref, cost0_ref,
        *rest,
    ):
        oh_ref = idx2_ref if tabled else None
        rest = list(rest)
        wins_ref = rest.pop(0) if windowed else None
        xout_ref = rest.pop(0)
        relout_ref = rest.pop(0)
        stats_ref = rest.pop(0)
        relh_ref = rest.pop(0) if record else None
        acc_ref = rest.pop(0) if not tabled else None
        thl_ref = rest.pop(0) if windowed else None

        Rc = Rc_ref[:]
        tc = tc_ref[:]
        kwc = kwc_ref[:]
        twc = twc_ref[:]
        Pt = pinv_ref[:]
        mrows = mrows_ref[:]  # (m_pad, n_pad)
        adj = adj_ref[:]  # (_REL_W, _REL_W) fp32 robot adjacency

        n_chunks_l = E_loop_pad // CHUNK
        tail_l = E_loop_pad - n_chunks_l * CHUNK
        alg = make_edge_alg(
            C, r, d, n_pad, E_loop_pad, n_chunks_l, tail_l,
            windowed, win_w, tabled, has_loops, diags2,
            Rc, tc, kwc, twc, Pt,
            idx2_ref if not tabled else None, oh_ref,
            Rl_ref, tl_ref, kwl_ref, twl_ref,
            d2R_ref, d2t_ref, kwd_ref, twd_ref,
            wins_ref, thl_ref, acc_ref,
        )
        solve = make_rtr_solve(
            alg, C, r, d, n_pad,
            max_iterations, max_tcg_iterations, gradnorm_tol,
            initial_radius, max_radius, tcg_kappa, tcg_theta,
        )
        rowsum = alg.rowsum

        it0 = scal_ref[0, 0]
        last_wu = scal_ref[0, 1]
        gnc_pending = scal_ref[0, 2]
        cost0 = cost0_ref[0, 0]

        iota_m = jax.lax.broadcasted_iota(jnp.int32, (m_pad, n_pad), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, _REL_W), 1)
        relmask = iota_l < R
        neg1 = jnp.full((1, _REL_W), -1.0, jnp.float32)

        def step_cond(s):
            Xt, it, cost, rel, relh, stop, tcga = s
            return jnp.logical_and(jnp.logical_not(stop), it < it_cap)

        def step_body(s):
            Xt, it, cost, rel, relh, stop, tcga = s
            m_idx = sched_ref[0, it]
            mask = rowsum(
                mrows * (iota_m == m_idx).astype(jnp.float32)
            )  # (1, n_pad)
            if rgd_stepsize > 0:
                # ASAPP tick: one preconditioned projected-gradient step
                # (mirrors ops/fused_asapp.py lines 153-161)
                G, _f = alg.egrad_and_cost(Xt, with_f=False)
                gb = mask * alg.proj(Xt, G)
                gb = mask * alg.proj(Xt, alg.precond(gb))
                Xf = alg.retract(Xt, -rgd_stepsize * gb)
                ff = cost
                ktcg = jnp.asarray(1, jnp.int32)
            else:
                Xf, f0, ff, gn0, gnf, kf, ktcg = solve(Xt, mask)
            # restore unmasked lanes exactly (NS retraction renormalizes
            # all lanes; drift outside the block must not accumulate)
            Xt2 = Xt + (Xf - Xt) * mask
            Dm = (Xf - Xt) * mask
            moved_row = jnp.zeros((1, _REL_W), jnp.float32)
            upd_row = jnp.zeros((1, _REL_W), jnp.float32)
            for rb in range(R):
                o, nk = offsets[rb], num_poses[rb]
                blk = Dm[:, o:o + nk]
                mv = jnp.sqrt(jnp.sum(blk * blk))
                up = jnp.max(mask[:, o:o + nk])
                moved_row = jnp.where(iota_l == rb, mv, moved_row)
                upd_row = jnp.where(iota_l == rb, up, upd_row)
            # neighbor invalidation (see RBCDEngine._finish_step): a robot's
            # recorded rel-change is bumped when an adjacent robot moves
            bump = jax.lax.dot_general(
                moved_row * upd_row, adj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rel2 = jnp.where(
                upd_row > 0, moved_row, jnp.maximum(rel, bump)
            )
            if record:
                relh = _dyn_row_store(relh, it, rel2)
            maxrel = jnp.max(jnp.where(relmask, rel2, neg1))
            ready = maxrel < tol
            it2 = it + 1
            if gnc:
                term = jnp.logical_and(ready, gnc_pending == 0)
                if use_inner_tol:
                    fire = jnp.logical_or(
                        maxrel < inner_tol, (it2 - last_wu) >= inner
                    )
                else:
                    fire = jnp.mod(it2, inner) == 0
                stop2 = jnp.logical_or(
                    term, jnp.logical_and(fire, gnc_pending != 0)
                )
            else:
                stop2 = ready
            return Xt2, it2, ff, rel2, relh, stop2, tcga + ktcg

        if record:
            relh0 = jnp.full(
                (_rup(it_cap, 8), _REL_W), jnp.nan, jnp.float32
            )
        else:
            relh0 = jnp.zeros((1, 1), jnp.float32)
        # already-terminated input state runs zero steps (the caller may
        # invoke the kernel unconditionally — no XLA outer loop)
        rel_in = rel0_ref[:]
        maxrel0 = jnp.max(jnp.where(relmask, rel_in, neg1))
        ready0 = maxrel0 < tol
        if gnc:
            stop0 = jnp.logical_and(ready0, gnc_pending == 0)
        else:
            stop0 = ready0
        Xt_f, it_f, cost_f, rel_f, relh_f, _, tcg_f = jax.lax.while_loop(
            step_cond, step_body,
            (
                xt_ref[:], it0, cost0, rel_in, relh0, stop0,
                jnp.zeros((), jnp.int32),
            ),
        )
        xout_ref[:] = Xt_f
        relout_ref[:] = rel_f
        if record:
            relh_ref[:] = relh_f
        vals = {
            0: cost_f,
            1: it_f.astype(jnp.float32),
            2: (it_f - it0).astype(jnp.float32),
            3: tcg_f.astype(jnp.float32),
        }
        stats = jnp.zeros((1, _STATS_W), jnp.float32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, _STATS_W), 1)
        for pos, v in vals.items():
            stats = jnp.where(iota_s == pos, v, stats)
        stats_ref[:] = stats

    def _dyn_row_store(H, it, row):
        """H (it_cap_pad, _REL_W) with row ``it`` replaced by ``row`` —
        expressed as a select against a broadcast (dynamic sublane stores
        are fragile in Mosaic; it_cap rows × 128 lanes is small)."""
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (H.shape[0], _REL_W), 0
        )
        return jnp.where(iota_r == it, row, H)

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 16
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # adj
        pl.BlockSpec(memory_space=pltpu.VMEM),  # rel0
        pl.BlockSpec(memory_space=pltpu.SMEM),  # sched
        pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (i32)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cost0 (f32)
    ]
    scratch = []
    if tabled:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20,
        )
    else:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=(
                112 * 2**20 if n_pad > 16384 else 64 * 2**20
            ),
        )
        if windowed:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_shape = [
        jax.ShapeDtypeStruct((C, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, _REL_W), jnp.float32),
        jax.ShapeDtypeStruct((1, _STATS_W), jnp.float32),
    ]
    out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
    if record:
        out_shape.append(
            jax.ShapeDtypeStruct((_rup(it_cap, 8), _REL_W), jnp.float32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if not tabled:
        scratch.append(pltpu.VMEM((2 * C, n_pad), jnp.float32))
        if windowed:
            scratch.append(pltpu.VMEM((2 * C, n_pad), jnp.bfloat16))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        interpret=interpret,
    )


def rtr_run_fused(
    Xt: jnp.ndarray,
    mrows_pad: jnp.ndarray,
    pinv_t: jnp.ndarray,
    wrows,
    kg: KernelGraph,
    params,
    *,
    adj_pad: jnp.ndarray,
    rel0: jnp.ndarray,
    sched: jnp.ndarray,
    scal: jnp.ndarray,
    cost0: jnp.ndarray,
    it_cap: int,
    tol: float,
    gnc: bool,
    inner: int,
    inner_tol: Optional[float],
    record: bool = False,
    interpret: bool = False,
    consts=None,
    wins: Optional[jnp.ndarray] = None,
    oh: Optional[jnp.ndarray] = None,
    rgd_stepsize: float = 0.0,
):
    """Run up to ``it_cap − it0`` solver steps inside ONE kernel launch.

    Args beyond :func:`rtr_solve_fused`: ``mrows_pad`` (m_pad, n_pad) mask
    rows indexed by the SMEM ``sched`` (1, it_cap) i32 schedule; ``adj_pad``
    (_REL_W, _REL_W) fp32 robot adjacency; ``rel0`` (1, _REL_W) incoming
    rel-change row (lanes ≥ R must be ≤ 0); ``scal`` (1, 8) i32
    [it0, last_wu, gnc_pending]; ``cost0`` (1, 1) f32.

    Returns (Xt_new, rel_row, stats[, rel_hist]) — stats: [0]=cost,
    [1]=iteration, [2]=steps taken this launch.
    """
    tabled = oh is not None
    has_loops = kg.E_loop > 0
    fk = _make_rtr_multistep_kernel(
        kg.n_pad, kg.E_loop_pad, kg.r, kg.d, kg.num_robots,
        kg.offsets, kg.num_poses,
        int(params.max_iterations), int(params.max_tcg_iterations),
        float(params.gradnorm_tol), float(params.initial_radius),
        float(params.max_radius), float(params.tcg_kappa),
        float(params.tcg_theta),
        interpret,
        kg.loop_win_off is not None,
        int(kg.loop_win_w),
        tabled,
        tuple(kg.diags2),
        has_loops,
        int(it_cap),
        int(mrows_pad.shape[0]),
        float(tol),
        bool(gnc),
        int(inner),
        inner_tol is not None,
        float(inner_tol if inner_tol is not None else 0.0),
        bool(record),
        float(rgd_stepsize),
    )
    cs = consts if consts is not None else kg.constants()
    idx2, Rc, tc, Rl, tl, d2R, d2t = cs
    kwc, twc, kwl, twl, kwd, twd = wrows
    first = oh if tabled else idx2
    args = [
        Xt, mrows_pad, pinv_t, kwc, twc, kwl, twl, first, Rc, tc, Rl, tl,
        d2R, d2t, kwd, twd, adj_pad, rel0, sched, scal, cost0,
    ]
    if kg.loop_win_off is not None and has_loops and not tabled:
        if wins is None:
            wins = wins_row(kg)
        args.append(wins)
    return fk(*args)


def wins_row(kg: KernelGraph) -> np.ndarray:
    """The (1, n_chunks) int32 SMEM row of per-chunk window offsets / 256
    (tail chunk included) for a windowed KernelGraph — per-device data on
    the SPMD path, where every mesh slot runs the same program."""
    return np.asarray([[o // 256 for o in kg.loop_win_off]], np.int32)


def weight_rows_gather(
    kappa: jnp.ndarray,
    tau: jnp.ndarray,
    emask: jnp.ndarray,
    weights: jnp.ndarray,
    chain_edge_of_lane: jnp.ndarray,
    loop_edge_of_slot: jnp.ndarray,
    diag_edge_of_lane: jnp.ndarray,
    n_pad: int,
):
    """Per-lane effective-weight rows via GATHERS over the inverse lane maps
    (each lane/slot is claimed by at most one edge) — cheap enough to run
    every step inside the SPMD shard_map program, unlike the scatter-based
    :meth:`KernelGraph.weight_rows`.

    All edge arrays are (E_pad,); out-of-range map entries (== E_pad) read a
    appended zero. Returns (kwc, twc, kwl, twl, kwd, twd) fp32 rows; the
    diagonal rows are (D, n_pad) with D = diag_edge_of_lane.size // n_pad.
    """
    w = (weights * emask).astype(jnp.float32)
    kw = jnp.append(w * kappa.astype(jnp.float32), 0.0)
    tw = jnp.append(w * tau.astype(jnp.float32), 0.0)
    kwc = kw[chain_edge_of_lane][None, :]
    twc = tw[chain_edge_of_lane][None, :]
    kwl = kw[loop_edge_of_slot][None, :]
    twl = tw[loop_edge_of_slot][None, :]
    kwd = kw[diag_edge_of_lane].reshape(-1, n_pad)
    twd = tw[diag_edge_of_lane].reshape(-1, n_pad)
    return kwc, twc, kwl, twl, kwd, twd
