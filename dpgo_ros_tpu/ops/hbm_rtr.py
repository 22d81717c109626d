"""HBM-resident windowed-DMA RTR block solve (VERDICT r4 #3).

The VMEM-resident kernels (:mod:`dpgo_ros_tpu.ops.fused_rtr`) hold the
whole (C, n_pad) state and every per-lane table in VMEM — ~12 live arrays,
fine to ~25k poses on a v5e but a *program size* this rig's remote compile
service refuses above that (HTTP 500, bisected round 4). This variant
makes the VMEM working set INDEPENDENT of n:

  * All (rows, n_pad) operands — state, preconditioner, chain/diagonal
    geometry and weight rows — stay in HBM, with their row counts padded
    to multiples of 8: this toolchain's Mosaic compiles DMA slices of
    HBM memrefs only for sublane counts in {1, 8k} (bisected round 5 —
    20/9/3-row slices all HTTP 500, 1/8/16 compile).
  * A masked block solve only touches the robot's contiguous lane range
    plus a halo of ``max(diags2 ∪ {1})`` lanes on each side (tCG vectors
    vanish outside the mask; gradient/Hessian coupling reaches at most
    the largest diagonal-class offset). One round of async DMAs brings
    the (rows, W) window slabs into VMEM scratch, the UNMODIFIED solve
    machinery (``fused_rtr.make_edge_alg`` + ``make_rtr_solve`` — both
    width-agnostic) runs on the slab, and one DMA writes the state window
    back into the (donated) HBM buffer.
  * Edges crossing the slab boundary contribute garbage ONLY to halo
    lanes (masked out of every solver quantity) and to an additive cost
    constant that cancels in the trust-region's actual-reduction — the
    accept/reject decisions match the full-width kernel to fp noise.
    Reported f values are LOCAL restrictions (global cost must be
    evaluated outside; the full-width kernels report global f).

Supported structure: chain + diagonal lane-shift classes (``E_loop == 0``
after KernelGraph diagonal extraction) — every large-world benchmark in
this repo is banded (``io/synthetic.py`` worlds; sphere2500 itself).
Graphs with irregular loop closures keep the VMEM-resident kernel (their
bundled instances are all ≤ 5,750 poses).

Replaces the scale regime of the reference's core solver (the wrapper's
hot loop ``src/PGOAgentROS.cpp:160``; upstream runs grid3D/rim-scale
datasets absent from this snapshot, ``/root/reference/.MISSING_LARGE_BLOBS``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.ops import fused_rtr
from dpgo_ros_tpu.ops.fused_rtr import _STATS_W, _rup


def _p8(rows: int) -> int:
    """DMA-compilable sublane count: 1 stays 1, else round up to 8."""
    return 1 if rows == 1 else _rup(rows, 8)


def _pad_rows(a: jnp.ndarray) -> jnp.ndarray:
    rows = a.shape[0]
    p = _p8(rows)
    if p == rows:
        return jnp.asarray(a, jnp.float32)
    return jnp.concatenate(
        [
            jnp.asarray(a, jnp.float32),
            jnp.zeros((p - rows,) + a.shape[1:], jnp.float32),
        ],
        axis=0,
    )


def window_width(kg, extra: int = 0) -> int:
    """Static slab width: largest robot block + halo on both sides,
    256-aligned. ``halo = max(diags2 ∪ {1})`` — the farthest lane any
    edge incident to the block can reach. +255: the window start is
    aligned DOWN to a 256 boundary, which can consume up to 255 lanes of
    coverage on the left."""
    halo = max([1, *map(abs, kg.diags2)]) + extra
    blk = max(kg.num_poses) if kg.num_poses else kg.n
    return min(_rup(blk + 2 * halo + 255, 256), kg.n_pad)


def prepare_operands(kg, pinv_t, wrows, consts=None):
    """Row-pad every HBM-side operand once per (problem, weights); the
    returned tuple is what :func:`rtr_solve_hbm` streams windows from.
    The diagonal-class groups are REPACKED so class j sits at rows
    [j*p8(d*d), ...) — the kernel re-slices the true rows per class."""
    cs = consts if consts is not None else kg.constants()
    _idx2, cR, ct, _Rl, _tl, d2R, d2t = cs
    kwc, twc, _kwl, _twl, kwd, twd = wrows
    d = kg.d
    D = max(1, len(kg.diags2))
    g_rr, g_tr = d * d, d
    pr, pt_ = _p8(g_rr), _p8(g_tr)
    d2R = jnp.asarray(d2R, jnp.float32)
    d2t = jnp.asarray(d2t, jnp.float32)
    d2R_p = jnp.concatenate(
        [
            _pad_rows(d2R[j * g_rr:(j + 1) * g_rr]) for j in range(D)
        ],
        axis=0,
    )
    d2t_p = jnp.concatenate(
        [
            _pad_rows(d2t[j * g_tr:(j + 1) * g_tr]) for j in range(D)
        ],
        axis=0,
    )
    return (
        _pad_rows(jnp.asarray(pinv_t, jnp.float32)),
        _pad_rows(jnp.asarray(cR, jnp.float32)),
        _pad_rows(jnp.asarray(ct, jnp.float32)),
        _pad_rows(jnp.asarray(kwc, jnp.float32)),
        _pad_rows(jnp.asarray(twc, jnp.float32)),
        d2R_p,
        d2t_p,
        _pad_rows(jnp.asarray(kwd, jnp.float32)),
        _pad_rows(jnp.asarray(twd, jnp.float32)),
    )


@functools.lru_cache(maxsize=32)
def _make_hbm_kernel(
    W: int,
    n_pad: int,
    r: int,
    d: int,
    diags2: Tuple[int, ...],
    max_iterations: int,
    max_tcg_iterations: int,
    gradnorm_tol: float,
    initial_radius: float,
    max_radius: float,
    tcg_kappa: float,
    tcg_theta: float,
    interpret: bool,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = r * (d + 1)
    Cp = _p8(C)
    D = max(1, len(diags2))
    prr, ptr = _p8(d * d), _p8(d)
    # padded row counts of the streamed operands, in DMA order
    ROWS = (
        Cp,  # Xt
        _p8((d + 1) * (d + 1)),  # pinv_t
        _p8(d * d),  # chain_R
        _p8(d),  # chain_t
        1,  # kwc
        1,  # twc
        D * prr,  # diag_R (per-class padded groups)
        D * ptr,  # diag_t
        _p8(D),  # kwd
        _p8(D),  # twd
    )
    N_OPS = len(ROWS)

    def kernel(scal_ref, *refs):
        hbm = refs[:N_OPS]
        xout_ref = refs[N_OPS]
        stats_ref = refs[N_OPS + 1]
        wins = refs[N_OPS + 2 : N_OPS + 2 + N_OPS]
        sems = refs[N_OPS + 2 + N_OPS]

        off = pl.multiple_of(scal_ref[0], 256)
        blk0 = scal_ref[1]  # block start, window-local
        blkn = scal_ref[2]  # block length

        # ---- DMA every operand window in, overlapped ------------------
        dmas = []
        for i in range(N_OPS):
            dma = pltpu.make_async_copy(
                hbm[i].at[:, pl.ds(off, W)], wins[i], sems.at[i]
            )
            dma.start()
            dmas.append(dma)
        for dma in dmas:
            dma.wait()

        iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        mask = jnp.logical_and(iota >= blk0, iota < blk0 + blkn).astype(
            jnp.float32
        )
        # re-slice true rows out of the padded slabs (static read slices
        # of VMEM refs — the fused_asapp ring-buffer pattern)
        Rc = wins[2][0 : d * d, :]
        tc = wins[3][0:d, :]
        kwc = wins[4][:]
        twc = wins[5][:]
        Pt = wins[1][0 : (d + 1) * (d + 1), :]
        d2R = jnp.concatenate(
            [wins[6][j * prr : j * prr + d * d, :] for j in range(D)],
            axis=0,
        )
        d2t = jnp.concatenate(
            [wins[7][j * ptr : j * ptr + d, :] for j in range(D)],
            axis=0,
        )
        kwd = wins[8][0:D, :]
        twd = wins[9][0:D, :]

        alg = fused_rtr.make_edge_alg(
            C, r, d, W, 0, 0, 0,
            False, 0, False, False, diags2,
            Rc, tc, kwc, twc, Pt,
            None, None, None, None, None, None,
            d2R, d2t, kwd, twd,
            None, None, None,
        )
        solve = fused_rtr.make_rtr_solve(
            alg, C, r, d, W,
            max_iterations, max_tcg_iterations, gradnorm_tol,
            initial_radius, max_radius, tcg_kappa, tcg_theta,
        )
        X0 = wins[0][0:C, :]
        Xf, f0, ff, gn0, gnf, kf, ktcg = solve(X0, mask)
        Xn = X0 + (Xf - X0) * mask  # halo lanes restored exactly
        wins[0][:] = jnp.concatenate(
            [Xn, jnp.zeros((Cp - C, W), jnp.float32)], axis=0
        ) if Cp > C else Xn

        D_ = (Xn - X0) * mask
        moved = jnp.sqrt(jnp.sum(D_ * D_))
        vals = {
            0: f0, 1: ff, 2: gn0, 3: gnf,
            4: kf.astype(jnp.float32),
            5: ktcg.astype(jnp.float32),
            6: moved,
        }
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, _STATS_W), 1)
        stats = jnp.zeros((1, _STATS_W), jnp.float32)
        for pos, v in vals.items():
            stats = jnp.where(iota_s == pos, v, stats)
        stats_ref[:] = stats

        # ---- write the window back into the donated output ------------
        out = pltpu.make_async_copy(
            wins[0], xout_ref.at[:, pl.ds(off, W)], sems.at[0]
        )
        out.start()
        out.wait()

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]  # scal
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * N_OPS
    out_shape = [
        jax.ShapeDtypeStruct((Cp, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, _STATS_W), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((rows, W), jnp.float32) for rows in ROWS]
    scratch.append(pltpu.SemaphoreType.DMA((N_OPS,)))
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases={1: 0},  # Xt (input 1, after scal) → xout
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )


def rtr_solve_hbm(
    Xt: jnp.ndarray,
    robot_start: jnp.ndarray,
    robot_len: jnp.ndarray,
    pinv_t: jnp.ndarray,
    wrows,
    kg,
    params,
    *,
    W: int | None = None,
    interpret: bool = False,
    consts=None,
    prepared=None,
):
    """One masked RTR block solve with HBM-resident state.

    ``robot_start``/``robot_len`` (i32 scalars, GLOBAL lane coords) select
    the contiguous block; the slab window is positioned around it. Returns
    (Xt_new, stats) like :func:`fused_rtr.rtr_solve_fused` (stats[5] =
    tCG iterations, stats[6] = block displacement; f values are LOCAL
    restrictions). Requires ``kg.E_loop == 0``. Pass ``prepared`` from
    :func:`prepare_operands` to skip the per-call row padding of the
    static operands (the hot-path pattern).
    """
    if kg.E_loop > 0:
        raise ValueError(
            "rtr_solve_hbm supports chain+diagonal structure only "
            "(E_loop == 0); use rtr_solve_fused"
        )
    W = W or window_width(kg)
    halo = max([1, *map(abs, kg.diags2)])
    lo = jnp.maximum(robot_start - halo, 0)
    off = (lo // 256) * 256
    off = jnp.minimum(off, kg.n_pad - W).astype(jnp.int32)
    off = jnp.maximum(off, 0)
    blk0 = (robot_start - off).astype(jnp.int32)
    scal = jnp.stack(
        [off, blk0, robot_len.astype(jnp.int32), jnp.asarray(0, jnp.int32)]
    )
    if prepared is None:
        prepared = prepare_operands(kg, pinv_t, wrows, consts)
    Xt_p = _pad_rows(Xt)
    C = kg.r * (kg.d + 1)
    fk = _make_hbm_kernel(
        int(W), kg.n_pad, kg.r, kg.d, tuple(kg.diags2),
        int(params.max_iterations), int(params.max_tcg_iterations),
        float(params.gradnorm_tol), float(params.initial_radius),
        float(params.max_radius), float(params.tcg_kappa),
        float(params.tcg_theta), bool(interpret),
    )
    Xt_out, stats = fk(scal, Xt_p, *prepared)
    return Xt_out[:C], stats
