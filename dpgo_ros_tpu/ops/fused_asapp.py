"""Single-Pallas-kernel ASAPP tick (VERDICT r2 #8).

The XLA ASAPP tick (`parallel/asapp.py::_tick_impl`) vmaps R full-state RGD
steps — R × steps_per_tick gradient passes, each lowering to multiple XLA
fusions that pay this runtime's dispatch/fusion floor, exactly the cost the
fused RTR path escaped. This kernel runs the ENTIRE tick — per-robot stale
view assembly, preconditioned Riemannian gradient steps, Newton–Schulz
retraction, per-robot movement stats — as ONE Mosaic kernel in the same
transposed (C, n_pad) layout, sharing the edge-pass/manifold row algebra
with the RTR kernel (:func:`dpgo_ros_tpu.ops.fused_rtr.make_edge_alg`).

Bounded-staleness semantics preserved bit-for-bit at the algorithm level:
the (K+1)-deep ring buffer rides as a ((K+1)·Cp, n_pad) stack (Cp = C
rounded up to the 8-sublane tile); the per-robot delay slot is selected by
an unrolled compare-select over the K+1 static slices (portable — no
dynamic sublane slicing), matching ``st.hist[delay % (K+1)]``. Delays and
the (possibly decayed) stepsize are computed by the caller (same PRNG
stream as the XLA path) and ride in SMEM.

Reference capability: ``runOnceAsynchronous`` (``src/PGOAgentROS.cpp:
119-127``), RGD pick ``src/PGOAgentROSNode.cpp:87-93``, 100 Hz loop
``launch/asapp_demo.launch``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.ops.fused_rtr import (
    CHUNK,
    _S_MOVED,
    _STATS_W,
    KernelGraph,
    make_edge_alg,
)


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def hist_to_t(hist: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """(K+1, n, r, d+1) ring buffer → ((K+1)·Cp, n_pad) row stack."""
    Kp1, n, r, dp1 = hist.shape
    C = r * dp1
    Cp = _rup(C, 8)
    Ht = jnp.transpose(hist, (0, 3, 2, 1)).reshape(Kp1 * C, n)
    Ht = jnp.pad(Ht, ((0, 0), (0, n_pad - n)))
    if Cp != C:
        Ht = Ht.reshape(Kp1, C, n_pad)
        Ht = jnp.pad(Ht, ((0, 0), (0, Cp - C), (0, 0)))
        Ht = Ht.reshape(Kp1 * Cp, n_pad)
    return Ht


def hist_from_t(Ht: jnp.ndarray, Kp1: int, n: int, r: int, dp1: int) -> jnp.ndarray:
    C = r * dp1
    Cp = _rup(C, 8)
    H = Ht.reshape(Kp1, Cp, -1)[:, :C, :n].reshape(Kp1, dp1, r, n)
    return jnp.transpose(H, (0, 3, 2, 1))


@functools.lru_cache(maxsize=16)
def _make_asapp_kernel(
    n_pad: int,
    E_loop_pad: int,
    r: int,
    d: int,
    num_robots: int,
    Kp1: int,
    steps_per_tick: int,
    use_precond: bool,
    interpret: bool,
    windowed: bool,
    win_w: int,
    diags2: Tuple[int, ...],
    has_loops: bool,
    offsets: Tuple[int, ...] = (),
    num_poses: Tuple[int, ...] = (),
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = r * (d + 1)
    Cp = _rup(C, 8)
    R = num_robots
    n_chunks_l = E_loop_pad // CHUNK
    tail_l = E_loop_pad - n_chunks_l * CHUNK
    windowed = windowed and has_loops

    def kernel(
        x_ref, hist_ref, masks_ref, pinv_ref, kwc_ref, twc_ref,
        kwl_ref, twl_ref, idx2_ref, Rc_ref, tc_ref, Rl_ref, tl_ref,
        d2R_ref, d2t_ref, kwd_ref, twd_ref, delays_ref, gamma_ref,
        *rest,
    ):
        if windowed:
            (wins_ref, xout_ref, stats_ref, acc_ref, zfull_ref,
             gfull_ref, thl_ref) = rest
        else:
            xout_ref, stats_ref, acc_ref, zfull_ref, gfull_ref = rest
            wins_ref = thl_ref = None

        alg = make_edge_alg(
            C, r, d, n_pad, E_loop_pad, n_chunks_l, tail_l,
            windowed, win_w, False, has_loops, diags2,
            Rc_ref[:], tc_ref[:], kwc_ref[:], twc_ref[:], pinv_ref[:],
            idx2_ref, None,
            Rl_ref, tl_ref, kwl_ref, twl_ref,
            d2R_ref, d2t_ref, kwd_ref, twd_ref,
            wins_ref, thl_ref, acc_ref,
        )

        X = x_ref[:]
        gamma = gamma_ref[0, 0]
        Xnew = X
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, _STATS_W), 1)
        stats = jnp.zeros((1, _STATS_W), jnp.float32)

        for k in range(R):  # static unroll over robots
            mrow = masks_ref[k:k + 1, :]  # (1, n_pad)
            delay = delays_ref[0, k]  # slot index, caller-reduced mod K+1
            # unrolled compare-select over the K+1 static ring slices
            stale = hist_ref[0 * Cp:0 * Cp + C, :]
            for j in range(1, Kp1):
                stale = jnp.where(
                    delay == j, hist_ref[j * Cp:j * Cp + C, :], stale
                )
            Z = X * mrow + stale * (1.0 - mrow)
            # static 256-aligned lane window covering robot k's block
            # (round 4): the per-lane math (projection, preconditioning,
            # retraction) only matters on the updating robot's own lanes
            # — the full gradient still couples all lanes, but the
            # manifold algebra shrinks from (C, n_pad) to (C, w_k).
            # Per-lane ops are column-independent, so the kept lanes are
            # bit-identical to the full-width computation.
            if offsets and num_poses:
                o, nk = offsets[k], num_poses[k]
                o0 = (o // 256) * 256
                w = min(-(-(o + nk - o0) // 256) * 256, n_pad - o0)
            else:
                o0, w = 0, n_pad
            # lane slices of COMPUTED values are rejected by Mosaic
            # ("Invalid input layout"); stage Z and G through VMEM
            # scratch refs — static aligned REF slices are supported
            mb = masks_ref[k:k + 1, o0:o0 + w]
            Ptb = pinv_ref[:, o0:o0 + w]
            for _ in range(steps_per_tick):  # static unroll (rate/100)
                G, _f = alg.egrad_and_cost(Z, with_f=False)
                zfull_ref[:] = Z
                gfull_ref[:] = G
                Zb = zfull_ref[:, o0:o0 + w]
                gb = mb * alg.proj(Zb, gfull_ref[:, o0:o0 + w])
                if use_precond:
                    gb = mb * alg.proj(Zb, alg.precond_with(gb, Ptb))
                Zb2 = alg.retract(Zb, -gamma * gb)
                Zb2 = Zb2 * mb + Zb * (1.0 - mb)
                if o0 == 0 and w == n_pad:
                    Z = Zb2
                else:
                    parts = []
                    if o0 > 0:
                        parts.append(zfull_ref[:, :o0])
                    parts.append(Zb2)
                    if o0 + w < n_pad:
                        parts.append(zfull_ref[:, o0 + w:])
                    Z = jnp.concatenate(parts, axis=1)
            Xnew = Xnew * (1.0 - mrow) + Z * mrow
            zfull_ref[:] = Z
            gfull_ref[:] = X
            Dk = (
                zfull_ref[:, o0:o0 + w] - gfull_ref[:, o0:o0 + w]
            ) * mb
            stats = jnp.where(
                iota_s == (_S_MOVED + k),
                jnp.sqrt(jnp.sum(Dk * Dk)),
                stats,
            )

        xout_ref[:] = Xnew
        stats_ref[:] = stats

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 17 + [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # delays (1, R) i32
        pl.BlockSpec(memory_space=pltpu.SMEM),  # gamma (1, 1) f32
    ]
    scratch = [
        pltpu.VMEM((2 * C, n_pad), jnp.float32),
        pltpu.VMEM((C, n_pad), jnp.float32),  # Z staging (lane slices)
        pltpu.VMEM((C, n_pad), jnp.float32),  # G staging
    ]
    if windowed:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # wins
        scratch.append(pltpu.VMEM((2 * C, n_pad), jnp.bfloat16))
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )


def asapp_tick_fused(
    Xt: jnp.ndarray,
    hist_t: jnp.ndarray,
    mask_rows: jnp.ndarray,
    pinv_t: jnp.ndarray,
    wrows,
    delays_row: jnp.ndarray,
    gamma: jnp.ndarray,
    kg: KernelGraph,
    Kp1: int,
    steps_per_tick: int,
    use_precond: bool,
    interpret: bool = False,
    consts=None,
    wins: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full ASAPP tick as a single Pallas kernel.

    Args: transposed state (C, n_pad), transposed ring buffer
    ((K+1)·Cp, n_pad), (R, n_pad) mask rows, transposed block-Jacobi
    inverse, per-lane weight rows, (1, R) int32 delay slots, scalar γ.
    Returns (Xt_new, stats) with per-robot movement at stats[0, 8:8+R].
    """
    from dpgo_ros_tpu.ops import fused_rtr

    fk = _make_asapp_kernel(
        kg.n_pad, kg.E_loop_pad, kg.r, kg.d, kg.num_robots,
        Kp1, steps_per_tick, use_precond, interpret,
        kg.loop_win_off is not None, int(kg.loop_win_w),
        tuple(kg.diags2), kg.E_loop > 0,
        tuple(int(o) for o in kg.offsets),
        tuple(int(x) for x in kg.num_poses),
    )
    cs = consts if consts is not None else kg.constants()
    idx2, Rc, tc, Rl, tl, d2R, d2t = cs
    kwc, twc, kwl, twl, kwd, twd = wrows
    garr = jnp.asarray(gamma, jnp.float32).reshape(1, 1)
    args = [
        Xt, hist_t, mask_rows, pinv_t, kwc, twc, kwl, twl, idx2,
        Rc, tc, Rl, tl, d2R, d2t, kwd, twd,
        delays_row, garr,
    ]
    if kg.loop_win_off is not None and kg.E_loop > 0:
        if wins is None:
            wins = jnp.asarray(fused_rtr.wins_row(kg))
        args.append(wins)
    return fk(*args)
