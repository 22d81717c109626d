"""Measured ATTAINABLE VPU rate for the roofline (round 4, verdict r3 #3).

Naive calibration kernels on this tunneled toolchain fold: affine
recurrences, fixed-point-converging chains, and value-identical parallel
chains all measure physically-impossible "peaks" (430-1700 TF/s observed
this round). The one variant that verifiably EXECUTES is a logistic-map
chain (x ← 3.9·x·(1−x): chaotic, no closed form, no fixed point) over
distinct random slabs, with the output checksum READ BACK once per
program before timing and the rate taken from the SLOPE between two trip
counts (fixed dispatch/sync costs cancel; linearity across three trip
counts is asserted).

Measured on this v5e: ~1.1 TF/s fp32 for interleaved elementwise
mul/sub/mul chains at the fused kernel's characteristic slab shapes —
an order of magnitude below the 12.3 TF/s spec-derived nominal (which
assumed 4 dual-issue ALUs), and almost exactly the fused RTR kernel's
observed effective rate (ROOFLINE.json sphere2500: 4.12 MFLOP/tCG-iter /
3.79 µs = 1.09 TF/s). The kernel runs at ~the attainable elementwise
rate; the nominal-peak "8.8% of ideal" framing of round 3 measured the
gap between the spec sheet and the hardware, not kernel headroom.

Emits one JSON line; imported by scripts/roofline.py.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NCHAIN = 8
ROWS = 256
LANES = 512
ITERS = (500, 2000, 10000)


def _chain(n_iter):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        xs = [
            x_ref[i * ROWS:(i + 1) * ROWS, :] for i in range(NCHAIN)
        ]

        def body(_, xs):
            return [3.9 * x * (1.0 - x) for x in xs]

        xs = jax.lax.fori_loop(0, n_iter, body, xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20
        ),
    )


def measure_vpu_attainable():
    x = jnp.asarray(
        np.random.default_rng(7).uniform(
            0.2, 0.8, (NCHAIN * ROWS, LANES)
        ),
        jnp.float32,
    )
    times = {}
    sums = {}
    for it in ITERS:
        f = _chain(it)
        out = f(x)
        jax.block_until_ready(out)
        # checksum read-back: forces materialization (folded variants
        # were observed without it) and pins per-iteration dependence
        sums[it] = float(jnp.sum(out))
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = f(x)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        times[it] = min(ts)
    s1 = (times[ITERS[1]] - times[ITERS[0]]) / (ITERS[1] - ITERS[0])
    s2 = (times[ITERS[2]] - times[ITERS[1]]) / (ITERS[2] - ITERS[1])
    flops_per_iter = 3 * NCHAIN * ROWS * LANES
    valid = (
        s1 > 0
        and s2 > 0
        and 0.5 < s1 / s2 < 2.0
        and len(set(round(v, 4) for v in sums.values())) > 1
    )
    return {
        "vpu_attainable_flops": flops_per_iter / s2 if valid else None,
        "slope_us_per_iter": [s1 * 1e6, s2 * 1e6],
        "times_ms": {str(k): v * 1e3 for k, v in times.items()},
        "checksums": sums,
        "valid": valid,
        "method": "logistic-map chains, 8x(256,512) fp32 slabs, "
                  "slope over trip counts",
    }


def _chain_cml(n_iter):
    """Second independent witness (VERDICT r4 #4): a coupled-map-lattice
    chain with a DIFFERENT op mix (mul/add cross-chain coupling + a
    floor-based bound) — 6 fp32 ops per element per iteration. Coupling
    across chains + the floor nonlinearity leave no closed form to fold;
    values stay in [0, 4)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        xs = [
            x_ref[i * ROWS:(i + 1) * ROWS, :] for i in range(NCHAIN)
        ]

        def body(_, xs):
            new = []
            for i in range(NCHAIN):
                v = xs[i] * 0.99 + xs[(i + 1) % NCHAIN] * 0.51
                new.append(v - jnp.floor(v * 0.25) * 4.0)
            return new

        xs = jax.lax.fori_loop(0, n_iter, body, xs)
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20
        ),
    )


def measure_vpu_cml():
    """Coupled-map-lattice witness; same slope-over-trip-counts method,
    6 FLOPs/elem/iter (mul, mul, add, mul, floor, fused sub-mul counted
    as 2)."""
    x = jnp.asarray(
        np.random.default_rng(11).uniform(
            0.1, 3.9, (NCHAIN * ROWS, LANES)
        ),
        jnp.float32,
    )
    times = {}
    sums = {}
    for it in ITERS:
        f = _chain_cml(it)
        out = f(x)
        jax.block_until_ready(out)
        sums[it] = float(jnp.sum(out))
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = f(x)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        times[it] = min(ts)
    s1 = (times[ITERS[1]] - times[ITERS[0]]) / (ITERS[1] - ITERS[0])
    s2 = (times[ITERS[2]] - times[ITERS[1]]) / (ITERS[2] - ITERS[1])
    flops_per_iter = 6 * NCHAIN * ROWS * LANES
    valid = (
        s1 > 0
        and s2 > 0
        and 0.5 < s1 / s2 < 2.0
        and len(set(round(v, 4) for v in sums.values())) > 1
    )
    return {
        "vpu_attainable_flops": flops_per_iter / s2 if valid else None,
        "slope_us_per_iter": [s1 * 1e6, s2 * 1e6],
        "times_ms": {str(k): v * 1e3 for k, v in times.items()},
        "checksums": sums,
        "valid": valid,
        "method": "coupled-map-lattice chains (cross-chain mul/add + "
                  "floor bound), 8x(256,512) fp32 slabs, slope over "
                  "trip counts",
    }


def main():
    r = measure_vpu_attainable()
    if r["valid"]:
        print(
            f"VPU attainable: {r['vpu_attainable_flops']/1e12:.2f} TF/s "
            f"(slopes {r['slope_us_per_iter'][0]:.2f}/"
            f"{r['slope_us_per_iter'][1]:.2f} us/iter)",
            file=sys.stderr,
        )
    else:
        print("VPU calibration INVALID (chain folded or nonlinear "
              "timing)", file=sys.stderr)
    print(json.dumps(r))
    return r


if __name__ == "__main__":
    main()
