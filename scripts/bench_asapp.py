"""ASAPP tick throughput on TPU: XLA vmap tick vs single-Pallas-kernel tick
(VERDICT r2 #8 — done = measured ticks/s, ≥5× the XLA path).

Config = the reference async demo scale (5-robot sphere2500, RGD stepsize
0.2, preconditioner, 100 Hz local loop ⇒ 1 step/tick, K = 3 staleness,
``launch/asapp_demo.launch``). Timing = R-sweep slope of tick counts inside
ONE fused while_loop dispatch (the tunnel's per-dispatch wall floor
cancels). Appends the rows to ``baseline_results.json`` under
``asapp_tick_throughput``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.parallel.asapp import ASAPPEngine
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod


def log(m):
    print(f"# {m}", file=sys.stderr, flush=True)


def measure(use_fused: bool, ticks=(200, 1200)):
    data = load_g2o_dataset("sphere2500", num_robots=5)
    prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
    cfg = AgentConfig(
        num_robots=5, asynchronous=True, RGD_stepsize=0.2,
        max_delayed_iterations=3, asynchronous_rate=100.0,
        local_initialization_method=InitMethod.ODOMETRY,
        dtype="float32", use_fused_kernel=use_fused,
    )
    st0 = RBCDEngine(prob, cfg).initialize()
    eng = ASAPPEngine(prob, cfg)
    assert eng._use_fused == use_fused
    runner = eng.make_fused_run()

    def timed(n):
        st = eng.init_state(st0.X)
        out = runner(st, jnp.asarray(n, jnp.int32))
        jax.block_until_ready(out.X)
        ts = []
        for _ in range(3):
            st = eng.init_state(st0.X)
            t0 = time.time()
            out = runner(st, jnp.asarray(n, jnp.int32))
            jax.block_until_ready(out.X)
            ts.append(time.time() - t0)
        return min(ts), out

    n1, n2 = ticks
    t1, _ = timed(n1)
    t2, out = timed(n2)
    per_tick = (t2 - t1) / (n2 - n1)
    from dpgo_ros_tpu.ops import quadratic
    cost = float(quadratic.cost(out.X, prob.edges))
    return per_tick, cost


def main():
    log(f"backend={jax.default_backend()}")
    rows = {}
    for fused in (False, True):
        per_tick, cost = measure(fused)
        name = "fused_kernel" if fused else "xla_vmap"
        rows[name] = {
            "per_tick_sec": per_tick,
            "ticks_per_sec": 1.0 / per_tick,
            "final_cost_3200_ticks": cost,
        }
        log(f"{name}: {per_tick*1e6:.1f} us/tick = "
            f"{1.0/per_tick:.1f} ticks/s (cost {cost:.1f})")
    rows["speedup"] = (
        rows["xla_vmap"]["per_tick_sec"]
        / rows["fused_kernel"]["per_tick_sec"]
    )
    log(f"speedup: {rows['speedup']:.2f}x")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline_results.json",
    )
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results["asapp_tick_throughput_sphere2500_5robot"] = {
        "config": "RGD 0.2 + precond, K=3, 1 step/tick (100 Hz), fp32 TPU",
        **rows,
    }
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results["asapp_tick_throughput_sphere2500_5robot"]))


if __name__ == "__main__":
    main()
