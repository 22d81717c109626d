"""Dev experiment: first end-to-end solves (SURVEY.md §7 step 3-4)."""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("EXP_PLATFORM", "cpu") == "cpu":
    from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices

    ensure_cpu_devices(8)

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule
from dpgo_ros_tpu.ops import quadratic, rounding


def solve(name, num_robots, rule, accel=False, init=InitMethod.ODOMETRY,
          tol=0.1, max_iters=300, r=5):
    data = load_g2o_dataset(name, num_robots=num_robots)
    prob = LiftedProblem.from_data(data, r=r)
    cfg = AgentConfig(
        num_robots=num_robots,
        relaxation_rank=r,
        update_rule=rule,
        acceleration=accel,
        local_initialization_method=init,
        relative_change_tolerance=tol,
        max_iteration_number=max_iters,
        RTR_gradnorm_tol=0.5,
    )
    eng = RBCDEngine(prob, cfg)
    t0 = time.time()
    st = eng.initialize()
    print(f"[{name} x{num_robots} {rule.value} accel={accel}] init cost "
          f"{float(st.cost):.4e}  (init {time.time()-t0:.1f}s)")
    st, info = eng.run(st)
    T, st = eng.finalize(st)
    g = quadratic.rgrad(st.X, eng._edges(st.weights))
    print(f"  iters={info['iterations']} final={info['final_cost']:.6e} "
          f"converged={info['converged']} gradnorm={float(np.linalg.norm(np.asarray(g))):.3e} "
          f"time={info['total_time_sec']:.1f}s "
          f"med_iter={np.median(info['history']['iter_time_sec'])*1e3:.1f}ms")
    return info


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    if which == "tiny":
        solve("tinyGrid3D", 1, UpdateRule.ROUND_ROBIN, tol=1e-2, max_iters=50)
        solve("tinyGrid3D", 2, UpdateRule.ROUND_ROBIN, tol=1e-2, max_iters=100)
    elif which == "small":
        solve("smallGrid3D", 1, UpdateRule.ROUND_ROBIN, tol=1e-2, max_iters=100)
        solve("smallGrid3D", 2, UpdateRule.ROUND_ROBIN, tol=1e-2, max_iters=100)
        solve("smallGrid3D", 2, UpdateRule.PARALLEL, tol=1e-2, max_iters=100)
    elif which == "sphere":
        solve("sphere2500", 5, UpdateRule.ROUND_ROBIN,
              init=InitMethod.CHORDAL, tol=0.2, max_iters=1000)
    elif which == "sphere_accel":
        solve("sphere2500", 5, UpdateRule.ROUND_ROBIN, accel=True,
              init=InitMethod.CHORDAL, tol=0.2, max_iters=1000)
