"""Dev experiment: SPMD colored-parallel RBCD on a virtual 8-device CPU mesh."""

import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices

ensure_cpu_devices(8)

import jax
import numpy as np
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.ops import quadratic, rounding
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.parallel.spmd import ShardedProblem, build_spmd_step, gather_trajectory
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule

M = 8
data = load_g2o_dataset("smallGrid3D", num_robots=M)
prob = LiftedProblem.from_data(data, r=5, )
cfg = AgentConfig(
    num_robots=M,
    update_rule=UpdateRule.PARALLEL,
    local_initialization_method=InitMethod.ODOMETRY,
    relative_change_tolerance=1e-2,
    RTR_gradnorm_tol=0.5,
    dtype="float32",
)
eng = RBCDEngine(prob, cfg)
st0 = eng.initialize()
X0 = np.asarray(st0.X, np.float32)
print("colors:", eng.robot_colors, "num_colors:", eng.num_colors)

sp = ShardedProblem.build(prob, X0, eng.robot_colors, num_devices=M)
mesh = Mesh(np.array(jax.devices()[:M]), ("robots",))
init, step = build_spmd_step(sp, mesh, cfg)

e_full = eng._edges(st0.weights)
print("init cost:", float(quadratic.cost(st0.X, e_full)))

st = init
t0 = time.time()
for it in range(60):
    st = step(np.int32(it), np.int32(0), st)
    st.X.block_until_ready()
print(f"60 iters in {time.time()-t0:.1f}s")
Xg = gather_trajectory(sp, st, prob.num_poses)
import jax.numpy as jnp

print("final cost:", float(quadratic.cost(jnp.asarray(Xg, jnp.float64), e_full)))
print("rel_change per robot:", np.asarray(st.rel_change).ravel())
