"""Micro-benchmarks of the hot ops on the current backend (TPU by default)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("EXP_PLATFORM") == "cpu":
    from dpgo_ros_tpu.utils.hostenv import ensure_cpu_devices
    ensure_cpu_devices(8)
import jax, jax.numpy as jnp, numpy as np
plat = jax.default_backend()
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{'cpu' if plat=='cpu' else 'tpu'}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.models.local_solvers import RTRParams, rtr_solve
from dpgo_ros_tpu.ops import quadratic, stiefel

data = load_g2o_dataset("sphere2500", num_robots=5)
prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
e = prob.edges
n = prob.n
key = jax.random.PRNGKey(0)
Y = stiefel.random_stiefel(key, n, 5, 3, jnp.float32)
p = jax.random.normal(key, (n, 5), jnp.float32)
X = stiefel.join(Y, p)
V = jax.random.normal(key, X.shape, jnp.float32) * 0.01
mask = prob.block_mask(0, jnp.float32)

def timeit(name, fn, *args, iters=50):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e6:10.1f} us", flush=True)
    return dt

import dataclasses
e_scat = dataclasses.replace(e, pull=None)
timeit("egrad (pull)", lambda X: quadratic.egrad(X, e), X)
timeit("egrad (scatter)", lambda X: quadratic.egrad(X, e_scat), X)
timeit("cost", lambda X: quadratic.cost(X, e), X)
P = jax.jit(lambda: quadratic.precond_blocks(e, n))()
timeit("precond_blocks (pull)", lambda: quadratic.precond_blocks(e, n))
timeit("precond_inverse", lambda P: quadratic.precond_inverse(P), P)
Pinv = jax.jit(quadratic.precond_inverse)(P)
timeit("precond_solve (chol per call)", lambda P, V: quadratic.precond_solve(P, V), P, V)
timeit("precond_apply (einsum)", lambda Pi, V: quadratic.precond_apply(Pi, V), Pinv, V)
timeit("retract_polar (eigh)", lambda X, V: stiefel.retract_polar(X, V), X, V)
timeit("retract_polar_ns", lambda X, V: stiefel.retract_polar_ns(X, V), X, V)
timeit("proj_tangent", lambda X, V: stiefel.proj_tangent(X, V), X, V)
rtr = RTRParams(max_iterations=3, max_tcg_iterations=50, gradnorm_tol=0.5)
timeit("rtr block update (current)", lambda X: rtr_solve(X, e, mask, Pinv, rtr)[0], X, iters=10)
# accuracy check NS vs eigh
a = stiefel.retract_polar(X, V); b = stiefel.retract_polar_ns(X, V)
print("NS vs eigh max diff:", float(jnp.max(jnp.abs(a-b))), " on-manifold:", float(stiefel.check_on_manifold(b)))

# --- true per-op costs inside fused loops (no dispatch overhead) ---------
def fused_loop(name, op, init, iters=200):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: op(v), x)
    out = run(init); jax.block_until_ready(out)
    t0 = time.time()
    out = run(init); jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"fused {name:28s} {dt*1e6:10.1f} us/op", flush=True)

fused_loop("egrad", lambda X: quadratic.egrad(X, e) * 1e-9 + X, X)
fused_loop("rhess_vp", lambda V: quadratic.rhess_vp(X, V, e) * 1e-9 + V, V)
fused_loop("proj_tangent", lambda V: stiefel.proj_tangent(X, V) * 1e-9 + V, V)
fused_loop("retract_ns", lambda Xc: stiefel.retract_polar_ns(Xc, V * 1e-6), X)
fused_loop("precond_apply", lambda V: quadratic.precond_apply(Pinv, V) * 1e-9 + V, V)

for ti, tcg in [(1, 10), (1, 50), (3, 50)]:
    pr = RTRParams(max_iterations=ti, max_tcg_iterations=tcg, gradnorm_tol=0.5)
    timeit(f"rtr ti={ti} tcg={tcg}", lambda X: rtr_solve(X, e, mask, Pinv, pr)[0], X, iters=10)
