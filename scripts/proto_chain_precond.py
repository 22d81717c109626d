"""Prototype: block-tridiagonal (odometry-chain) preconditioner vs the
shipped damped block-Jacobi — tCG iteration counts on sphere2500 block
solves (the documented 'parallel cyclic reduction' headroom item).

Runs the same Steihaug-tCG inner loop (kappa=0.1, theta=1.0) from the
chordal-init state for each robot block and counts CG iterations to the
residual target under each M. Numpy CG; Q/rhess applications via the
repo's JAX ops on CPU.
"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from dpgo_ros_tpu.io.datasets import load_g2o_dataset
from dpgo_ros_tpu.models.problem import LiftedProblem
from dpgo_ros_tpu.parallel.rbcd import RBCDEngine
from dpgo_ros_tpu.utils.config import AgentConfig, InitMethod, UpdateRule
from dpgo_ros_tpu.ops import quadratic, stiefel

data = load_g2o_dataset("sphere2500", num_robots=5)
prob = LiftedProblem.from_data(data, r=5, dtype=jnp.float32)
cfg = AgentConfig(num_robots=5, update_rule=UpdateRule.PARALLEL,
                  local_initialization_method=InitMethod.CHORDAL,
                  relative_change_tolerance=0.0, max_iteration_number=100,
                  RTR_iterations=3, RTR_tCG_iterations=200,
                  RTR_gradnorm_tol=0.5, dtype="float32")
eng = RBCDEngine(prob, cfg)
st = eng.initialize()
X = np.asarray(st.X, np.float64)  # (n, r, d+1)
e = prob.edges
n, r, dp1 = X.shape
d = dp1 - 1

src = np.asarray(e.src); dst = np.asarray(e.dst)
R = np.asarray(e.R, np.float64); t = np.asarray(e.t, np.float64)
kap = np.asarray(e.kappa, np.float64); tau = np.asarray(e.tau, np.float64)
msk = np.asarray(e.mask, np.float64)
w = np.asarray(st.weights, np.float64) if st.weights is not None else np.ones_like(kap)
kw = kap * w * msk; tw = tau * w * msk

# ---- dense-block assembly of Q's diagonal and chain off-diagonal blocks --
Dii = np.zeros((n, dp1, dp1))
Bio = {}  # (i, i+1) -> (d+1, d+1) off-diagonal block (i rows, i+1 cols)
for k in range(len(src)):
    if msk[k] == 0: continue
    i, j = int(src[k]), int(dst[k])
    a = np.concatenate([t[k], [1.0]])          # u_i coefficient of tau residual
    Qii = np.zeros((dp1, dp1)); Qjj = np.zeros((dp1, dp1)); Qij = np.zeros((dp1, dp1))
    Qii[:d, :d] += kw[k] * np.eye(d); Qii += tw[k] * np.outer(a, a)
    Qjj[:d, :d] += kw[k] * np.eye(d); Qjj[d, d] += tw[k]
    Qij[:d, :d] -= kw[k] * R[k]                 # -kappa S_Y R S_Y^T
    Qij[:, d] -= tw[k] * a                      # -tau a s_p^T
    Dii[i] += Qii; Dii[j] += Qjj
    if j == i + 1:
        Bio[i] = Bio.get(i, np.zeros((dp1, dp1))) + Qij

# sanity: diagonal blocks match precond_blocks (undamped)
Pj = np.asarray(quadratic.precond_blocks(e.with_weights(st.weights) if hasattr(e, "with_weights") else e, n, damping=0.0), np.float64) if w.min() == 1.0 else None
if Pj is not None:
    err = np.abs(Pj - Dii).max() / max(1.0, np.abs(Dii).max())
    print(f"diag-block parity vs precond_blocks: rel err {err:.2e}")

damping = 1e-2
scale = np.maximum(np.trace(Dii, axis1=-2, axis2=-1)[:, None, None] / dp1, 1.0)
Ddamp = Dii + damping * scale * np.eye(dp1)

robot_of = np.asarray(prob.robot_of_pose)

Dinv = np.linalg.inv(Ddamp)  # hoisted: constant across CG iterations

def jac_solve(V):          # V (n, r, dp1) row conv: V_i <- V_i Ddamp_i^{-1}
    return np.einsum("nab,nbc->nac", V, Dinv)

# block-Thomas factor/solve per robot block (chain = consecutive poses)
def make_tri_solver(idx):
    """idx: sorted pose indices of one robot block (contiguous)."""
    m = len(idx)
    A = Ddamp[idx]                                   # (m, dp1, dp1)
    B = np.stack([Bio.get(int(idx[q]), np.zeros((dp1, dp1))) for q in range(m - 1)])
    # factor: forward elimination (Thomas), symmetric M: lower = B^T
    Ainv = np.zeros_like(A); Amod = A.copy()
    for q in range(m):
        if q > 0:
            Amod[q] = A[q] - B[q-1].T @ Ainv[q-1] @ B[q-1]
        Ainv[q] = np.linalg.inv(Amod[q])
    def solve(Vb):                                    # (m, r, dp1) rows
        # row convention: z M = v  =>  M z^T = v^T (M symmetric)
        Y = np.swapaxes(Vb, 1, 2).copy()              # (m, dp1, r)
        for q in range(1, m):
            Y[q] -= B[q-1].T @ (Ainv[q-1] @ Y[q-1])
        Z = np.zeros_like(Y)
        Z[m-1] = Ainv[m-1] @ Y[m-1]
        for q in range(m - 2, -1, -1):
            Z[q] = Ainv[q] @ (Y[q] - B[q] @ Z[q+1])
        return np.swapaxes(Z, 1, 2)
    return solve

Xj = jnp.asarray(X, jnp.float32)
ej = e

def rhess(V, mask):
    return np.asarray(quadratic.rhess_vp(Xj, jnp.asarray(V, jnp.float32), ej), np.float64) * mask

def proj(V, mask):
    return np.asarray(stiefel.proj_tangent(Xj, jnp.asarray(V, jnp.float32)), np.float64) * mask

G = np.asarray(quadratic.rgrad(Xj, ej), np.float64)

def run_cg(mask, Msolve, kappa=0.1, maxit=400):
    g = G * mask
    r0 = g
    z0 = proj(Msolve(r0), mask)
    rz = (r0 * z0).sum()
    r0n = np.sqrt((r0 * r0).sum())
    target = r0n * min(kappa, r0n)
    rr = r0; z = z0; p = -z0
    eta = np.zeros_like(g)
    for k in range(maxit):
        Hp = rhess(p, mask)
        pHp = (p * Hp).sum()
        if pHp <= 0: return k + 1, "negcurv"
        alpha = rz / pHp
        eta = eta + alpha * p
        rr = rr + alpha * Hp
        if np.sqrt((rr * rr).sum()) <= target:
            return k + 1, "converged"
        z = proj(Msolve(rr), mask)
        rz_new = (rr * z).sum()
        beta = rz_new / rz; rz = rz_new
        p = -z + beta * p
    return maxit, "budget"

masks = np.asarray(eng._masks, np.float64)  # (R, n, 1, 1)
for rb in range(5):
    mb = masks[rb].reshape(n, 1, 1)
    idx = np.where(robot_of == rb)[0]
    tri = make_tri_solver(idx)
    def tri_solve(V, idx=idx, tri=tri):
        out = np.zeros_like(V)
        out[idx] = tri(V[idx])
        return out
    kj, sj = run_cg(mb, jac_solve)
    kt, stt = run_cg(mb, tri_solve)
    print(f"robot {rb}: jacobi {kj} ({sj})  tridiag {kt} ({stt})  ratio {kj/max(kt,1):.2f}x")
