"""utils/hostmath.py must match the JAX ops it mirrors (the fleet's
host-side protocol math, round 5)."""

import jax.numpy as jnp
import numpy as np

from dpgo_ros_tpu.ops import lie, rounding, stiefel
from dpgo_ros_tpu.utils import hostmath


def _rand_T(rng, n):
    A = rng.normal(size=(n, 3, 3))
    U, _, Vt = np.linalg.svd(A)
    det = np.linalg.det(U @ Vt)
    U[:, :, -1] *= det[:, None]
    R = U @ Vt
    t = rng.normal(size=(n, 3))
    return np.concatenate([R, t[:, :, None]], axis=-1)


def test_hostmath_matches_jax_ops():
    rng = np.random.default_rng(0)
    Ta = _rand_T(rng, 17)
    Tb = _rand_T(rng, 17)
    np.testing.assert_allclose(
        hostmath.se_compose_np(Ta, Tb),
        np.asarray(lie.se_compose(jnp.asarray(Ta), jnp.asarray(Tb))),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        hostmath.se_inverse_np(Ta),
        np.asarray(lie.se_inverse(jnp.asarray(Ta))),
        rtol=1e-12,
    )
    rel = _rand_T(rng, 30)
    np.testing.assert_allclose(
        hostmath.odometry_chain_np(rel),
        np.asarray(lie.odometry_chain(jnp.asarray(rel))),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        hostmath.anchor_to_first_pose_np(Ta),
        np.asarray(rounding.anchor_to_first_pose(jnp.asarray(Ta))),
        rtol=1e-12,
    )
    Y = np.asarray(
        stiefel.random_lifting_matrix(
            __import__("jax").random.PRNGKey(0), 5, 3, jnp.float64
        )
    )
    X = hostmath.lift_trajectory_np(Ta, Y)
    np.testing.assert_allclose(
        X,
        np.asarray(stiefel.lift_trajectory(jnp.asarray(Ta), jnp.asarray(Y))),
        rtol=1e-12,
    )
    # perturb off the exact lift so the SO-projection actually projects
    Xp = X + 1e-3 * rng.normal(size=X.shape)
    np.testing.assert_allclose(
        hostmath.round_via_lifting_np(Xp, Y),
        np.asarray(
            rounding.round_via_lifting(jnp.asarray(Xp), jnp.asarray(Y))
        ),
        rtol=1e-8, atol=1e-8,
    )


def test_hostmath_gnc_mirrors_match_jax():
    """The fleet's numpy GNC math (residuals, TLS weights, round params
    for every schedule) must match models/robust.py."""
    from dpgo_ros_tpu.models import robust
    from dpgo_ros_tpu.utils.config import AgentConfig, RobustCostType

    rng = np.random.default_rng(7)
    E = 40
    r = np.abs(rng.normal(2.0, 3.0, E))
    loop_mask = (rng.uniform(size=E) < 0.7).astype(np.float64)
    for mu in (0.3, 3.0, 50.0):
        np.testing.assert_allclose(
            hostmath.gnc_tls_weights_np(r, mu, 3.0),
            np.asarray(robust.gnc_tls_weights(jnp.asarray(r), mu, 3.0)),
            rtol=1e-12,
        )
    base = dict(
        num_robots=2,
        robust_cost_type=RobustCostType.GNC_TLS,
        GNC_use_probability=False,
        GNC_barc=3.0,
        robust_opt_num_weight_updates=3,
    )
    for sched in ("adaptive", "geometric", "reference"):
        cfg = AgentConfig(**base, GNC_schedule=sched)
        for k in (0, 1, 2):
            mu_np, barc_np = hostmath.gnc_round_params_np(
                k, cfg, mu_state=1e-3, residuals=r, loop_mask=loop_mask
            )
            mu_j, barc_j = robust.gnc_round_params(
                k, cfg, jnp.asarray(1e-3),
                residuals=jnp.asarray(r),
                loop_mask=jnp.asarray(loop_mask),
            )
            np.testing.assert_allclose(mu_np, float(mu_j), rtol=1e-9)
            np.testing.assert_allclose(barc_np, float(barc_j), rtol=1e-9)
    # residuals against a random trajectory
    n = 15
    T = np.concatenate(
        [np.tile(np.eye(3), (n, 1, 1)), rng.normal(size=(n, 3, 1))], axis=-1
    )
    src = rng.integers(0, n, E).astype(np.int32)
    dst = ((src + 1 + rng.integers(0, n - 1, E)) % n).astype(np.int32)
    R = np.tile(np.eye(3), (E, 1, 1))
    t = rng.normal(size=(E, 3))
    kap = np.abs(rng.normal(5, 1, E))
    tau = np.abs(rng.normal(2, 1, E))
    from dpgo_ros_tpu.ops.quadratic import EdgeSet

    e = EdgeSet(
        src=jnp.asarray(src), dst=jnp.asarray(dst),
        R=jnp.asarray(R), t=jnp.asarray(t),
        kappa=jnp.asarray(kap), tau=jnp.asarray(tau),
        weight=jnp.ones(E), mask=jnp.ones(E), is_loop=jnp.ones(E),
    )
    np.testing.assert_allclose(
        hostmath.measurement_residuals_np(T, src, dst, R, t, kap, tau),
        np.asarray(robust.measurement_residuals(jnp.asarray(T), e)),
        rtol=1e-9,
    )
