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
