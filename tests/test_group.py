"""Group axiom, action and lift tests.

Mirrors the reference suites ``test_VIOGroup.cpp``, ``test_VIOGroupActions.cpp``
and ``test_VIOLift.cpp``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu import group as G
from eqvio_tpu import states as S
from eqvio_tpu.camera import default_test_camera

from .utils import (
    group_distance,
    random_group,
    random_imu,
    reasonable_group,
    reasonable_state,
    state_distance,
)

N = 5
REPS = 10


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_group_axioms(rng):
    """Inverse, associativity, identity (test_VIOGroup.cpp:26-59)."""
    for _ in range(REPS):
        X = random_group(rng, N)
        Y = random_group(rng, N)
        Z = random_group(rng, N)
        I = G.group_identity(N)
        assert group_distance(G.group_mul(X, G.group_inv(X)), I) < 1e-9
        assert group_distance(G.group_mul(G.group_inv(X), X), I) < 1e-9
        assert (
            group_distance(
                G.group_mul(G.group_mul(X, Y), Z), G.group_mul(X, G.group_mul(Y, Z))
            )
            < 1e-8
        )
        assert group_distance(G.group_mul(X, I), X) < 1e-9
        assert group_distance(G.group_mul(I, X), X) < 1e-9


def test_state_action_compatibility(rng):
    """phi(XY, xi) = phi(Y, phi(X, xi)) and identity (test_VIOGroupActions.cpp:28-60)."""
    for _ in range(REPS):
        xi = reasonable_state(rng, N)
        X = random_group(rng, N)
        Y = random_group(rng, N)
        assert state_distance(G.state_action(G.group_identity(N), xi), xi) < 1e-9
        lhs = G.state_action(G.group_mul(X, Y), xi)
        rhs = G.state_action(Y, G.state_action(X, xi))
        assert state_distance(lhs, rhs) < 1e-7


def test_output_action_equivariance(rng):
    """h(phi_X(xi)) = rho_X(h(xi)) (test_VIOGroupActions.cpp:82-96)."""
    cam = default_test_camera()
    for _ in range(REPS):
        xi = reasonable_state(rng, N)
        X = reasonable_group(rng, N)
        y, valid = S.measure_system(xi, cam)
        lhs, lhs_valid = S.measure_system(G.state_action(X, xi), cam)
        rhs = G.output_action(X, y, cam)
        np.testing.assert_allclose(
            np.asarray(lhs)[np.asarray(valid & lhs_valid)],
            np.asarray(rhs)[np.asarray(valid & lhs_valid)],
            atol=1e-6,
        )


def test_continuous_lift_consistency(rng):
    """d/dt phi_{exp(t Lambda)}(xi) = f(xi, u): first-order consistency with
    the integrator as dt -> 0 (test_VIOLift.cpp:28-52)."""
    for _ in range(3):
        xi = reasonable_state(rng, N)
        imu = random_imu(rng)
        lam = G.lift_velocity(xi, imu)

        errs = []
        for dt in [1e-3, 1e-4, 1e-5]:
            xi_int = S.integrate_system(xi, imu, dt)
            xi_lift = G.state_action(G.group_exp(G.algebra_scale(lam, dt)), xi)
            errs.append(state_distance(xi_int, xi_lift) / dt)
        # error/dt should vanish linearly in dt (second-order agreement)
        assert errs[1] < errs[0] * 0.2
        assert errs[2] < errs[1] * 0.2


def test_discrete_lift_exactness(rng):
    """phi_{liftDiscrete(xi,u,dt)}(xi) == integrator(xi,u,dt) exactly
    (test_VIOLift.cpp:54-71)."""
    for _ in range(REPS):
        xi = reasonable_state(rng, N)
        imu = random_imu(rng)
        dt = 0.1
        lifted = G.lift_velocity_discrete(xi, imu, dt)
        xi_lift = G.state_action(lifted, xi)
        xi_int = S.integrate_system(xi, imu, dt)
        assert state_distance(xi_int, xi_lift) < 1e-10


def test_lift_with_masked_slots(rng):
    """Dummy inactive slots must not corrupt active results or produce NaN."""
    xi_full = reasonable_state(rng, N, n_active=3)
    imu = random_imu(rng)
    lifted = G.lift_velocity_discrete(xi_full, imu, 0.05)
    assert not bool(G.group_has_nan(lifted))
    lam = G.lift_velocity(xi_full, imu)
    for leaf in lam:
        assert not np.any(np.isnan(np.asarray(leaf)))
