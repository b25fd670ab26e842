"""EqF matrix tests: A/B/C against exact AD of their defining compositions.

Mirrors the reference's parametrised suite tests (``test_EqFMatrices.cpp:58-243``)
but replaces central differences with ``jax.jacfwd`` — the compositions are the
*definitions*; the analytic matrices must match their exact derivatives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu import charts as C
from eqvio_tpu import group as G
from eqvio_tpu import matrices as M
from eqvio_tpu import states as S
from eqvio_tpu.camera import default_test_camera

from .utils import random_imu, reasonable_group, reasonable_state

N = 5
REPS = 3
SUITE_NAMES = ["euclid", "invdepth", "normal"]


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _measure_flat(xi, cam):
    px, _ = S.measure_system(xi, cam)
    return px.reshape(-1)


@pytest.mark.parametrize("name", SUITE_NAMES)
def test_state_matrix_A(rng, name):
    """A0t = D(eps o phi_{X^-1} o exp(LambdaTilde) o phi_X o eps^{-1})(0)
    (test_EqFMatrices.cpp:60-98)."""
    suite = M.get_suite(name)
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        X = reasonable_group(rng, N)
        imu = random_imu(rng)
        A0t = suite.state_matrix_A(X, xi0, imu)

        def a0(eps):
            xi_hat = G.state_action(X, xi0)
            xi_e = suite.chart.chart_inv(eps, xi0)
            xi = G.state_action(X, xi_e)
            lam_tilde = G.algebra_sub(G.lift_velocity(xi, imu), G.lift_velocity(xi_hat, imu))
            xi_hat1 = G.state_action(G.group_exp(lam_tilde), xi_hat)
            xi_e1 = G.state_action(G.group_inv(X), xi_hat1)
            return suite.chart.chart(xi_e1, xi0)

        D = xi0.dim()
        zero = jnp.zeros(D, dtype=jnp.float64)
        np.testing.assert_allclose(a0(zero), 0.0, atol=1e-10)
        A_num = jax.jacfwd(a0)(zero)
        np.testing.assert_allclose(A0t, A_num, atol=2e-6)


@pytest.mark.parametrize("name", SUITE_NAMES)
def test_input_matrix_B(rng, name):
    """B_t = derivative w.r.t. input error (test_EqFMatrices.cpp:100-137)."""
    suite = M.get_suite(name)
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        X = reasonable_group(rng, N)
        imu = random_imu(rng)
        Bt = suite.input_matrix_B(X, xi0)

        def b0(err):
            xi_hat = G.state_action(X, xi0)
            imu_err = S.IMU(
                imu.stamp,
                imu.gyr + err[0:3],
                imu.acc + err[3:6],
                imu.gyr_bias_vel + err[6:9],
                imu.acc_bias_vel + err[9:12],
            )
            lam_tilde = G.algebra_sub(
                G.lift_velocity(xi_hat, imu_err), G.lift_velocity(xi_hat, imu)
            )
            xi_hat1 = G.state_action(G.group_exp(lam_tilde), xi_hat)
            xi_e1 = G.state_action(G.group_inv(X), xi_hat1)
            return suite.chart.chart(xi_e1, xi0)

        zero = jnp.zeros(12, dtype=jnp.float64)
        np.testing.assert_allclose(b0(zero), 0.0, atol=1e-10)
        B_num = jax.jacfwd(b0)(zero)
        np.testing.assert_allclose(Bt, B_num, atol=2e-6)


@pytest.mark.parametrize("name", SUITE_NAMES)
def test_output_matrix_C(rng, name):
    """C_t = D(h o phi_X o eps^{-1})(0) (test_EqFMatrices.cpp:139-179)."""
    suite = M.get_suite(name)
    cam = default_test_camera()
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        X = reasonable_group(rng, N)
        xi_hat = G.state_action(X, xi0)
        y_hat = _measure_flat(xi_hat, cam)

        # assembled block C built from the non-equivariant Ci
        Ci = suite.output_Ci(xi0.landmarks, X.Q, cam)  # [N,2,3]

        def ct(eps):
            xi_e = suite.chart.chart_inv(eps, xi0)
            xi = G.state_action(X, xi_e)
            return _measure_flat(xi, cam) - y_hat

        D = xi0.dim()
        zero = jnp.zeros(D, dtype=jnp.float64)
        np.testing.assert_allclose(ct(zero), 0.0, atol=1e-9)
        C_num = np.asarray(jax.jacfwd(ct)(zero))
        # sensor columns of the true differential are zero (C has landmark
        # blocks only, reference EqFMatrices.cpp:43-82)
        np.testing.assert_allclose(C_num[:, :21], 0.0, atol=1e-7)
        for i in range(N):
            s = 21 + 3 * i
            np.testing.assert_allclose(
                np.asarray(Ci)[i], C_num[2 * i : 2 * i + 2, s : s + 3], atol=1e-5
            )


def test_euclid_invdepth_change_of_basis(rng):
    """A_id = M A_eu M^-1, B_id = M B_eu (test_EqFMatrices.cpp:26-56)."""
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        X = reasonable_group(rng, N)
        imu = random_imu(rng)

        D = xi0.dim()
        Mm = np.eye(D)
        blocks = np.asarray(C.invdepth_euclid_block(xi0.landmarks))
        for i in range(N):
            s = 21 + 3 * i
            Mm[s : s + 3, s : s + 3] = blocks[i]

        A_eu = np.asarray(M.state_matrix_A_euclid(X, xi0, imu))
        A_id = np.asarray(M.state_matrix_A_invdepth(X, xi0, imu))
        np.testing.assert_allclose(A_id, Mm @ A_eu @ np.linalg.inv(Mm), atol=1e-8)

        B_eu = np.asarray(M.input_matrix_B_euclid(X, xi0))
        B_id = np.asarray(M.input_matrix_B_invdepth(X, xi0))
        np.testing.assert_allclose(B_id, Mm @ B_eu, atol=1e-8)


def test_equivariant_output_tighter(rng):
    """C* at the true output linearises better than plain C
    (test_EqFMatrices.cpp:181-239)."""
    cam = default_test_camera()
    wins = 0
    total = 0
    for _ in range(10):
        q0 = jnp.asarray(rng.uniform(-1, 1, size=3) * 10 + np.array([0.0, 0.0, 20.0]))
        from eqvio_tpu.lie import SOT3, so3_exp

        QHat = SOT3(so3_exp(jnp.asarray(rng.normal(size=3) * 0.02)),
                    jnp.asarray(rng.uniform(1.0, 3.0)))
        q_hat = jnp.einsum("ji,j->i", QHat.R, q0) / QHat.a
        y_hat = cam.project(q_hat)
        Ct = M.output_matrix_Ci_euclid(q0, QHat, cam)

        def h(eps):
            q_sq = jnp.sum(q0 * q0)
            w = jnp.concatenate([-jnp.cross(q0, eps), -(q0 @ eps)[None]]) / q_sq
            from eqvio_tpu.lie import sot3_apply, sot3_exp, sot3_inv, sot3_mul

            q_e = sot3_apply(sot3_exp(-w), q0)
            q = sot3_apply(sot3_inv(QHat), q_e)
            return cam.project(q)

        step = 100.0 * np.cbrt(np.finfo(np.float32).eps)
        for j in range(3):
            eps = jnp.zeros(3, dtype=jnp.float64).at[j].set(step)
            y_true = h(eps)
            y_tilde = y_true - y_hat
            CtS = M.output_matrix_Ci_star_euclid(q0, QHat, cam, y_true)
            err_star = np.linalg.norm(np.asarray(CtS @ eps - y_tilde))
            err_plain = np.linalg.norm(np.asarray(Ct @ eps - y_tilde))
            wins += err_star <= err_plain + 1e-12
            total += 1
    assert wins == total


@pytest.mark.parametrize("name", ["euclid", "invdepth"])
def test_innovation_lift_discrete_reproduces_chart(rng, name):
    """phi_{liftInnovationDiscrete(Gamma)}(xi0) == chart_inv(Gamma, xi0)
    (defining property, test_VIOLift.cpp:85-124)."""
    from .utils import state_distance

    suite = M.get_suite(name)
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        Gamma = jnp.asarray(rng.normal(size=xi0.dim()) * 0.1)
        Delta = suite.lift_innovation_discrete(Gamma, xi0)
        xi_lift = G.state_action(Delta, xi0)
        xi_chart = suite.chart.chart_inv(Gamma, xi0)
        assert state_distance(xi_lift, xi_chart) < 1e-9


@pytest.mark.parametrize("name", SUITE_NAMES)
def test_innovation_lift_continuous(rng, name):
    """d/dt chart(phi_{exp(t lift(Gamma))}(xi0), xi0)|_0 == Gamma."""
    suite = M.get_suite(name)
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        Gamma = jnp.asarray(rng.normal(size=xi0.dim()) * 0.1)
        lam = suite.lift_innovation(Gamma, xi0)

        def curve(t):
            Delta = G.group_exp(G.algebra_scale(lam, t))
            return suite.chart.chart(G.state_action(Delta, xi0), xi0)

        dGamma = jax.jacfwd(curve)(jnp.asarray(0.0))
        np.testing.assert_allclose(dGamma, Gamma, atol=1e-7)


def test_discrete_state_matrix(rng):
    """state_matrix_A_discrete: sensor block converges to I + dt*A as dt -> 0.

    The landmark blocks legitimately differ from the continuous generator in
    the stabiliser directions: the discrete lift's Q (minimal rotation via
    SO3FromVectors, reference VIOGroup.cpp:265) and the continuous lift's W
    differ by a rotation about the landmark axis, which acts trivially on the
    state but not on the conjugated transition map.  The reference has no
    test for stateMatrixADiscrete; we pin the guaranteed parts.
    """
    suite = M.get_suite("euclid")
    xi0 = reasonable_state(rng, N)
    X = reasonable_group(rng, N)
    imu = random_imu(rng)
    A_cont = np.asarray(M.state_matrix_A_euclid(X, xi0, imu))
    dt = 1e-5
    A_disc = np.asarray(M.state_matrix_A_discrete(suite, X, xi0, imu, dt))
    D = xi0.dim()
    approx = (A_disc - np.eye(D)) / dt
    # sensor block matches the continuous generator
    np.testing.assert_allclose(approx[:21, :21], A_cont[:21, :21], atol=1e-3)
    # landmark rows against sensor columns match too
    np.testing.assert_allclose(approx[21:, :21], A_cont[21:, :21], atol=1e-3)
    # symmetric parts of the landmark diagonal blocks agree (stabiliser
    # rotations only contribute skew components)
    for i in range(N):
        s = 21 + 3 * i
        sym_d = 0.5 * (approx[s : s + 3, s : s + 3] + approx[s : s + 3, s : s + 3].T)
        sym_c = 0.5 * (A_cont[s : s + 3, s : s + 3] + A_cont[s : s + 3, s : s + 3].T)
        np.testing.assert_allclose(sym_d, sym_c, atol=1e-3)
    assert not np.any(np.isnan(A_disc))


def test_masked_slots_decoupled(rng):
    """Inactive landmark slots produce zero rows/cols in A, B."""
    xi0 = reasonable_state(rng, N, n_active=3)
    X = reasonable_group(rng, N)
    imu = random_imu(rng)
    A = np.asarray(M.state_matrix_A_euclid(X, xi0, imu))
    B = np.asarray(M.input_matrix_B_euclid(X, xi0))
    for i in range(3, N):
        s = 21 + 3 * i
        assert np.abs(A[s : s + 3, :]).max() == 0.0
        assert np.abs(B[s : s + 3, :]).max() == 0.0
    assert not np.any(np.isnan(A))
    assert not np.any(np.isnan(B))


def test_normal_euclid_differential_blocks(rng):
    """The block-assembled d(normal o euclid^-1) equals the dense jacfwd of
    the composed transition map (regression for the block-diagonal rewrite;
    reference computes this dense, VIOState.cpp:391-401)."""
    xi0 = reasonable_state(rng, N)
    dense_fn = lambda eps: C.STATE_CHARTS["normal"].chart(
        C.STATE_CHARTS["euclid"].chart_inv(eps, xi0), xi0
    )
    D = xi0.dim()
    M_num = np.asarray(jax.jacfwd(dense_fn)(jnp.zeros(D, dtype=jnp.float64)))
    M_blk = np.asarray(M.normal_euclid_differential(xi0))
    np.testing.assert_allclose(M_blk, M_num, atol=1e-9)
    # off-block region of the true differential really is zero
    np.testing.assert_allclose(M_num[:21, 21:], 0.0, atol=1e-12)
    np.testing.assert_allclose(M_num[21:, :21], 0.0, atol=1e-12)


def test_normal_euclid_inverse_blocks(rng):
    """Analytic inverse blocks really invert the forward blocks."""
    xi0 = reasonable_state(rng, N)
    Ms = np.asarray(M.normal_euclid_sensor_differential(xi0))
    Ms_inv = np.asarray(M.euclid_normal_sensor_differential(xi0))
    np.testing.assert_allclose(Ms @ Ms_inv, np.eye(21), atol=1e-9)
    Mp = np.asarray(M.normal_euclid_point_blocks(xi0.landmarks))
    Mp_inv = np.asarray(M.euclid_normal_point_blocks(xi0.landmarks))
    for i in range(N):
        np.testing.assert_allclose(Mp[i] @ Mp_inv[i], np.eye(3), atol=1e-9)
