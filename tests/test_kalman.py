"""Batched Kalman filter vs a scalar numpy oracle (sort.py:96-121 model)."""
import numpy as np
import jax.numpy as jnp

from facerec_tpu.ops import boxes, kalman


class ScalarKF:
    """Independent scalar re-derivation of the 8-state CV filter."""

    def __init__(self, z):
        self.F = kalman.F.copy()
        self.H = kalman.H.copy()
        self.R = kalman.R.copy()
        self.Q = kalman.Q.copy()
        self.x = np.zeros(8, np.float32)
        self.x[:4] = z
        self.P = kalman.P0.copy()

    def predict(self):
        if self.x[6] + self.x[2] < 1e-3:
            self.x[6] = 0.0
        if self.x[7] + self.x[3] < 1e-3:
            self.x[7] = 0.0
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z):
        y = z - self.H @ self.x
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        IKH = np.eye(8) - K @ self.H
        self.P = IKH @ self.P @ IKH.T + K @ self.R @ K.T


def test_matches_scalar_oracle(rng):
    T = 4
    z0 = rng.uniform(10, 100, size=(T, 4)).astype(np.float32)
    oracles = [ScalarKF(z) for z in z0]

    state = kalman.init_state(T)
    state = kalman.reset_tracks(state, jnp.ones(T, bool), jnp.asarray(z0))

    for step in range(6):
        zs = rng.uniform(10, 100, size=(T, 4)).astype(np.float32)
        mask = rng.uniform(size=T) > 0.3
        state = kalman.predict(state)
        state = kalman.update(state, jnp.asarray(zs), jnp.asarray(mask))
        for t, o in enumerate(oracles):
            o.predict()
            if mask[t]:
                o.update(zs[t])
            np.testing.assert_allclose(np.asarray(state.x[t]), o.x,
                                       rtol=2e-4, atol=2e-3)
            np.testing.assert_allclose(np.asarray(state.p[t]), o.P,
                                       rtol=2e-4, atol=2e-3)


def test_box_roundtrip():
    b = jnp.asarray([10.0, 20.0, 50.0, 60.0])
    z = boxes.box_to_z(b)
    np.testing.assert_allclose(np.asarray(z), [30, 40, 1600, 1.0], rtol=1e-6)
    back = boxes.z_to_box(z)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b), rtol=1e-5)


def test_reset_tracks_partial():
    state = kalman.init_state(3)
    z = jnp.asarray([[1.0, 2, 3, 4]] * 3)
    state = kalman.update(kalman.predict(state), z, jnp.ones(3, bool))
    reset = kalman.reset_tracks(state, jnp.asarray([True, False, False]), z)
    np.testing.assert_allclose(np.asarray(reset.x[0]),
                               [1, 2, 3, 4, 0, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(reset.p[0]), kalman.P0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(reset.x[1]), np.asarray(state.x[1]))
