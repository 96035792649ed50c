"""Memory-lean fit_state (kernel lattice rebuilt per GP per sweep).

The lean path must reproduce the standard batched fit_state exactly —
same update map, different memory layout (peak ~3 N² buffers instead of
~3·q(1+p) N², the single-chip road to BASELINE config 5's N=20k).
"""
import numpy as np
import pytest

import gpyrn_tpu as g


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(1)
    N = 40
    t = np.sort(rng.uniform(0, 40, N))
    data = []
    for i in range(2):
        data += [np.sin(2 * np.pi * t / (9 + 3 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    m = g.inference(2, t, *data)
    m.set_components(
        [g.covfunc.Periodic(1., 9., .6), g.covfunc.Matern52(1., 6.)],
        [g.covfunc.SquaredExponential(1. + 0.1 * k, 8.) for k in range(4)],
        [None, None], [0.1, 0.1])
    return m


def test_lean_matches_batched(problem):
    m = problem
    eng = m.engine
    theta = m._theta()
    tt = np.asarray(m.time, dtype=float)
    mu0, var0 = eng.init_mu_var(theta, m.y)
    a = eng.fit_state(theta, tt, m.y, m.yerr2, mu0, var0, 80, 1e-9)
    b = eng.fit_state_lean(theta, tt, m.y, m.yerr2, mu0, var0, 80, 1e-9)
    assert int(a[2]) == int(b[2])
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]),
                               atol=1e-10)


def test_lean_f32(problem):
    import jax.numpy as jnp
    m = problem
    eng = m.engine
    theta = m._theta()
    tt = np.asarray(m.time, dtype=float)
    f32 = lambda x: jnp.asarray(np.asarray(x), dtype=jnp.float32)  # noqa
    mu0, var0 = eng.init_mu_var(f32(theta), f32(m.y))
    a = eng.fit_state(f32(theta), f32(tt), f32(m.y), f32(m.yerr2),
                      mu0, var0, 50, 1e-5)
    b = eng.fit_state_lean(f32(theta), f32(tt), f32(m.y), f32(m.yerr2),
                           mu0, var0, 50, 1e-5)
    # f32 iterates of the two layouts round differently (einsum orders),
    # so mid-trajectory states agree only to the map's f32 sensitivity;
    # the f64 test above pins exact equivalence of the update map
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]),
                               atol=5e-3)
    assert np.all(np.isfinite(np.asarray(b[0])))
