"""AOT serving exports (gpyrn_tpu/serving.py).

The exported artifact must reproduce the engine's posterior predictive
exactly (same traced program, constants baked), accept any prediction
size through the symbolic dimension, and be servable by a process that
has only jax — no gpyrn_tpu on the path.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import gpyrn_tpu as g
from gpyrn_tpu import serving


def _fitted_model(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components(g.covfunc.Periodic(1.0, 10.0, 0.5),
                        g.covfunc.SquaredExponential(1.0, 20.0),
                        g.meanfunc.Constant(0.0), 0.1)
    # a real (cheap) variational state without paying a full fit compile
    theta = gprn._theta()
    mu, var = gprn.engine.init_mu_var(theta, gprn.y)
    gprn._mu, gprn._var = np.asarray(mu), np.asarray(var)
    return gprn


def test_export_requires_state(tiny_dataset):
    t, y, yerr = tiny_dataset
    gprn = g.inference(1, t, y, yerr)
    gprn.set_components(g.covfunc.SquaredExponential(1.0, 20.0),
                        g.covfunc.SquaredExponential(1.0, 20.0),
                        g.meanfunc.Constant(0.0), 0.1)
    with pytest.raises(ValueError, match="fitted variational state"):
        serving.export_predict(gprn)


def test_symbolic_roundtrip_matches_engine(tiny_dataset, tmp_path):
    gprn = _fitted_model(tiny_dataset)
    path = tmp_path / "predict.bin"
    nbytes = gprn.export_predict(str(path))
    assert nbytes > 0 and path.stat().st_size == nbytes

    serve = serving.load_predict(str(path))
    # one artifact, two different request sizes (symbolic n)
    for nn in (7, 19):
        tstar = np.linspace(-2.0, 33.0, nn)
        mean_s, var_s, npred_s, wpred_s = serve(tstar)
        mean_r, var_r = gprn._Prediction(tstar=tstar)
        assert mean_s.shape == (nn, 1) and var_s.shape == (nn, 1)
        np.testing.assert_allclose(mean_s, mean_r, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(var_s, var_r, rtol=1e-12, atol=1e-12)
        assert npred_s.shape == (1, nn) and wpred_s.shape == (1, nn)


def test_fixed_shape_export(tiny_dataset):
    gprn = _fitted_model(tiny_dataset)
    import jax.export
    art = serving.export_predict(gprn, n_star=11)
    serve = serving.load_predict(art.serialize())
    assert isinstance(serve.exported, jax.export.Exported)
    tstar = np.linspace(0.0, 30.0, 11)
    mean_s, var_s = serve(tstar)[:2]
    mean_r, var_r = gprn._Prediction(tstar=tstar)
    np.testing.assert_allclose(mean_s, mean_r, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(var_s, var_r, rtol=1e-12, atol=1e-12)
    # a fixed-shape artifact must reject other sizes
    with pytest.raises(Exception):
        serve(np.linspace(0.0, 30.0, 12))


def test_f32_export_dtype(tiny_dataset):
    gprn = _fitted_model(tiny_dataset)
    art = serving.export_predict(gprn, dtype=np.float32)
    serve = serving.ServingPredictor(art)
    assert serve.dtype == np.float32
    tstar = np.linspace(0.0, 30.0, 9)
    # float64 request into a float32 artifact: warns once, then serves
    with pytest.warns(UserWarning, match="narrowed to the artifact's"):
        mean_s, var_s = serve(tstar)[:2]
    assert mean_s.dtype == np.float32
    mean_r, var_r = gprn._Prediction(tstar=tstar)
    np.testing.assert_allclose(mean_s, mean_r, rtol=5e-4, atol=5e-4)
    # same-width requests never warn
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        serve(tstar.astype(np.float32))


def test_cross_platform_export(tiny_dataset):
    """Lowering for a platform that is not the running one (export on a
    CPU dev box, serve on TPU) — the artifact must carry both and stay
    callable here on CPU."""
    gprn = _fitted_model(tiny_dataset)
    art = serving.export_predict(gprn, platforms=("cpu", "tpu"),
                                 dtype=np.float32)
    serve = serving.load_predict(art.serialize())
    assert set(serve.platforms) == {"cpu", "tpu"}
    tstar = np.linspace(0.0, 30.0, 9, dtype=np.float32)
    mean_s = serve(tstar)[0]
    mean_r, _ = gprn._Prediction(tstar=tstar)
    np.testing.assert_allclose(mean_s, mean_r, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_serving_process_without_package(tiny_dataset, tmp_path):
    """The artifact is servable by a fresh process with ONLY jax — the
    package itself absent from sys.path (the production-serving claim in
    serving.py's module docstring)."""
    gprn = _fitted_model(tiny_dataset)
    path = tmp_path / "predict.bin"
    gprn.export_predict(str(path))
    tstar = np.linspace(0.0, 30.0, 13)
    mean_r, _ = gprn._Prediction(tstar=tstar)
    np.save(tmp_path / "tstar.npy", tstar)

    code = (
        "import sys, numpy as np, jax, jax.numpy as jnp, jax.export\n"
        "assert not any('repo' in p for p in sys.path), sys.path\n"
        # register XLA:CPU's lapack custom calls BEFORE running the
        # artifact (serving.py::_warm_cpu_linalg explains the segfault)
        "from jax.scipy.linalg import cho_solve\n"
        "L = jax.jit(jnp.linalg.cholesky)(jnp.eye(2))\n"
        "jax.jit(lambda l, b: cho_solve((l, True), b))(L, jnp.ones(2))\n"
        "blob = open(sys.argv[1], 'rb').read()\n"
        "art = jax.export.deserialize(blob)\n"
        "tstar = np.load(sys.argv[2])\n"
        "out = art.call(tstar.astype(art.in_avals[0].dtype))\n"
        "np.save(sys.argv[3], np.asarray(out[0]))\n"
    )
    # an f64 artifact needs x64 enabled in the serving process, or jax
    # canonicalizes the request array to f32 and the call is rejected
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               JAX_ENABLE_X64="1")
    res = subprocess.run(
        [sys.executable, "-c", code, str(path),
         str(tmp_path / "tstar.npy"), str(tmp_path / "mean.npy")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    mean_s = np.load(tmp_path / "mean.npy")
    np.testing.assert_allclose(mean_s, mean_r, rtol=1e-12, atol=1e-12)
