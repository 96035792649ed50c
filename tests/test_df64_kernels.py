"""df64 kernel assembly + exact log-determinant tests.

The decisive comparison: at the GPRN's real conditioning
(cond ≈ tr(K)/1e-6), f32 ASSEMBLY alone corrupts logdet by ~1%; the df64
pipeline must recover the float64 value to ~1e-6 relative."""
import numpy as np
import pytest

from gpyrn_tpu import covfunc
from gpyrn_tpu.ops import df64 as dd
from gpyrn_tpu.ops import df64_kernels as dk

NUGGET = 1e-6


@pytest.fixture(scope="module")
def t():
    rng = np.random.default_rng(0)
    return np.sort(rng.uniform(0, 100, 220))


_KERNELS = {
    "SquaredExponential": (1.1, 30.0),
    "Periodic": (1.2, 20.0, 0.7),
    "QuasiPeriodic": (1.0, 30.0, 20.0, 0.7),
    "RationalQuadratic": (1.1, 0.8, 25.0),
    "Exponential": (1.1, 20.0),
    "Matern32": (1.1, 20.0),
    "Matern52": (1.1, 20.0),
    "Cosine": (1.1, 20.0),
    "Constant": (1.3,),
    # round-3 additions: the rest of the reference library
    "WhiteNoise": (0.7,),
    "RQP": (1.1, 0.8, 40.0, 20.0, 0.7),
    "GammaExp": (1.1, 1.4, 20.0),
    "Piecewise": (60.0,),
    "Paciorek": (1.1, 20.0, 35.0),
    "NewPeriodic": (1.1, 0.8, 20.0, 0.7),
    "QuasiNewPeriodic": (1.1, 0.8, 40.0, 20.0, 0.7),
    "NewRQP": (1.1, 0.9, 0.8, 40.0, 20.0, 0.7),
    "CosPeriodic": (1.1, 20.0, 0.9),
    "QuasiCosPeriodic": (1.1, 40.0, 20.0, 0.9),
}

# non-stationary (t1, t2) kernels: OO-constructor args
_NONSTAT_KERNELS = {
    "Linear": (42.0,),
    "Polynomial": (1.0, 0.02, 3.0, 2.0),
    "HarmonicPeriodic": (3, 1.1, 20.0, 0.9),
    "QuasiHarmonicPeriodic": (3, 1.1, 40.0, 20.0, 0.9),
}


@pytest.mark.parametrize("name", sorted(_KERNELS))
def test_df64_matrix_matches_f64(name, t):
    k = getattr(covfunc, name)(*_KERNELS[name])
    K64 = np.asarray(covfunc.evaluate(
        k.structure, np.asarray(k.core_params(), dtype=np.float64),
        r=(t[:, None] - t[None, :]))) + NUGGET * np.eye(t.size)
    Kdf = dk.df_kernel_matrix(k.structure, k.core_params(), t, NUGGET)
    got = np.asarray(dd.to_f64(Kdf))
    np.testing.assert_allclose(got, K64, rtol=2e-11, atol=2e-11)


def test_composite_matrix(t):
    k = covfunc.SquaredExponential(1.0, 25.0) * \
        covfunc.Periodic(1.0, 20.0, 0.7) + covfunc.Constant(0.3)
    K64 = np.asarray(covfunc.evaluate(
        k.structure, np.asarray(k.core_params(), dtype=np.float64),
        r=(t[:, None] - t[None, :]))) + NUGGET * np.eye(t.size)
    Kdf = dk.df_kernel_matrix(k.structure, k.core_params(), t, NUGGET)
    np.testing.assert_allclose(np.asarray(dd.to_f64(Kdf)), K64,
                               rtol=2e-11, atol=2e-11)


@pytest.mark.parametrize("name", ["SquaredExponential", "QuasiPeriodic",
                                  "Matern52"])
def test_logdet_exact_where_f32_fails(name, t):
    """THE target property: df64 logdet ≈ f64 logdet even though the f32
    assembly error alone is orders of magnitude larger."""
    k = getattr(covfunc, name)(*_KERNELS[name])
    p64 = np.asarray(k.core_params(), dtype=np.float64)
    r64 = t[:, None] - t[None, :]
    K64 = np.asarray(covfunc.evaluate(k.structure, p64, r=r64)) + \
        NUGGET * np.eye(t.size)
    ld_exact = np.linalg.slogdet(K64)[1]

    # f32-assembled, f64-factored — isolates the assembly error
    K32 = np.asarray(covfunc.evaluate(
        k.structure, p64.astype(np.float32),
        r=r64.astype(np.float32))).astype(np.float64) + \
        NUGGET * np.eye(t.size)
    ld_f32asm = np.linalg.slogdet(K32)[1]
    f32_err = abs(ld_f32asm - ld_exact)

    ld_df = dk.df_logdet_kernel(k.structure, k.core_params(), t, NUGGET)
    df_err = abs(ld_df - ld_exact)
    assert df_err < abs(ld_exact) * 1e-6, \
        f"{name}: df64 {ld_df} vs exact {ld_exact}"
    assert df_err < f32_err / 50, \
        f"{name}: df64 err {df_err} not << f32-assembly err {f32_err}"


@pytest.mark.parametrize("name", sorted(_NONSTAT_KERNELS))
def test_df64_nonstationary_matches_f64(name, t):
    k = getattr(covfunc, name)(*_NONSTAT_KERNELS[name])
    t64 = np.asarray(t, dtype=np.float64)
    K64 = np.asarray(covfunc.evaluate(
        k.structure, np.asarray(k.core_params(), dtype=np.float64),
        r=None, t1=t64[:, None], t2=t64[None, :])) + \
        NUGGET * np.eye(t.size)
    Kdf = dk.df_kernel_matrix(k.structure, k.core_params(), t, NUGGET)
    got = np.asarray(dd.to_f64(Kdf))
    scale = np.max(np.abs(K64))
    np.testing.assert_allclose(got, K64, rtol=5e-11, atol=5e-11 * scale)


def test_df64_polynomial_negative_base(t):
    """C99 pow semantics: odd integer exponent on a negative base."""
    tt = np.linspace(-3.0, 3.0, 64)     # a·t1·t2 + b changes sign
    k = covfunc.Polynomial(1.0, 1.0, -0.5, 3.0)
    K64 = np.asarray(covfunc.evaluate(
        k.structure, np.asarray(k.core_params(), dtype=np.float64),
        r=None, t1=tt[:, None], t2=tt[None, :]))
    Kdf = dk.df_kernel_matrix(k.structure, k.core_params(), tt, 0.0)
    got = np.asarray(dd.to_f64(Kdf))
    assert np.min(K64) < 0 < np.max(K64)      # sign actually exercised
    np.testing.assert_allclose(got, K64, rtol=1e-10,
                               atol=1e-10 * np.max(np.abs(K64)))


def test_supported_structures(t):
    # the Derivative wrapper gained its df64 rule (SE/P/QP children);
    # a non-twice-differentiable child stays unsupported
    assert dk.df_supported(("d", ("SE",)))
    assert dk.df_supported(("d", ("P",)))
    assert dk.df_supported(("d", ("QP",)))
    assert not dk.df_supported(("d", ("M52",)))
    assert dk.df_supported(("+", ("SE",), ("M52",)))
    assert dk.df_supported(("WN",))
    assert dk.df_supported(("HP",))
    assert dk.df_nonstationary(("*", ("SE",), ("LIN",)))
    assert not dk.df_nonstationary(("QP",))


def test_derivative_d2_matches_f64(t):
    """df64 assembly of the d²k kernels matches float64 to ~1e-13."""
    from gpyrn_tpu.ops import kernels as _k
    import jax.numpy as jnp
    for struct, pars in [(("d", ("SE",)), [1.3, 4.0]),
                         (("d", ("P",)), [1.1, 9.0, 0.7]),
                         (("d", ("QP",)), [1.2, 12.0, 9.0, 0.8])]:
        K64 = np.asarray(_k.evaluate(
            struct, jnp.asarray(pars, jnp.float64),
            r=np.asarray(t)[:, None] - np.asarray(t)[None, :]),
            dtype=np.float64)
        Kdf = dk.df_kernel_matrix(struct, np.asarray(pars, np.float64),
                                  np.asarray(t), 0.0)
        Krec = np.float64(np.asarray(Kdf.hi)) \
            + np.float64(np.asarray(Kdf.lo))
        scale = np.max(np.abs(K64))
        assert np.max(np.abs(Krec - K64)) / scale < 1e-11


@pytest.mark.slow
def test_df64_accuracy_independent_of_x64(tmp_path):
    """Regression: with GPYRN_TPU_X64=0 (the TPU speed mode) the df64
    pipeline must retain full accuracy — the old jnp-based from_f64
    silently zeroed the low word without x64."""
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "x64off.py"
    script.write_text(f"""
import os
os.environ["GPYRN_TPU_X64"] = "0"
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import gpyrn_tpu as g
from gpyrn_tpu.ops import df64_kernels as dk
rng = np.random.default_rng(0)
t = np.sort(rng.uniform(0, 100, 120))
k = g.covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)
ld = dk.df_logdet_kernel(k.structure, k.core_params(), t, 1e-6)
print("LD", repr(float(ld)))
""")
    out = subprocess.run([sys.executable, str(script)],
                         capture_output=True, text=True, timeout=300,
                         env={**os.environ, "PYTHONPATH": "",
                              "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-800:]
    ld_x64off = float(out.stdout.strip().split("LD ")[1])

    # exact f64 value computed here (x64 on in the test process)
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, 120))
    k = covfunc.QuasiPeriodic(1.0, 30.0, 20.0, 0.7)
    K64 = np.asarray(covfunc.evaluate(
        k.structure, np.asarray(k.core_params(), dtype=np.float64),
        r=(t[:, None] - t[None, :]))) + 1e-6 * np.eye(120)
    exact = float(np.linalg.slogdet(K64)[1])
    assert ld_x64off == pytest.approx(exact, rel=1e-5)
