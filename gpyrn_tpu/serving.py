"""Ahead-of-time export of the fitted GPRN posterior predictive.

``export_predict`` lowers the jitted batched-lattice predictive
(``models/gprn.py`` ``predict`` — reference semantics
/root/reference/gpyrn/meanfield.py:1289-1379) to a serialized StableHLO
artifact with the training inputs and the fitted variational state baked
in as constants.  A serving process then answers ``predict(tstar)`` with
jax alone — no gpyrn_tpu import, no kernel registry, no Python re-trace
of the model — and one artifact can carry lowerings for several
platforms (export on a CPU dev box, serve on TPU).

The prediction-point count is a *symbolic dimension* by default, so a
single artifact serves requests of any size; XLA still specializes per
concrete shape at call time (with its usual compile cache), but the
traced program is fixed at export time and versioned with the artifact.

The reference has no counterpart — it re-runs its numpy prediction loop
inside the full research environment every time.  This module is the
production-serving face of the framework.

Typical flow::

    gprn.ELBOcalc(...)                     # fit
    gprn.export_predict("predict.bin")     # training box (CPU or TPU)
    ...
    serve = serving.load_predict("predict.bin")   # serving box
    mean, var = serve(tstar)[:2]
"""
import numpy as np

import jax
import jax.export

__all__ = ["export_predict", "save_predict", "load_predict",
           "ServingPredictor"]


def _predict_closure(gprn, dtype):
    """Bind the training inputs and fitted state as constants and return
    ``fn(tstar) -> (mean, var, node_preds, weight_preds)``."""
    eng = gprn.engine
    theta = np.asarray(gprn._theta(), dtype=dtype)
    t = np.asarray(gprn.time, dtype=dtype)
    y = np.asarray(gprn.y, dtype=dtype)
    yerr2 = np.asarray(gprn.yerr2, dtype=dtype)
    if gprn._mu is None or gprn._var is None:
        raise ValueError(
            "export_predict needs a fitted variational state — run "
            "ELBOcalc (or load a checkpoint) before exporting")
    mu = np.asarray(gprn._mu, dtype=dtype).ravel()
    var = np.asarray(gprn._var, dtype=dtype).ravel()

    def fn(tstar):
        return eng.predict(theta, t, y, yerr2, mu, var, tstar)

    return fn


def export_predict(gprn, platforms=None, n_star=None, dtype=None):
    """Lower the fitted posterior predictive to a ``jax.export.Exported``.

    Parameters
    ----------
    gprn : meanfield.inference
        A fitted model (``ELBOcalc`` ran, or a checkpoint was loaded).
    platforms : sequence of str, optional
        Lowering platforms, e.g. ``("cpu", "tpu")``.  Default: the
        platform jax is currently running on.
    n_star : int, optional
        Concrete number of prediction points.  Default: a symbolic
        dimension ``n`` — the artifact accepts any size.
    dtype : np.dtype, optional
        Compute dtype of the exported program (training inputs and the
        variational state are cast once at export).  Default: float64
        when jax x64 is enabled (the parity dtype), else float32 (the
        TPU-native serving dtype).
    """
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    fn = _predict_closure(gprn, dtype)
    if n_star is None:
        shape = jax.export.symbolic_shape("n")
    else:
        shape = (int(n_star),)
    arg = jax.ShapeDtypeStruct(shape, dtype)
    kw = {} if platforms is None else {"platforms": list(platforms)}
    return jax.export.export(jax.jit(fn), **kw)(arg)


def save_predict(gprn, path, **kw):
    """``export_predict`` then write the serialized artifact to ``path``.
    Returns the byte count written."""
    blob = export_predict(gprn, **kw).serialize()
    with open(path, "wb") as fh:
        fh.write(blob)
    return len(blob)


def _warm_cpu_linalg():
    """XLA:CPU (jax 0.9.0) SEGFAULTS executing a *deserialized* module
    whose lapack custom calls (potrf/trsm) were never registered in the
    serving process — registration happens lazily the first time jax
    itself lowers a cholesky/solve.  Lowering a tiny one here makes a
    fresh serving process safe.  TPU lowers these to pure HLO, so the
    guard is CPU-only."""
    if jax.default_backend() != "cpu":
        return
    import jax.numpy as jnp
    from jax.scipy.linalg import cho_solve
    eye = jnp.eye(2)
    L = jax.jit(jnp.linalg.cholesky)(eye)
    jax.block_until_ready(
        jax.jit(lambda l, b: cho_solve((l, True), b))(L, jnp.ones(2)))


class ServingPredictor:
    """Callable wrapper around a deserialized predictive artifact.

    ``__call__(tstar)`` returns numpy ``(mean (n*, p), var (n*, p),
    node_preds (q, n*), weight_preds (q*p, n*))`` — the same tuple as
    the engine's ``predict``.

    Dtype: requests are cast to the dtype the artifact was exported
    with (``.dtype``).  Feeding float64 times to a float32 artifact
    therefore narrows them — a one-time ``UserWarning`` flags it when
    the cast actually loses precision.  The reverse direction (float64
    artifact in an x64-disabled serving process) raises inside jax.
    """

    def __init__(self, exported):
        _warm_cpu_linalg()
        self.exported = exported
        self._warned_downcast = False

    @property
    def platforms(self):
        return tuple(self.exported.platforms)

    @property
    def dtype(self):
        """The request dtype the artifact was exported with."""
        return np.dtype(self.exported.in_avals[0].dtype)

    def __call__(self, tstar):
        want = self.exported.in_avals[0].dtype
        arr = np.ascontiguousarray(tstar)
        if (not self._warned_downcast
                and np.issubdtype(arr.dtype, np.floating)
                and np.dtype(arr.dtype).itemsize > np.dtype(want).itemsize):
            import warnings
            warnings.warn(
                f"request dtype {arr.dtype} narrowed to the artifact's "
                f"{np.dtype(want)} (exported dtype wins)", stacklevel=2)
            self._warned_downcast = True
        tstar = np.ascontiguousarray(arr, dtype=want)
        out = self.exported.call(tstar)
        return tuple(np.asarray(o) for o in out)


def load_predict(path_or_bytes):
    """Deserialize an artifact written by ``save_predict`` into a
    :class:`ServingPredictor`.  Needs only jax — gpyrn_tpu does not have
    to be importable in the serving process."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            blob = fh.read()
    return ServingPredictor(jax.export.deserialize(blob))
