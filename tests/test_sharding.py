"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY.md §4e).

Covers the two mesh axes: ``dp`` (restart/walker population) and ``lat``
(the (q × p) lattice of kernel-matrix Choleskys)."""
import numpy as np
import jax
import pytest

import gpyrn_tpu as g
from gpyrn_tpu.parallel import (DP_AXIS, LAT_AXIS, make_mesh, shard_along,
                                use_mesh, multistart_optimize)


pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multiple devices")


def _problem(N=16, q=2, p=2, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 30, N))
    data = []
    for i in range(p):
        data += [np.sin(2 * np.pi * t / (8 + 3 * i))
                 + 0.1 * rng.standard_normal(N), np.full(N, 0.1)]
    gprn = g.inference(q, t, *data)
    nodes = [g.covfunc.Periodic(1.0, 8.0, 0.6),
             g.covfunc.Matern52(1.0, 4.0)][:q]
    weights = [g.covfunc.SquaredExponential(1.0 + 0.1 * k, 5.0)
               for k in range(q * p)]
    gprn.set_components(nodes, weights, [None] * p, [0.1] * p)
    return gprn


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.axis_names == (DP_AXIS, LAT_AXIS)
    assert mesh.devices.size == len(jax.devices())


def test_make_mesh_shape():
    mesh = make_mesh(shape=(4, 2))
    assert mesh.shape[DP_AXIS] == 4 and mesh.shape[LAT_AXIS] == 2


def test_shard_along():
    mesh = make_mesh()
    x = np.arange(len(jax.devices()) * 3, dtype=float).reshape(-1, 3)
    xs = shard_along(x, mesh, DP_AXIS, 0)
    assert len(xs.sharding.device_set) == len(jax.devices())
    np.testing.assert_allclose(np.asarray(xs), x)


def test_lattice_sharded_elbo_matches_unsharded():
    """The lat-sharded engine must be numerically identical."""
    gprn = _problem()
    e_ref, mu_ref, var_ref, it_ref = gprn.ELBOcalc(max_iter=60)

    gprn2 = _problem()
    gprn2.lattice_axis = LAT_AXIS
    mesh = make_mesh(shape=(len(jax.devices()) // 2, 2))
    with use_mesh(mesh):
        e_sh, mu_sh, var_sh, it_sh = gprn2.ELBOcalc(max_iter=60)
    assert it_ref == it_sh
    np.testing.assert_allclose(e_ref, e_sh, rtol=1e-10)
    np.testing.assert_allclose(mu_ref, mu_sh, atol=1e-10)


@pytest.mark.slow
def test_multistart_sharded_improves_elbo():
    gprn = _problem()
    e0 = gprn.ELBO
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    with use_mesh(mesh):
        out = multistart_optimize(gprn, n_restarts=len(jax.devices()),
                                  n_steps=10, n_sweeps=8, mesh=mesh, seed=1)
    assert np.isfinite(out["elbo"])
    assert out["elbo"] >= e0 - 1e-6
    assert out["restart_elbos"].shape == (len(jax.devices()),)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(len(jax.devices()))


@pytest.mark.slow
def test_multistart_nm_sharded_improves_elbo():
    """The dp-sharded Nelder-Mead population improves on the starting
    point and installs a finite winner.  (No sharded-vs-unsharded
    trajectory equality: a sharded compile is a different XLA program,
    and NM trajectories are chaotic w.r.t. one-ULP objective
    differences — single-eval sharded equality is covered by
    test_lattice_sharded_elbo_matches_unsharded.)"""
    gprn = _problem()
    e0 = gprn.ELBO
    B = len(jax.devices())
    mesh = make_mesh(shape=(B, 1))
    with use_mesh(mesh):
        out_s = multistart_optimize(gprn, n_restarts=B, n_steps=30,
                                    n_sweeps=8, mesh=mesh, seed=2,
                                    method='nm')
    assert np.isfinite(out_s["elbo"]) and out_s["elbo"] >= e0 - 1e-6
    assert out_s["restart_elbos"].shape == (B,)
    assert 0 <= out_s["winner"] < B
    assert out_s["nit"].shape == (B,)


def test_multistart_unknown_method_raises():
    gprn = _problem()
    with pytest.raises(ValueError, match="unknown method"):
        multistart_optimize(gprn, n_restarts=2, method='bfgs')


@pytest.mark.slow
def test_batch_elbo_dp_sharded_matches_unsharded():
    """Evidence importance samples shard over dp (SURVEY §5.8); the
    sharded batch must evaluate to the same ELBOs."""
    from gpyrn_tpu.inference.evidence import batch_elbo
    gprn = _problem()
    theta0 = gprn.get_parameters(include_frozen=True)
    rng = np.random.default_rng(0)
    B = 2 * len(jax.devices())
    thetas = theta0[None, :] * np.exp(
        0.1 * rng.standard_normal((B, theta0.size)))
    ref = batch_elbo(gprn, thetas, max_iter=30)
    mesh = make_mesh(shape=(len(jax.devices()), 1))
    with use_mesh(mesh):
        sh = batch_elbo(gprn, thetas, max_iter=30, mesh=mesh)
    np.testing.assert_allclose(sh, ref, rtol=1e-8)
