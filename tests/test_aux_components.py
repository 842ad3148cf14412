"""Auxiliary components: probes, QOI, calibration, MLP, samplers,
databases, timers, conversions, x-metrics analysis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.fem import Probe, QOI
from generative_physics_informed_pde_tpu.models import (
    FeedforwardNeuralNetwork, architecture_from_linear_decay,
    optimize_effective_properties, reduced_order_model_solve,
    ReducedOrderModelOperator)
from generative_physics_informed_pde_tpu.data import (BatchedOverSampler,
                                                      TensorDataset,
                                                      minibatch_indices)
from generative_physics_informed_pde_tpu.utils import (ParameterStudy,
                                                       ResultsDatabase,
                                                       ParallelStudyPoolBoy,
                                                       StopWatch, Timer)
from generative_physics_informed_pde_tpu.parallel import (DummyProcessPool,
                                                          ThreadPool)


def test_probe_exact_for_p1_fields():
    grid = fem.StructuredTriGrid(8, 8)
    pts = np.array([[0.13, 0.77], [0.5, 0.5], [0.99, 0.01]])
    probe = Probe(grid, pts)
    # linear field is reproduced exactly by P1 interpolation
    u = jnp.asarray(1.0 + 2.0 * grid.node_coords[:, 0]
                    - 0.5 * grid.node_coords[:, 1])
    got = np.asarray(probe(u))
    expect = 1.0 + 2.0 * pts[:, 0] - 0.5 * pts[:, 1]
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    # batched
    U = jnp.stack([u, 2 * u])
    assert probe(U).shape == (2, 3)


def test_qoi_point_and_subdomain():
    grid = fem.StructuredTriGrid(8, 8)
    qoi_pt = QOI(grid, mx=0.25, my=0.75)
    u = jnp.asarray(grid.node_coords[:, 0])
    np.testing.assert_allclose(float(qoi_pt.extract(u)), 0.25, rtol=1e-12)
    # subdomain integral of u=1 over |x-.5|<=.25, |y-.5|<=.25 => area 0.25
    qoi_int = QOI(grid, mx=0.5, my=0.5, L=0.25)
    ones = jnp.ones(grid.n_nodes)
    np.testing.assert_allclose(float(qoi_int.extract(ones)), 0.25, rtol=1e-10)
    # restricted + scatter path
    prof = fem.DirichletProfile(grid)
    y_free = jnp.asarray(np.asarray(u)[prof.free_dofs])[None, :]
    bcv = prof.constrained_values(jnp.array([[0.0, 0.0, 1.0, 1.0]]))
    np.testing.assert_allclose(
        np.asarray(qoi_pt.extract(y_free, bc_values=bcv, profile=prof)),
        [0.25], rtol=1e-10)


def test_optimize_effective_properties_fits():
    physics = fem.make_fom_rom_pair("NDP", 2, 2, 2)
    g = ReducedOrderModelOperator.from_physics(physics)
    rng = np.random.default_rng(0)
    N = 4
    logX_true = jnp.asarray(rng.normal(0, 0.2, (N, g.dim_effective_property)))
    bce = fem.BoundaryConditionEnsemble.from_factory("NDP", N, rng)
    bce.register_function_space("rom", physics["rom"].grid)
    F = jnp.asarray(bce.full_f_with_applied_bc("rom"))
    Y = g.forward_mean(logX_true, F)
    logX, Y_pred, obj = optimize_effective_properties(
        g, g.init_params(jnp.float64), Y, F, num_iterations=400, lr=5e-2)
    assert obj[-1] < 1e-2 * obj[0]
    rel = float(jnp.linalg.norm(Y_pred - Y) / jnp.linalg.norm(Y))
    assert rel < 0.05


def test_reduced_order_model_solve_oracle():
    """Galerkin ROM with W spanning... cross-check: if W is square and full
    rank on the free dofs the Galerkin solve equals the full solve."""
    physics = fem.make_fom_rom_pair("NDP", 2, 2, 1)
    fom = physics["fom"]
    rng = np.random.default_rng(1)
    X_DG = rng.normal(0, 0.3, (2, fom.grid.n_cells))
    bce = fem.BoundaryConditionEnsemble.from_factory("NDP", 2, rng)
    bce.register_function_space("fom", fom.grid)
    vals = bce.constrained_values("fom")
    W_full = np.eye(fom.dim_out)[:, :-1]  # tall full-rank-ish
    Y_rom = reduced_order_model_solve(fom, physics["W"], X_DG, vals)
    assert Y_rom.shape == (2, fom.dim_out)
    # coarse galerkin must be a reasonable approximation of the fine solve
    Y_fine = np.stack([fom.solve_direct(np.exp(X_DG[n]), vals[n])
                       for n in range(2)])
    rel = np.linalg.norm(Y_rom - Y_fine) / np.linalg.norm(Y_fine)
    assert rel < 0.5


def test_mlp_linear_decay():
    assert architecture_from_linear_decay(100, 10, 2) == [70, 40]
    net = FeedforwardNeuralNetwork.from_linear_decay(20, 5, 2)
    x = jnp.zeros((3, 20))
    variables = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(variables, x).shape == (3, 5)


def test_batch_samplers():
    s = BatchedOverSampler(batch_size=4, num_batches=3, num_data=10)
    batches = list(s.batches(jax.random.PRNGKey(0)))
    assert len(batches) == 3
    assert all(b.shape == (4,) for b in batches)
    assert all(int(b.max()) < 10 for b in batches)

    ds = TensorDataset((jnp.arange(10), jnp.arange(10) * 2))
    a, b = ds[batches[0]]
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a))

    idx = minibatch_indices(jax.random.PRNGKey(1), 10, 5)
    assert len(set(np.asarray(idx).tolist())) == 5  # without replacement


def test_parameter_study(tmp_path):
    study = ParameterStudy([("n", int), ("lr", float)])
    study.accumulate((4, 0.1), {"err": 1.0})
    study.accumulate((4, 0.1), {"err": 0.9})
    study.accumulate((8, 0.1), {"err": 0.5})
    assert study.num_results((4, 0.1)) == 2
    assert (4, 0.1) in study and (16, 0.1) not in study
    with pytest.raises(TypeError):
        study.accumulate((4.5, 0.1), {})
    sl = study.slice(lr=0.1)
    assert len(sl) == 2
    study.notify_about_error_from_key((8, 0.1), ValueError("boom"))
    assert study.num_errors == 1
    path = str(tmp_path / "study.json")
    study.save(path)
    study2 = ParameterStudy.load(path)
    assert study2.get((4, 0.1)) == study.get((4, 0.1))
    assert study2.num_errors == 1

    other = ParameterStudy([("n", int), ("lr", float)])
    other.accumulate((16, 0.2), {"err": 0.1})
    study.merge(other)
    assert (16, 0.2) in study


def test_results_database(tmp_path):
    db = ResultsDatabase()
    db.add_result("a", 1.5)
    assert not db.check_complete("a")
    db.mark_complete("a")
    assert db.check_complete("a")
    with pytest.raises(KeyError):
        db.mark_complete("zzz")
    path = str(tmp_path / "db.json")
    db.save(path)
    db2 = ResultsDatabase.load(path)
    assert db2.get_result("a") == 1.5 and db2.check_complete("a")


def test_pool_boy_collects_with_failures(tmp_path):
    study = ParameterStudy([("i", int)])

    def work(i):
        if i == 2:
            raise RuntimeError("fail")
        return i * i

    with DummyProcessPool() as pool:
        jobs = [((i,), pool.submit(work, i)) for i in range(4)]
        boy = ParallelStudyPoolBoy(study, save_path=str(tmp_path / "s.json"))
        boy.collect(jobs)
    assert boy.num_failures == 1
    assert study.get((3,)) == [9]
    assert study.errors((2,))

    with ThreadPool(MAXWORKERS=2) as pool:
        jobs = [((i,), pool.submit(work, i)) for i in (0, 1)]
        boy = ParallelStudyPoolBoy(ParameterStudy([("i", int)]))
        st = boy.collect(jobs)
    assert st.get((1,)) == [1]


def test_timers():
    import time as _t
    sw = StopWatch(start=True)
    _t.sleep(0.01)
    assert sw.stop() > 0
    t = Timer(100)
    _t.sleep(0.01)
    assert "s" in t.RRT(10)
    t.enter("phase")
    _t.sleep(0.01)
    t.exit("phase")
    assert "phase" in t.report()


def test_conversions():
    import scipy.sparse as sp
    from generative_physics_informed_pde_tpu.utils.conversions import (
        convert_scipy_sparse_to_bcoo, convert_scipy_sparse_to_dense)
    A = sp.random(6, 5, density=0.4, random_state=0, format="csr")
    B = convert_scipy_sparse_to_bcoo(A)
    np.testing.assert_allclose(np.asarray(B.todense()),
                               np.asarray(A.todense()), rtol=1e-12)
    D = convert_scipy_sparse_to_dense(A)
    np.testing.assert_allclose(np.asarray(D), np.asarray(A.todense()))


def test_dummy_future_none_result_runs_once():
    """A function legitimately returning None must execute exactly once
    across compute()/result()/exception() (round-5 review: keying
    done-ness on _results is None re-ran side effects)."""
    calls = []

    def fn():
        calls.append(1)

    pool = DummyProcessPool()
    fut = pool.submit(fn)
    assert fut.result() is None
    assert fut.exception() is None
    assert fut.result() is None
    assert len(calls) == 1, calls


def test_thread_pool_exception_duck_type():
    """With exceptions activated, ThreadPool futures RAISE from
    exception()/compute() like DummyFuture -- error handling written
    against DummyProcessPool keys on that."""
    def boom():
        raise RuntimeError("case failed")

    with ThreadPool(MAXWORKERS=1) as pool:
        fut = pool.submit(boom)          # catching (default)
        assert isinstance(fut.exception(), RuntimeError)
        pool.activate_exceptions()
        fut2 = pool.submit(boom)         # non-catching
        with pytest.raises(RuntimeError, match="case failed"):
            fut2.exception()
        ok = pool.submit(lambda: 42)
        assert ok.result() == 42 and ok.exception() is None


def test_data_factory_cache_staleness(tmp_path, recwarn):
    """The identifier-keyed disk cache must invalidate when the preset's
    parameters change, not silently load stale data."""
    from generative_physics_informed_pde_tpu.factories.data import (
        DataFactory)
    from generative_physics_informed_pde_tpu.fem import GaussianRandomField

    class Tiny(DataFactory):
        _identifier = "tinytest"
        _N = 6
        _N_unsupervised = 4
        _rfs = GaussianRandomField.from_image(8, 8, 0.0, 1.0, 0.3)

    path = str(tmp_path) + "/"
    dl1, _ = Tiny(path=path).setup()
    assert dl1.N == 6
    # same params: cache hit, no warning
    n_warn = len(recwarn)
    dl2, _ = Tiny(path=path).setup()
    assert dl2.N == 6 and len(recwarn) == n_warn
    # changed N: stale cache detected, resampled
    class Tiny2(Tiny):
        _identifier = "tinytest"
        _N = 10
    with pytest.warns(RuntimeWarning, match="stale"):
        dl3, _ = Tiny2(path=path).setup()
    assert dl3.N == 10
