"""End-to-end training: data pipeline, trainer smoke runs (with and
without virtual observables), schedules, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation, make_schedule,
    PlateauController, MetricsWriter)


@pytest.fixture(scope="module")
def _raw_fields():
    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    X = np.asarray(rf.sample(jax.random.PRNGKey(0), batch_size=28))
    Xu = np.asarray(rf.sample(jax.random.PRNGKey(1), batch_size=32))
    return X, Xu


@pytest.fixture()
def small_loaders(_raw_fields):
    # fresh loaders per test: partitions are single-use (like the reference)
    X, Xu = _raw_fields
    dl = DataLoader(X.copy())
    dlu = DataLoader(Xu.copy())
    dlu.lock_physics_assembly()
    return dl, dlu


def _params(**data_overrides):
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True
    p.trainer["lr_init"] = 1e-2
    p.trainer["N_monitor_interval"] = 10
    p.scheduler = {"milestones": [10], "factor": 0.5}
    p.data.update(N_u=16, N_s=12, N_u_max=16, N_s_max=12, N_vo_max=0,
                  N_vo=0, N_val=8, armortized_bs=8, vo_spec={})
    p.data.update(data_overrides)
    return p


def test_dataloader_partitions(small_loaders):
    dl, _ = small_loaders
    physics = fem.make_fom_rom_pair("NDP", 4, 4, 3)
    dl2 = DataLoader(dl.X.copy())
    dl2.assemble(physics, rng=np.random.default_rng(0))
    assert dl2.Y.shape == (28, physics["fom"].dim_out)
    dl2.randomized_partition({"supervised": 12, "validation": 8},
                             rng=np.random.default_rng(1))
    ds = dl2.construct_dataset_dictionary(identifier="default",
                                          dtype=jnp.float32)
    sup, val = ds["supervised"], ds["validation"]
    assert sup.N == 12 and val.N == 8
    assert set(sup.indices).isdisjoint(set(val.indices))
    sup.restrict(6)
    assert sup.N == 6 and sup.get("X").shape[0] == 6
    sup.restrict(12)
    # grow from the 8 unassigned samples
    sup.grow_in_size(4, incremental=True)
    assert sup.N == 16
    with pytest.raises(ValueError):
        sup.grow_in_size(100, incremental=True)
    # labels match direct solves
    X_DG = np.asarray(dl2.X_DG)
    vals = dl2.BCE.constrained_values("fom")
    y0 = physics["fom"].solve_direct(np.exp(X_DG[0]), vals[0])
    np.testing.assert_allclose(dl2.Y[0], y0, rtol=1e-6, atol=1e-8)
    # F_ROM_BC: zeros except Dirichlet values at constrained rom dofs
    F = dl2.F_ROM_BC
    rom_con = physics["rom"].constrained_dofs
    mask = np.zeros(F.shape[1], bool)
    mask[rom_con] = True
    assert np.all(F[:, ~mask] == 0)
    np.testing.assert_allclose(F[:, rom_con],
                               dl2.BCE.constrained_values("rom"))


def test_dataloader_roundtrip(tmp_path, small_loaders):
    dl, _ = small_loaders
    path = str(tmp_path / "fields.npz")
    dl.save(path)
    dl2 = DataLoader.from_file(path)
    np.testing.assert_allclose(dl2.X, dl.X)
    assert dl2.hash == dl.hash
    with pytest.raises(ValueError):
        dl.save(str(tmp_path / "fields.dat"))  # np.savez would write .npz


def test_dataloader_guards(small_loaders):
    """Validation guards: bad permutations, negative restrict, BCE
    access before assembly, mismatched BCE length."""
    dl, _ = small_loaders
    physics = fem.make_fom_rom_pair("NDP", 4, 4, 3)
    dl2 = DataLoader(dl.X.copy())
    with pytest.raises(RuntimeError):
        dl2.BCE  # not assembled yet
    with pytest.raises(ValueError):  # duplicate entries leak samples
        dl2.randomized_partition({"supervised": 4},
                                 permutation=np.zeros(dl2.N, dtype=int))
    with pytest.raises(ValueError):  # wrong length
        dl2.randomized_partition({"supervised": 4},
                                 permutation=np.arange(dl2.N - 1))
    rng = np.random.default_rng(0)
    bce_wrong = fem.BoundaryConditionEnsemble.from_factory(
        "NDP", dl2.N + 3, rng)
    bce_wrong.register_function_space("fom", physics["fom"].grid)
    bce_wrong.register_function_space("rom", physics["rom"].grid)
    with pytest.raises(ValueError):
        dl2.assemble(physics, BCE=bce_wrong)
    dl2.assemble(physics, rng=np.random.default_rng(0))
    dl2.randomized_partition({"supervised": 8}, rng=np.random.default_rng(1))
    ds = dl2.construct_dataset_dictionary(identifier="default",
                                          dtype=jnp.float32)["supervised"]
    with pytest.raises(ValueError):
        ds.restrict(-3)


@pytest.mark.slow
def test_trainer_smoke(small_loaders, tmp_path):
    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    tr.run(22, verbose=False)
    res = tr.results()
    assert np.isfinite(res["relerr_y"]) and np.isfinite(res["logscore_y"])
    # elbo should improve over the run
    elbos = tr._monitor["elbo"]
    assert len(elbos) >= 2 and elbos[-1] > elbos[0]
    tr.finalize()
    assert (tmp_path / "metrics.jsonl").exists()


def test_trainer_micro_smoke(small_loaders, tmp_path):
    """Fast end-to-end trainer coverage for the `-m "not slow"` gate:
    a single SVI step (the n_steps==1 program, no scan compile) + the
    final analysis eval — two compiled programs total.  The full
    22-iteration smoke with its scan-10/scan-1/final-PE programs runs
    under -m slow."""
    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    params.trainer["N_monitor_interval"] = 0
    params.trainer["N_PE_updates_final"] = 0
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    tr.run(1, verbose=False)
    res = tr.results()
    assert np.isfinite(res["relerr_y"]) and np.isfinite(res["logscore_y"])
    # train -> deployable: export the trained surrogate and check it
    # serves the validation fields identically to the in-process model
    bundle = tr.export_surrogate(str(tmp_path / "surrogate.zip"),
                                 buckets=(4,))
    X_val = tr.datasets["validation"].get("X")[:3]
    F_val = tr.datasets["validation"].get("F_ROM_BC")[:3]
    served = bundle.predict(X_val, F_val)
    direct = tr.discriminative_model(tr.state.params, tr.state.batch_stats,
                                     X_val, F_val)
    np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)
    tr.finalize()
    assert (tmp_path / "metrics.jsonl").exists()


def test_prediction_ensemble_bf16_hot_loop(small_loaders, tmp_path):
    """PE_compute_dtype='bfloat16': the inner SVI decodes through a bf16
    clone of the decoder (validation-only, cannot perturb training), while
    ``final=True`` (the finalize-time refinement) runs the unmodified f32
    module -- it must be bit-identical to a compute_dtype=None ensemble."""
    import dataclasses

    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    params.trainer["N_monitor_interval"] = 0
    params.trainer["N_PE_updates_final"] = 1
    params.trainer["PE_compute_dtype"] = "bfloat16"
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    q0 = jax.tree_util.tree_map(np.asarray, tr.state.pe_q)
    tr.run(2, verbose=False)
    res = tr.results()
    assert np.isfinite(res["relerr_y"]) and np.isfinite(res["logscore_y"])
    q1 = jax.tree_util.tree_map(np.asarray, tr.state.pe_q)
    assert all(np.all(np.isfinite(leaf))
               for leaf in jax.tree_util.tree_leaves(q1))
    assert not np.allclose(q0["mean"], q1["mean"])  # the bf16 loop moved q

    # final=True bypasses the bf16 clone: identical to an f32 ensemble
    pe32 = dataclasses.replace(tr._PE, compute_dtype=None)
    k = jax.random.PRNGKey(3)
    e_final = jax.jit(lambda q: tr._PE.elbo(
        tr.state.params, tr.state.batch_stats, q, k, final=True)[0])(
            tr.state.pe_q)
    e_f32 = jax.jit(lambda q: pe32.elbo(
        tr.state.params, tr.state.batch_stats, q, k)[0])(tr.state.pe_q)
    assert float(e_final) == float(e_f32)
    # and the bf16 hot-loop elbo differs only by rounding noise
    e_bf16 = jax.jit(lambda q: tr._PE.elbo(
        tr.state.params, tr.state.batch_stats, q, k)[0])(tr.state.pe_q)
    assert np.isfinite(float(e_bf16))
    np.testing.assert_allclose(float(e_bf16), float(e_f32), rtol=0.05)
    tr.finalize()  # exercises the final=True jitted refinement


def test_pe_compute_dtype_auto_resolution(small_loaders, tmp_path):
    """'auto' (the default) resolves by decode grid: bf16 only >= 128^2
    where the A/B measured a win; None below (PARITY round 4)."""
    import jax.numpy as jnp
    from generative_physics_informed_pde_tpu.training.trainer import (
        resolve_pe_compute_dtype)

    assert resolve_pe_compute_dtype("auto", (8, 128, 128)) == jnp.bfloat16
    assert resolve_pe_compute_dtype("auto", (8, 256, 128)) == jnp.bfloat16
    assert resolve_pe_compute_dtype("auto", (8, 64, 64)) is None
    assert resolve_pe_compute_dtype("auto", (8, 128, 64)) is None
    assert resolve_pe_compute_dtype(None, (8, 128, 128)) is None
    assert resolve_pe_compute_dtype("bfloat16", (8, 8, 8)) == jnp.bfloat16

    # a small-grid trainer under the default config gets a None PE dtype
    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert tr._PE.compute_dtype is None


def test_pe_interval_training_invariant(small_loaders, tmp_path):
    """N_PE_interval > 1 skips PE inner updates on off-cadence steps.  The
    PE posterior never feeds back into model parameters or batch stats
    (PredictionEnsemble.elbo discards the BN update), so the TRAINING
    trajectory must match the every-step cadence; and pe_q must only move
    on cadence steps."""
    dl, dlu = small_loaders
    trs = {}
    for interval in (1, 3):
        d2 = DataLoader(dl.X.copy())
        d2u = DataLoader(dlu.X.copy())
        d2u.lock_physics_assembly()
        params = _params()
        params.folder = str(tmp_path / f"i{interval}")
        params.trainer["N_monitor_interval"] = 0
        params.trainer["N_PE_updates_final"] = 0
        params.trainer["N_PE_interval"] = interval
        trs[interval] = CreateTrainerFromPermutation(
            params, permutation=np.arange(d2.N),
            permutation_u=np.arange(d2u.N), dl=d2, dlu=d2u)

    # drive the jitted step directly: Trainer.run's end-of-run PE
    # refinement (N_PE_updates_final, = 5 under the debug shadow) would
    # otherwise move q every call and mask the cadence
    def one_step(tr):
        dummy = tuple(jnp.zeros((1, 1), dtype=tr.dtype) for _ in range(2))
        tr.state, logs = tr._train_step(tr.state, *dummy, holdoff=False,
                                        n_steps=1)
        return logs

    # interval=3 trainer: q moves at state.step 0 (0 % 3 == 0), is frozen
    # at steps 1 and 2, moves again at step 3
    tr3 = trs[3]
    q0 = np.asarray(tr3.state.pe_q["mean"])
    one_step(tr3)
    q1 = np.asarray(tr3.state.pe_q["mean"])
    assert not np.allclose(q0, q1)
    logs = one_step(tr3)            # step 1: off-cadence
    assert np.isnan(float(logs["PredictionEnsemble/elbo"]))
    one_step(tr3)                   # step 2: off-cadence
    np.testing.assert_array_equal(q1, np.asarray(tr3.state.pe_q["mean"]))
    logs = one_step(tr3)            # step 3: on-cadence
    assert not np.allclose(q1, np.asarray(tr3.state.pe_q["mean"]))
    assert np.isfinite(float(logs["PredictionEnsemble/elbo"]))

    for _ in range(4):
        one_step(trs[1])
    p1 = jax.tree_util.tree_leaves(trs[1].state.params)
    p3 = jax.tree_util.tree_leaves(tr3.state.params)
    for a, b in zip(p1, p3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_pe_schedule_scales_with_interval(small_loaders, tmp_path,
                                          monkeypatch):
    """The PE inner Adam advances N_PE_updates counts only every
    N_PE_interval-th training step, so the trainer must convert schedule
    milestones (in training iterations) with steps_per_update =
    N_PE_updates / N_PE_interval -- otherwise the PE lr would decay
    interval-times too late in training-step terms."""
    import generative_physics_informed_pde_tpu.training.trainer as trmod

    calls = []
    orig = trmod.make_schedule

    def spy(spec, lr, steps_per_update=1):
        calls.append(steps_per_update)
        return orig(spec, lr, steps_per_update)

    monkeypatch.setattr(trmod, "make_schedule", spy)
    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    params.trainer["N_PE_interval"] = 4
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    # the debug shadow may override N_PE_updates -- read the effective one
    expected = tr.get("N_PE_updates") / 4
    assert expected != tr.get("N_PE_updates")  # interval actually scales
    assert expected in calls, (expected, calls)


def test_pe_interval_monitor_burst(small_loaders, tmp_path):
    """At a monitor point with N_PE_interval > 1 the trainer re-converges
    the PE posterior with a burst and records FINITE post-burst PE metrics
    (off-cadence steps log NaN internally)."""
    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    params.trainer["N_PE_interval"] = 3
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    q0 = np.asarray(tr.state.pe_q["mean"])
    # under the debug shadow N_monitor_interval=5: the monitor fires after
    # iteration n_last=5 (state.step 5, off-cadence for interval 3 -> the
    # step itself logs NaN PE metrics and the burst must substitute finite
    # ones)
    tr.run(6, verbose=False)
    series = tr.writer.scalars["PredictionEnsemble/elbo"]
    assert len(series) >= 1
    assert all(np.isfinite(v) for _, v in series)
    res = tr.results()
    assert np.isfinite(res["relerr_y"]) and np.isfinite(res["logscore_y"])
    # the burst moved q even though step 3 (the monitor step) is on-cadence
    # for its own update too
    assert not np.allclose(q0, np.asarray(tr.state.pe_q["mean"]))


def test_trainer_halts_on_divergence(small_loaders, tmp_path):
    """A non-finite ELBO at a monitor point raises TrainingDivergedError
    instead of silently stepping on NaNs for the rest of a long run.

    Deliberately in the FAST gate (~24 s: one debug-shadow trainer compile
    + 6 steps): it guards the NaN-halt safety net for long runs, and a
    regression here must not hide behind the ~20-min full suite (ADVICE
    r3)."""
    from generative_physics_informed_pde_tpu.training import (
        TrainingDivergedError)
    dl, dlu = small_loaders
    params = _params()
    params.folder = str(tmp_path)
    params.trainer["N_PE_updates_final"] = 0
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    tr.state = tr.state.replace(params=jax.tree_util.tree_map(
        lambda x: x * jnp.nan, tr.state.params))
    # debug shadow pins N_monitor_interval=5: the first monitor point (and
    # the guard) fires after executing iteration 5
    with pytest.raises(TrainingDivergedError, match="iteration 5"):
        tr.run(6, verbose=False)


@pytest.mark.slow
def test_trainer_zero_labels_vo_only(small_loaders):
    """N_s=0: the zero-label regime of the reference thesis (readme.md:3-8,
    'little or NO labeled data').  The supervised ELBO term is disabled,
    virtual observables + the amortized unlabeled term carry all signal;
    the run must stay finite and the VO machinery must engage."""
    dl, dlu = small_loaders
    params = _params(N_s=0, N_s_max=0, N_vo=6, N_vo_max=6,
                     vo_spec={"type": "constrain", "CGR": True, "flux": True,
                              "N_gaussian": 2, "N_rbf": 2, "l_rbf": 0.2})
    params.trainer["N_vo_holdoff"] = 3
    params.trainer["N_vo_update_interval"] = 5
    params.trainer["N_PE_updates_final"] = 0
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert tr.model.disable_elbo_supervised
    assert tr.use_vo()
    tr.run(8, verbose=False)
    assert tr._vo_is_initialized
    res = tr.results()
    assert np.isfinite(res["relerr_y"]) and np.isfinite(res["logscore_y"])
    elbos = tr._monitor["elbo"]
    assert all(np.isfinite(e) for e in elbos)
    # the 0-row supervised q_z block stays in the pytree for shape parity
    assert tr.state.params["q_z"]["supervised"]["mean"].shape[0] == 0


@pytest.mark.slow
def test_trainer_with_virtual_observables(small_loaders):
    dl, dlu = small_loaders
    params = _params(N_vo=6, N_vo_max=6, N_s=8, N_s_max=8,
                     vo_spec={"type": "constrain", "CGR": True, "flux": True,
                              "N_gaussian": 2, "N_rbf": 2, "l_rbf": 0.2})
    params.trainer["N_vo_holdoff"] = 3
    params.trainer["N_vo_update_interval"] = 5
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert tr.use_vo()
    tr.run(12, verbose=False)
    assert tr._vo_is_initialized
    assert tr.VO.mean.shape == (6, tr.physics["fom"].dim_out)
    assert bool(jnp.all(jnp.isfinite(tr.VO.mean)))
    res = tr.results()
    assert np.isfinite(res["logscore_y"])


@pytest.mark.slow
def test_trainer_vo_checkpoint_resume(small_loaders, _raw_fields, tmp_path):
    """Resume of a constrain-VO run self-heals: the VO posterior is NOT
    checkpointed (model-derived state -- see Trainer.save_checkpoint), so
    after restore the first step must recondition it
    (_vo_is_initialized False -> update_vo fires) and training must
    continue with finite metrics."""
    X, Xu = _raw_fields
    spec = {"type": "constrain", "CGR": True, "flux": True,
            "N_gaussian": 2, "N_rbf": 2, "l_rbf": 0.2}

    def make():
        dl, dlu = DataLoader(X.copy()), DataLoader(Xu.copy())
        dlu.lock_physics_assembly()
        p = _params(N_vo=6, N_vo_max=6, N_s=8, N_s_max=8, vo_spec=spec)
        p.trainer["N_vo_holdoff"] = 3
        p.trainer["N_vo_update_interval"] = 5
        return CreateTrainerFromPermutation(
            p, permutation=np.arange(dl.N), permutation_u=np.arange(dlu.N),
            dl=dl, dlu=dlu)

    tr = make()
    tr.run(12, verbose=False)
    assert tr._vo_is_initialized
    path = tr.save_checkpoint(str(tmp_path / "ck"))

    tr2 = make()  # fresh trainer, same data/keys
    tr2.restore_checkpoint(path)
    assert tr2.gn == 12 and not tr2._vo_is_initialized
    tr2.run(6, verbose=False)
    assert tr2._vo_is_initialized  # reconditioned at the first resume step
    assert bool(jnp.all(jnp.isfinite(tr2.VO.mean)))
    assert np.isfinite(tr2.results()["logscore_y"])


@pytest.mark.slow
def test_trainer_energy_vo_end_to_end(small_loaders):
    """Train >=200 iterations with energy-VOs and an annealing temperature
    schedule: the ELBO must improve and the VO means must approach the
    true PDE solutions of the unlabeled fields (reference:
    VirtualObservables.py:672-793 + the 1001-1091 schedule-driven
    ensemble, exercised end-to-end through Trainer.run)."""
    dl, dlu = small_loaders
    n_steps = 220
    params = _params(N_vo=6, N_vo_max=6, N_s=8, N_s_max=8,
                     vo_spec={"type": "energy", "l_rbf": 0.2, "N_rbf": 24,
                              "energy_num_iterations_per_update": 8,
                              "T_init": 1.0, "T_final": 1e-6,
                              "T_iterations": n_steps + 1})
    params.trainer["N_vo_holdoff"] = 3
    params.trainer["N_vo_update_interval"] = 5
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert tr.use_vo()
    tr.run(n_steps, verbose=False)
    assert tr._vo_is_initialized
    assert tr.VO.temperature < 1e-4  # schedule actually annealed
    elbos = tr._monitor["elbo"]
    assert len(elbos) >= 2 and elbos[-1] > elbos[0]
    # at low temperature the energy minimizer is the true solution K^-1 f:
    # the VO means must be close to direct solves of the vo fields
    fom = tr.physics["fom"]
    ds_vo = tr.datasets["vo"]
    X_DG = np.asarray(ds_vo.get("X_DG"))
    vals = np.asarray(ds_vo.get("BCE").constrained_values("fom"))
    Y_true = np.stack([fom.solve_direct(np.exp(x), v)
                       for x, v in zip(X_DG, vals)])
    rel = (np.linalg.norm(np.asarray(tr.VO.mean) - Y_true, axis=1)
           / np.linalg.norm(Y_true, axis=1))
    assert np.all(np.isfinite(rel)) and rel.mean() < 0.30, rel


@pytest.mark.slow
def test_trainer_nonamortized_unsupervised(small_loaders):
    dl, dlu = small_loaders
    params = _params(armortized_bs=None)
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert tr.model.encoder is None
    assert "unsupervised" in tr.state.params["q_z"]
    tr.run(6, verbose=False)


def test_schedules():
    sched = make_schedule({"milestones": [10, 20], "factor": 0.5}, 1.0)
    assert float(sched(0)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(25)) == 0.25
    # fractional steps_per_update: an optimiser gated to every k-th
    # training step advances updates/k counts per iteration (the PE inner
    # Adam under N_PE_interval) -- milestone 100 with 3 updates every 4
    # steps lands at inner count round(100 * 0.75) = 75
    sched_frac = make_schedule({"milestones": [100], "factor": 0.5}, 1.0,
                               steps_per_update=0.75)
    assert float(sched_frac(74)) == 1.0
    assert float(sched_frac(75)) == 0.5
    sched_frac2 = make_schedule({"step_size": 100, "factor": 0.1}, 1.0,
                                steps_per_update=0.75)
    np.testing.assert_allclose(float(sched_frac2(75)), 0.1, rtol=1e-6)
    sched2 = make_schedule({"step_size": 10, "factor": 0.1}, 1.0)
    np.testing.assert_allclose(float(sched2(10)), 0.1, rtol=1e-6)
    sched3 = make_schedule(None, 3.0)
    assert float(sched3(1000)) == 3.0
    with pytest.raises(ValueError, match="lr_init"):
        make_schedule({"milestones": [10], "factor": 0.5}, None)

    pc = PlateauController(patience=2, factor=0.1, min_lr=1e-3, lr_init=1.0)
    for _ in range(2):
        pc.step(1.0)
    assert pc.scale == 1.0
    for _ in range(4):
        pc.step(0.5)  # not improving
    assert pc.scale == pytest.approx(0.1)


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path), logging_interval=2)
    w.add_scalar("a/b", 1.0, 0)
    w.add_scalar("a/b", 2.0, 1)   # throttled out
    w.add_scalar("a/b", 3.0, 2)
    assert [v for _, v in w.scalars["a/b"]] == [1.0, 3.0]
    w.close()


@pytest.mark.slow
def test_trainer_zero_unsupervised(small_loaders):
    """N_u=0 with a leftover 'unsupervised' chunk must cleanly disable the
    unsupervised ELBO term (regression: the amortized minibatch draw used
    a None batch size)."""
    dl, dlu = small_loaders
    params = _params(N_u=0, armortized_bs=None)
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert "unsupervised" not in (tr.datasets or {})
    tr.run(3, verbose=False)
    assert np.isfinite(tr._monitor["elbo"][-1] if tr._monitor["elbo"]
                       else 0.0)


def test_assemble_retries_transient_runtime_errors(monkeypatch, _raw_fields):
    """Label solves retry when the (tunneled) runtime throws a transient
    JaxRuntimeError, and the labels still come out correct."""
    import generative_physics_informed_pde_tpu.data.loader as loader_mod

    X, _ = _raw_fields
    dl = DataLoader(X[:6].copy())
    physics = fem.make_fom_rom_pair("NDP", 4, 4, 3)
    fom = physics["fom"]
    real_solve = fom.solve_batched
    calls = {"n": 0}

    def flaky(alpha, vals):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError("TPU worker restarted (fake)")
        return real_solve(alpha, vals)

    monkeypatch.setitem(fom.__dict__, "solve_batched", flaky)
    monkeypatch.setattr(loader_mod.time, "sleep", lambda s: None)
    dl.assemble(physics, rng=np.random.default_rng(0))
    assert calls["n"] >= 2  # first dispatch failed, retry succeeded
    vals = dl.BCE.constrained_values("fom")
    y0 = fom.solve_direct(np.exp(np.asarray(dl.X_DG[0])), vals[0])
    np.testing.assert_allclose(dl.Y[0], y0, rtol=1e-6, atol=1e-8)


def test_assemble_bool_mask_rows(small_loaders):
    """assemble(rows=<bool mask>) honors numpy mask semantics -- an int64
    cast would silently solve rows {0,1} repeatedly and leave the
    intended rows NaN."""
    dl, _ = small_loaders
    physics = fem.make_fom_rom_pair("NDP", 4, 4, 3)
    mask = np.zeros(dl.N, dtype=bool)
    mask[[1, 4]] = True
    dl.assemble(physics, rows=mask)
    assert np.isfinite(dl.Y[[1, 4]]).all()
    other = np.flatnonzero(~mask)
    assert np.isnan(dl.Y[other]).all()


def test_multistep_lr_colliding_milestones_accumulate():
    """Milestones that round to the same update count (fractional
    steps_per_update) must each still apply their decay factor."""
    from generative_physics_informed_pde_tpu.training.schedules import (
        multistep_lr)

    # 0.375 steps/update: milestones 1 and 2 both land on update 1
    sched = multistep_lr(1.0, [1, 2], 0.1, steps_per_update=0.375)
    assert abs(float(sched(0)) - 1.0) < 1e-12
    assert abs(float(sched(1)) - 0.01) < 1e-12  # factor applied TWICE


def test_create_trainer_permutation_none(small_loaders):
    """The advertised permutation=None default must work: the loader
    draws its own permutation (round-5 review: an assert crashed on
    len(None) before that path was reachable)."""
    dl, dlu = small_loaders
    p = _params()
    tr = CreateTrainerFromPermutation(p, dl=dl, dlu=dlu)
    tr.setup(scheduler_spec=p.scheduler)
    tr.run(2, verbose=False)
    assert np.isfinite(tr._monitor["elbo"][-1] if tr._monitor["elbo"]
                       else 0.0)


def test_from_sampler_generic_fallback_chunks():
    """A sampler exposing only .sample is drawn in chunks bounded by its
    max_sample_batch, not one unchunked N-sized draw."""
    calls = []

    class Stub:
        max_sample_batch = 4

        def sample(self, key, batch_size, dtype=None):
            calls.append(batch_size)
            return jnp.zeros((batch_size, 8, 8))

    dl = DataLoader.from_sampler(Stub(), 10, key=jax.random.PRNGKey(0))
    assert dl.N == 10
    assert max(calls) <= 4 and sum(calls) == 10, calls
