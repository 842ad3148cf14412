"""Device meshes, sharded training state, device sweeps (8 virtual CPUs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.parallel import (
    make_mesh, batch_sharding, shard_data_dict, sweep_over_devices)
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation)


def test_make_mesh_and_shardings():
    mesh = make_mesh(8, ("dp",))
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, ("dp", "mc"), (4, 2))
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(10 ** 6)
    data = {"X": jnp.zeros((16, 4))}
    sharded = shard_data_dict(data, mesh)
    assert len(sharded["X"].sharding.device_set) == 8


def test_sweep_over_devices():
    mesh = make_mesh(8)

    def case_fn(args):
        return jnp.sum(args["a"] ** 2)

    cases = {"a": jnp.arange(32, dtype=jnp.float32).reshape(8, 4)}
    out = sweep_over_devices(case_fn, cases, mesh=mesh)
    expect = np.sum(np.arange(32, dtype=np.float32).reshape(8, 4) ** 2, 1)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_sweep_over_processes_error_semantics():
    """A case that raises is captured (multi-host: peers must reach the
    allgather, never deadlock on one host's exception), then either
    re-raised uniformly or returned as an ``__error__`` record."""
    from generative_physics_informed_pde_tpu import parallel

    def f(c):
        if c == 1:
            raise ValueError("boom")
        return c * 2

    with pytest.raises(RuntimeError, match="boom"):
        parallel.sweep_over_processes(f, [0, 1, 2])
    recs = parallel.sweep_over_processes(f, [0, 1, 2],
                                         return_exceptions=True)
    assert recs[0] == 0 and recs[2] == 4
    assert "__error__" in recs[1] and "boom" in recs[1]["__error__"]


def test_sweep_over_processes_kill_and_resume(tmp_path):
    """Durability (reference PoolBoy's periodic intermediate saves,
    utils/database.py:34-58): a sweep killed mid-way loses nothing --
    re-running with the same checkpoint_path skips every durably
    completed case, retries failures, and returns the full result
    list."""
    from generative_physics_informed_pde_tpu import parallel

    ckpt = str(tmp_path / "sweep")
    runs = []

    def fn(c):
        runs.append(c)
        if c == 3:  # the "kill": an uncatchable interrupt mid-sweep
            raise KeyboardInterrupt
        return {"val": c * 10}

    with pytest.raises(KeyboardInterrupt):
        parallel.sweep_over_processes(fn, list(range(6)),
                                      checkpoint_path=ckpt,
                                      save_interval_s=0.0)
    assert runs == [0, 1, 2, 3]  # died at case 3; 0-2 are durable

    def fn2(c):
        runs.append(c)
        return {"val": c * 10}

    out = parallel.sweep_over_processes(fn2, list(range(6)),
                                        checkpoint_path=ckpt,
                                        save_interval_s=0.0)
    # completed cases were NOT re-run; only 3 (retried) and 4, 5 ran
    assert runs == [0, 1, 2, 3, 3, 4, 5]
    assert [r["val"] for r in out] == [0, 10, 20, 30, 40, 50]
    # failed/error cases are also retried on resume, not resurrected
    def fn3(c):
        if c == 1:
            raise ValueError("flaky")
        return {"val": c}

    ckpt2 = str(tmp_path / "sweep2")
    recs = parallel.sweep_over_processes(fn3, [0, 1, 2],
                                         checkpoint_path=ckpt2,
                                         save_interval_s=0.0,
                                         return_exceptions=True)
    assert "__error__" in recs[1]
    out2 = parallel.sweep_over_processes(lambda c: {"val": c}, [0, 1, 2],
                                         checkpoint_path=ckpt2,
                                         save_interval_s=0.0)
    assert out2[1] == {"val": 1}


def test_distributed_initialize_inert_without_cluster_signals(monkeypatch):
    """With no coordinator args and no launcher env vars, initialize()
    must return False WITHOUT touching the jax backend or latching its
    idempotence flag -- a later explicit call must still be possible."""
    from generative_physics_informed_pde_tpu.parallel import distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "TPU_WORKER_ID", "TPU_WORKER_HOSTNAMES",
              "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_ID",
              "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setattr(distributed, "_initialized", False)
    assert distributed.initialize() is False
    assert distributed._initialized is False


@pytest.mark.slow
def test_uncertainty_sweep_sharded_matches_local():
    """The config-5 QOI sweep (examples/uncertainty_study.py) runs as one
    SPMD program with cases sharded over the mesh; sharded == unsharded."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "examples"))
    import uncertainty_study as us

    phys = fem.LinearEllipticPhysics("fom", "ND",
                                     fem.StructuredTriGrid(16, 16))
    lengths = (0.1, 0.2, 0.3, 0.4)
    mesh = make_mesh(8)  # 4 cases x B=8 flatten to 32, sharded over 8
    sharded = us.qoi_sweep(phys, lengths, B=8, mesh=mesh, n=16)
    local = us.qoi_sweep(phys, lengths, B=8, mesh=None, n=16)
    assert sharded["mean"].shape == (4,)
    for k in ("mean", "std", "p5", "p95"):
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(local[k]), rtol=1e-5,
                                   atol=1e-6)
        assert np.all(np.isfinite(np.asarray(sharded[k])))
    # the QOI must actually be informative (center pressure ~ 0.5 for the
    # 0->1 Dirichlet profile), not degenerate zeros
    assert np.all(np.asarray(local["mean"]) > 0.2)
    assert np.all(np.asarray(local["std"]) > 0.0)


def _make_trainer(mesh=None, seed=0, n_mc=1):
    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    dl = DataLoader.from_sampler(rf, 24, key=jax.random.PRNGKey(2))
    dlu = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(3))
    dlu.lock_physics_assembly()
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True
    p.seed = seed
    p.trainer["lr_init"] = 1e-2
    p.trainer["N_monte_carlo_elbo"] = n_mc
    p.scheduler = {"milestones": [50], "factor": 0.5}
    p.data.update(N_u=16, N_s=16, N_u_max=16, N_s_max=16, N_vo_max=0,
                  N_vo=0, N_val=8, armortized_bs=8, vo_spec={})
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    if mesh is not None:
        tr.setup(scheduler_spec=p.scheduler, mesh=mesh)
    return tr

@pytest.mark.slow
def test_sharded_training_matches_single_device():
    """The dp-sharded step computes the same math as the unsharded one
    (same seed, same data) -- sharding only changes the layout."""
    tr1 = _make_trainer(mesh=None, seed=11)
    tr8 = _make_trainer(mesh=make_mesh(8), seed=11)
    tr1.run(3, verbose=False)
    tr8.run(3, verbose=False)
    a = np.asarray(tr1.state.params["q_z"]["supervised"]["mean"])
    b = np.asarray(tr8.state.params["q_z"]["supervised"]["mean"])
    # f32 cross-device reduction order differs; a few Adam steps amplify
    # the last-ulp differences to ~1e-4 relative
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
    # the sharded run's per-datapoint block really lives on 8 devices
    sh = tr8.state.params["q_z"]["supervised"]["mean"].sharding
    assert len(sh.device_set) == 8


@pytest.mark.slow
def test_mc_sharded_training_matches_single_device():
    """SURVEY §2.7's MC-ELBO-sample axis: on a ("dp","mc") mesh with
    n_mc>1 the flattened (N*n_mc) supervised batch is spread over BOTH
    axes, and the math matches the unsharded step."""
    tr1 = _make_trainer(mesh=None, seed=13, n_mc=4)
    tr8 = _make_trainer(mesh=make_mesh(8, ("dp", "mc"), (4, 2)), seed=13,
                        n_mc=4)
    assert tr8.model.mc_sharding is not None
    assert tr1.model.mc_sharding is None
    tr1.run(3, verbose=False)
    tr8.run(3, verbose=False)
    a = np.asarray(tr1.state.params["q_z"]["supervised"]["mean"])
    b = np.asarray(tr8.state.params["q_z"]["supervised"]["mean"])
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
    # per-datapoint block: sharded over 'dp', replicated over 'mc' -- it
    # lives on all 8 devices of the (4,2) mesh
    sh = tr8.state.params["q_z"]["supervised"]["mean"].sharding
    assert len(sh.device_set) == 8


def _make_energy_vo_trainer(mesh=None, seed=0, iters=8):
    """Trainer with the production ENERGY-VO arm (8 labeled + 16 unlabeled
    + 8 energy-constrained fields), optionally dp-sharded."""
    from generative_physics_informed_pde_tpu.constraints import vo_spec_preset

    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    dl = DataLoader.from_sampler(rf, 24, key=jax.random.PRNGKey(2))
    dlu = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(3))
    dlu.lock_physics_assembly()
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True
    p.seed = seed
    p.trainer.update(lr_init=1e-2, N_vo_holdoff=0, N_vo_update_interval=2,
                     N_monte_carlo_vo=8)
    p.scheduler = {"milestones": [50], "factor": 0.5}
    p.data.update(N_u=16, N_s=8, N_u_max=16, N_s_max=8, N_vo_max=8,
                  N_vo=8, N_val=8, armortized_bs=8,
                  vo_spec=vo_spec_preset(
                      "energy", T_iterations=iters, N_rbf=4,
                      energy_num_iterations_per_update=2, T_final=1e-2))
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    if mesh is not None:
        tr.setup(scheduler_spec=p.scheduler, mesh=mesh)
    return tr


@pytest.mark.slow
def test_energy_vo_sharded_matches_single_device():
    """The production semi-supervised arm (energy-VO, PARITY VO ablation)
    under dp sharding: the randomized-subspace energy update, its
    host-side temperature schedule and the resulting training trajectory
    all match the unsharded run exactly (same seed, same data)."""
    tr1 = _make_energy_vo_trainer(mesh=None, seed=17)
    tr8 = _make_energy_vo_trainer(mesh=make_mesh(8), seed=17)
    tr1.run(5, verbose=False)
    tr8.run(5, verbose=False)
    # temperature schedule is host-driven: must advance identically and
    # have actually moved off T_init
    assert tr1.VO.temperature == tr8.VO.temperature
    assert tr1.VO.temperature < 1.0
    # the energy pseudo-label posteriors (VO means over 8 fields x free
    # dofs) agree across layouts
    a_vo = np.asarray(tr1.VO.mean)
    b_vo = np.asarray(tr8.VO.mean)
    assert np.all(np.isfinite(a_vo))
    np.testing.assert_allclose(a_vo, b_vo, rtol=5e-3, atol=1e-5)
    # and so does the trained per-datapoint posterior block
    a = np.asarray(tr1.state.params["q_z"]["supervised"]["mean"])
    b = np.asarray(tr8.state.params["q_z"]["supervised"]["mean"])
    np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
    sh = tr8.state.params["q_z"]["supervised"]["mean"].sharding
    assert len(sh.device_set) == 8


@pytest.mark.slow
def test_two_process_dcn_training_matches_single_process(tmp_path):
    """SURVEY §2.7's multi-host leg: two OS processes (4 virtual CPU
    devices each) join over TCP via jax.distributed, form one global
    hybrid (dcn=2 x dp=4) mesh -- the CPU stand-in for ICI-within-host +
    DCN-across-hosts -- and run the FULL trainer lifecycle sharded:
    per-host label assembly (each process solves only its shard's
    labels), 6 SVI steps with a monitor point, checkpoint save/restore
    across the process boundary, 2 resumed steps, finalize.  Everything
    must match the single-process 8-device run through the same
    lifecycle (same seed, same data).  Also exercises the host-sharded
    parameter study (parallel.sweep_over_processes), the reference's
    MPI-pool replacement (reference parallel/utils.py:50-74)."""
    import os
    import pathlib
    import socket
    import subprocess
    import sys as _sys

    # golden: the plain single-process 8-device run, same lifecycle
    tr8 = _make_trainer(mesh=make_mesh(8), seed=11)
    tr8.run(6, verbose=False)
    tr8.save_checkpoint(str(tmp_path / "golden_ckpt"))
    tr8.restore_checkpoint(str(tmp_path / "golden_ckpt"))
    tr8.run(2, verbose=False)
    tr8.finalize()
    golden = np.asarray(tr8.state.params["q_z"]["supervised"]["mean"])
    golden_elbo = np.asarray(tr8._monitor["elbo"])
    golden_r2 = np.asarray(tr8._analysis.series["r2_y"].value)

    with socket.socket() as s:  # free TCP port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    child = pathlib.Path(__file__).parent / "_dcn_child.py"
    out = tmp_path / "p0.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = str(pathlib.Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=4"])
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen(
        [_sys.executable, str(child), str(i), "2", str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for pr in procs:
        try:
            o, _ = pr.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            pr.kill()
            o, _ = pr.communicate()
        outs.append(o)
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"child {i} failed:\n{outs[i][-4000:]}"
    rec = np.load(out)
    q = rec["q"]
    assert q.shape == golden.shape
    # identical math, different process layout AND different mesh shape
    # (hybrid 2x4 vs flat 8): f32 cross-device reduction order differs,
    # and 8 Adam steps + a monitor burst amplify the last-ulp noise to
    # ~1e-3 relative on the q block (3-step runs sat at ~1e-4).  Check
    # the block as a whole tightly and elements loosely.
    rel_l2 = np.linalg.norm(q - golden) / np.linalg.norm(golden)
    assert rel_l2 < 2e-3, rel_l2
    np.testing.assert_allclose(q, golden, rtol=1e-2, atol=5e-4)
    # the monitor point saw the same training trajectory...
    np.testing.assert_allclose(rec["elbo"], golden_elbo, rtol=2e-3)
    # ...and the same posterior-predictive analysis metrics
    np.testing.assert_allclose(rec["r2"], golden_r2, rtol=5e-3, atol=1e-4)


def test_mc_batch_sharding_joint_split():
    """mc_batch_sharding splits the flat (N*n_mc) axis over ALL mesh
    axes dp-major: each dp group keeps whole data samples and 'mc'
    subdivides their MC replicates."""
    from generative_physics_informed_pde_tpu.parallel import (
        mc_batch_sharding)

    mesh = make_mesh(8, ("dp", "mc"), (4, 2))
    flat = jnp.arange(16 * 4.0).reshape(16, 4)  # N=8 samples x n_mc=2
    arr = jax.device_put(flat, mc_batch_sharding(mesh))
    assert len(arr.sharding.device_set) == 8
    # 16 rows over (4 dp x 2 mc) -> each shard holds 2 contiguous rows
    shard_rows = sorted(s.index[0] for s in arr.addressable_shards)
    assert [s.data.shape for s in arr.addressable_shards] == [(2, 4)] * 8
    assert [r.start for r in shard_rows] == list(range(0, 16, 2))
    np.testing.assert_array_equal(np.asarray(arr), np.asarray(flat))


def test_dummy_future_semantics():
    """DummyFuture parity (reference parallel/utils.py:4-46): lazy
    compute, done() always true, exception capture vs raise."""
    from generative_physics_informed_pde_tpu.parallel import DummyFuture

    calls = []
    fut = DummyFuture(False, lambda a, b: calls.append(1) or a + b,
                      (2, 3), {})
    assert fut.done() and not calls      # lazy: nothing ran yet
    assert fut.result() == 5 and calls == [1]
    assert fut.result() == 5 and calls == [1]   # cached, not re-run

    boom = DummyFuture(True, lambda: 1 // 0, (), {})
    assert isinstance(boom.exception(), ZeroDivisionError)  # captured
    with pytest.raises(ZeroDivisionError):
        boom.result()

    strict = DummyFuture(False, lambda: 1 // 0, (), {})
    with pytest.raises(ZeroDivisionError):
        strict.compute()                 # uncaught mode raises eagerly


def test_batch_pspec_unknown_axis_raises():
    """A typo'd batch axis must fail loudly, not silently fall back to a
    different (or no) sharding -- on hybrid meshes the old fallback was
    P('dcn'), which trains with the wrong data distribution."""
    from jax.sharding import Mesh

    mesh = make_mesh(8, ("dp",))
    with pytest.raises(ValueError, match="not in mesh axes"):
        batch_sharding(mesh, axis="pd")
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    hmesh = Mesh(devs, ("dcn", "dp"))
    with pytest.raises(ValueError, match="not in mesh axes"):
        batch_sharding(hmesh, axis="mc")


def test_shard_data_dict_host_local_mesh_in_multiprocess_job(monkeypatch):
    """shard_data_dict must key the process-local path on whether the
    MESH spans processes, not on jax.process_count(): a host-local mesh
    in a multi-process job (a sweep_over_devices study case) is fully
    addressable and owns ALL its rows."""
    mesh = make_mesh(8, ("dp",))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    data = {"X": np.arange(32.0).reshape(16, 2)}
    out = shard_data_dict(data, mesh)
    assert out["X"].shape == (16, 2)  # NOT halved to this "process's" slice
    np.testing.assert_array_equal(np.asarray(out["X"]), data["X"])
    assert len(out["X"].sharding.device_set) == 8


def test_durable_sweep_result_types_uniform(tmp_path):
    """With checkpointing on, freshly-computed and resumed results must
    have identical (JSON-row) types: np arrays become lists on BOTH
    paths, so downstream code behaves the same on first run and resume."""
    from generative_physics_informed_pde_tpu.parallel import (
        sweep_over_processes)

    path = str(tmp_path / "sweep")

    def fn(c):
        return {"v": np.array([c, c + 1.0])}

    out1 = sweep_over_processes(fn, [0, 1, 2], checkpoint_path=path)
    assert all(isinstance(r["v"], list) for r in out1), out1
    # resume with one extra case: mixed resumed + fresh results
    out2 = sweep_over_processes(fn, [0, 1, 2, 3], checkpoint_path=path)
    assert all(isinstance(r["v"], list) for r in out2), out2
    assert out2[:3] == out1


def test_shard_data_dict_replicates_awkward_leaves_single_process():
    """The single-process path honors the same replicate-fallback
    contract as the multi-process one: 0-d leaves and leading dims that
    don't divide the mesh batch axes are replicated, not an error."""
    mesh = make_mesh(8, ("dp",))
    data = {"X": jnp.zeros((16, 4)), "n": jnp.asarray(5.0),
            "odd": jnp.zeros((6, 4))}
    out = shard_data_dict(data, mesh)
    assert len(out["X"].sharding.device_set) == 8
    assert out["n"].sharding.is_fully_replicated
    assert out["odd"].sharding.is_fully_replicated


def test_shard_train_state_shards_pe_opt_state_moments():
    """The PE inner-Adam moments mirror pe_q's (N_val, d) layout and must
    shard with it -- replicated moments pay resharding traffic against
    the sharded q every fused PE update."""
    from generative_physics_informed_pde_tpu.parallel import (
        shard_train_state)

    mesh = make_mesh(8, ("dp",))
    state = {
        "pe_q": {"mean": jnp.zeros((16, 4)), "logsigma": jnp.zeros((16, 4))},
        "pe_opt_state": ({"count": jnp.asarray(0),
                          "mu": {"mean": jnp.zeros((16, 4))}},),
        "w": jnp.zeros((3, 3)),
    }
    out = shard_train_state(state, mesh)
    assert len(out["pe_q"]["mean"].sharding.device_set) == 8
    assert len(out["pe_opt_state"][0]["mu"]["mean"]
               .sharding.device_set) == 8
    assert not out["pe_opt_state"][0]["mu"]["mean"]\
        .sharding.is_fully_replicated
    assert out["pe_opt_state"][0]["count"].sharding.is_fully_replicated
    assert out["w"].sharding.is_fully_replicated
