"""Child process for the 2-process (DCN) distributed trainer test.

Usage:  python _dcn_child.py <process_id> <num_processes> <port> <out.npz>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
the global mesh spans 8 devices over 2 processes over TCP -- the CPU
stand-in for a multi-host TPU pod slice (ICI within a process, DCN
across).  Exercises the FULL trainer lifecycle across processes, not
just bare steps:

  per-host label assembly (each process solves ONLY its shard's labels)
  -> hybrid (dcn x dp) mesh setup -> 6 sharded SVI steps (a monitor
  point fires at step 5: analysis + metric recording over sharded
  state) -> save_checkpoint (allgather + process-0 write + barrier)
  -> restore_checkpoint (re-shard onto the live mesh) -> 2 more steps
  -> finalize.

Process 0 saves the allgathered per-datapoint posterior block and the
monitor ELBO series for comparison against the single-process golden.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                         int(sys.argv[3]), sys.argv[4])

# Per-process compile cache: if the peers SHARED a cache dir, the
# process that compiles first populates it and its peer loads the
# result near-instantly on the next executable -- a 30+s skew that
# blows Gloo's 30 s context-init rendezvous at the next collective
# (observed: "GetKeyValue() timed out").  Distinct dirs keep the two
# processes' compile times symmetric (both cold or both warm).
_cc = os.environ.get("GPIPDE_COMPILE_CACHE")
if _cc:
    os.environ["GPIPDE_COMPILE_CACHE"] = os.path.join(_cc, f"dcn_p{pid}")

from generative_physics_informed_pde_tpu import parallel

parallel.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=pid)
assert parallel.process_count() == nproc

import numpy as np

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation)

assert len(jax.devices()) == 4 * nproc, jax.devices()
# hybrid (DCN x ICI) mesh: leading 'dcn' axis over the 2 processes,
# trailing 'dp' over each process's 4 local devices; the batch axis
# shards over BOTH (process-major), matching local_shard_slice
mesh = parallel.make_hybrid_mesh(("dp",))
assert mesh.axis_names == ("dcn", "dp") and mesh.devices.shape == (nproc, 4)

# identical recipe to tests/test_parallel.py::_make_trainer(seed=11)
rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
dl = DataLoader.from_sampler(rf, 24, key=jax.random.PRNGKey(2))
dlu = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(3))
dlu.lock_physics_assembly()

# -- per-host label assembly (parallel.local_shard_slice) ---------------
# The trainer's partition is identity-permuted: supervised = loader rows
# 0..15 (sharded over the mesh batch axis -> this host owns its
# contiguous half), validation = rows 16..23 (consumed replicated ->
# both hosts).  Solve ONLY those labels here; unsolved rows stay NaN.
N_SUP = 16
sup_rows = np.arange(N_SUP)[parallel.local_shard_slice(N_SUP)]
my_rows = np.r_[sup_rows, np.arange(N_SUP, dl.N)]
phys = fem.make_fom_rom_pair("NDP", 4, 4, 3)  # == highres32 physics
dl.assemble(phys, rows=my_rows)
other = np.setdiff1d(np.arange(dl.N), my_rows)
assert np.isnan(dl.Y[other]).all(), "assembly was not process-local"
assert np.isfinite(dl.Y[my_rows]).all()

p = TrainerParameters()
p.identifier = "highres32"
p.debug = True
p.seed = 11
p.trainer["lr_init"] = 1e-2
p.scheduler = {"milestones": [50], "factor": 0.5}
p.data.update(N_u=16, N_s=16, N_u_max=16, N_s_max=16, N_vo_max=0,
              N_vo=0, N_val=8, armortized_bs=8, vo_spec={})
tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                  permutation_u=np.arange(dlu.N),
                                  dl=dl, dlu=dlu)
tr.setup(scheduler_spec=p.scheduler, mesh=mesh)
# the sharded supervised labels must be the valid (locally solved) rows
assert bool(jax.jit(lambda y: jax.numpy.isfinite(y).all())(
    tr._data_sup["Y"]))

# -- 6 steps: the monitor point (debug N_monitor_interval=5) fires ------
tr.run(6, verbose=False)
assert tr._monitor["elbo"], "monitor point did not fire"
assert np.isfinite(tr._monitor["elbo"]).all()
assert tr._analysis.series["r2_y"].value, "monitor analysis did not run"

# -- checkpoint -> restore -> resume across both processes --------------
ckpt = os.path.join(os.path.dirname(os.path.abspath(out)), "dcn_ckpt")
q_before = parallel.fetch(tr.state.params["q_z"]["supervised"]["mean"])
tr.save_checkpoint(ckpt)
tr.restore_checkpoint(ckpt)
q_after = parallel.fetch(tr.state.params["q_z"]["supervised"]["mean"])
np.testing.assert_allclose(q_after, q_before, rtol=0, atol=0)
assert not tr.state.params["q_z"]["supervised"]["mean"].is_fully_addressable
tr.run(2, verbose=False)
tr.finalize()

q = tr.state.params["q_z"]["supervised"]["mean"]
assert not q.is_fully_addressable  # really spans processes
q_host = parallel.fetch(q)

# host-sharded parameter study over DCN: every process must see all rows
rows = parallel.sweep_over_processes(lambda c: c * c, list(range(5)))
assert rows == [0, 1, 4, 9, 16], rows

# numpy-typed results must survive the JSON exchange (study records are
# commonly np.float32 metrics)
rows_np = parallel.sweep_over_processes(
    lambda c: {"m": np.float32(c + 0.5)}, list(range(4)))
assert [r["m"] for r in rows_np] == [0.5, 1.5, 2.5, 3.5], rows_np


# a raising case must NOT deadlock the peer in the allgather: both
# processes get the full record list with the failure marked in place
def _flaky(c):
    if c == 2:
        raise ValueError("case-two failure")
    return c


recs = parallel.sweep_over_processes(_flaky, list(range(4)),
                                     return_exceptions=True)
assert recs[0] == 0 and recs[1] == 1 and recs[3] == 3, recs
assert "case-two failure" in recs[2]["__error__"], recs

# durable sweep: per-process part files on the shared FS; a resumed
# sweep loads the union of BOTH processes' parts and re-runs nothing
# (the poison fn would blow up if any case executed again)
ck = os.path.join(os.path.dirname(os.path.abspath(out)), "sweepck")
rows_ck = parallel.sweep_over_processes(
    lambda c: {"v": c + 1}, list(range(6)),
    checkpoint_path=ck, save_interval_s=0.0)
assert [r["v"] for r in rows_ck] == [1, 2, 3, 4, 5, 6], rows_ck
rows_ck2 = parallel.sweep_over_processes(
    lambda c: 1 // 0, list(range(6)),
    checkpoint_path=ck, save_interval_s=0.0)
assert rows_ck2 == rows_ck, rows_ck2

if pid == 0:
    np.savez(out, q=q_host, elbo=np.asarray(tr._monitor["elbo"]),
             r2=np.asarray(tr._analysis.series["r2_y"].value))
print(f"[p{pid}] OK q={q_host.shape}", flush=True)
