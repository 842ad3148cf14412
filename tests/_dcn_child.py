"""Child process for the 2-process (DCN) distributed trainer test.

Usage:  python _dcn_child.py <process_id> <num_processes> <port> <out.npz>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
the global mesh spans 8 devices over 2 processes over TCP -- the CPU
stand-in for a multi-host TPU pod slice (ICI within a process, DCN
across).  Runs 3 dp-sharded SVI steps of the same trainer the
single-process test builds, then process 0 saves the allgathered
per-datapoint posterior block for comparison.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                         int(sys.argv[3]), sys.argv[4])

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
mesh = parallel.make_mesh()  # global 1-D 'dp' mesh spanning both processes
assert mesh.devices.size == 4 * nproc

# identical recipe to tests/test_parallel.py::_make_trainer(seed=11)
rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
dl = DataLoader.from_sampler(rf, 24, key=jax.random.PRNGKey(2))
dlu = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(3))
dlu.lock_physics_assembly()
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
tr.run(3, verbose=False)

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

if pid == 0:
    np.savez(out, q=q_host)
print(f"[p{pid}] OK q={q_host.shape}", flush=True)
