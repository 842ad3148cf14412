"""Repro: long fused-scan train steps crash the TPU runtime at 512^2.

Fault class
-----------
``lax.scan`` over the SVI step body with length >= 500 at the 512^2 FOM
scale ('highres128' preset with num_refines=6: 64x 512^2 decode + 64
embedded ROM solves + grads per iteration) makes the TPU worker process
crash at execution time::

    jax.errors.JaxRuntimeError: UNAVAILABLE: TPU worker process crashed
    or restarted.

Because dispatch is asynchronous, the crash surfaces at the NEXT blocking
call (in the original incident, the posterior-predictive eval -- which is
innocent).  Forcing ``float(logs['elbo'])`` right after the scan chunk
(as this script does) pins the fault on the scan executable itself.

Evidence matrix (TPU v5e, 2026-08-18):
  - scan length 5/25/100 at 512^2: clean (130-iteration smoke, 0.64
    steps/s)
  - scan length 500 at 512^2: worker crash, deterministic across 3 runs
  - scan length 500 at 128^2: clean (config-3's converged 8000-iteration
    run used 500-step chunks throughout)
  - the scan carries no per-step outputs (ys=None), so memory does not
    scale with length -- this is a runtime/XLA defect, not OOM.

This is the third at-scale fault of this runtime after
vmap-of-while_loop (PARITY.md config-5 note) and multigrid-in-CG fusion
(benchmarks/mg_repro.py).  Mitigation: training/trainer.py caps
_SCAN_BUCKETS at 100, which the chunk sweep (benchmarks/
step_roofline.py) shows is performance-neutral (throughput is flat from
25 fused steps up).

Run (expects ~8 min setup + crash in the first chunk)::

    python benchmarks/scan512_repro.py [scan_length=500]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.fem import GaussianRandomField
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation)
from generative_physics_informed_pde_tpu.training import trainer as tmod


def main(scan_length: int = 500):
    # force the requested fused-scan length through the bucket filter
    tmod._SCAN_BUCKETS = tuple(sorted({1, scan_length}))
    p = TrainerParameters()
    p.identifier = "highres128"
    p.margs = {"num_refines": 6, "nx_rom": 8, "ny_rom": 8}  # FOM 512^2
    p.trainer.update(lr_init=1e-3, N_monitor_interval=0)
    p.data.update(N_u=1024, N_s=64, N_u_max=1024, N_s_max=64, N_vo_max=0,
                  N_vo=0, N_val=32, armortized_bs=16, vo_spec={})
    rf = GaussianRandomField.from_image(512, 512, 0.4, 0.8, 0.08,
                                        method="fft")
    t0 = time.time()
    dl = DataLoader.from_sampler(rf, 64 + 32, key=0)
    dlu = DataLoader.from_sampler(rf, 1024, key=1)
    dlu.lock_physics_assembly()
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    print(f"setup {time.time() - t0:.0f}s", flush=True)

    orig_step = tr._train_step

    def synced(state, vo_mean, vo_logsigma, holdoff, n_steps):
        t = time.time()
        print(f"chunk n_steps={n_steps} dispatch...", flush=True)
        state, logs = orig_step(state, vo_mean, vo_logsigma,
                                holdoff=holdoff, n_steps=n_steps)
        e = float(logs["elbo"])  # block HERE so the fault cannot smear
        print(f"chunk n_steps={n_steps} DONE elbo={e:.4g} "
              f"{time.time() - t:.0f}s", flush=True)
        return state, logs

    tr._train_step = synced
    tr.run(scan_length, verbose=False)
    print(f"CLEAN: scan length {scan_length} executed at 512^2", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
