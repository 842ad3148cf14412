#!/usr/bin/env python
"""Runner for the five BASELINE.json benchmark configurations.

    python examples/baseline_configs.py <config> [iterations]

1. 32x32 Darcy, fully labeled, small latent — the example.ipynb recipe
   (CPU-runnable).
2. Semi-supervised: 64 labeled + 1024 unlabeled fields with
   virtual-observable constraints on a 64^2 grid.
3. High-contrast Matern random-field conductivity at 128^2 with 16 MC
   ELBO samples per SVI step.
4. Coarse-grained mismatch study: 8^2 embedded CGM vs a 256^2 FOM,
   amortized encoder over 10k realisations.
5. Data-parallel: 4096 batched PDE solves/step for a posterior-predictive
   uncertainty-propagation sweep (see examples/uncertainty_study.py; on a
   multi-chip mesh pass --mesh N).
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from generative_physics_informed_pde_tpu.constraints import vo_spec_preset
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.fem import GaussianRandomField
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation)


def _loaders(rf, n_labeled, n_unlabeled, seed=0):
    dl = DataLoader.from_sampler(rf, n_labeled, key=seed)
    dlu = DataLoader.from_sampler(rf, n_unlabeled, key=seed + 1)
    dlu.lock_physics_assembly()
    return dl, dlu


def _run(params, dl, dlu, iterations, ckpt_dir=None, seg=None):
    """Run the trainer; with ``ckpt_dir`` set, run in ``seg``-iteration
    segments checkpointing after each (long v5e runs survive
    interruptions -- resume by restarting with the same arguments)."""
    import os
    t0 = time.time()
    tr = CreateTrainerFromPermutation(params, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    print(f"setup: {time.time() - t0:.1f}s", flush=True)
    tr.info()
    if ckpt_dir and os.path.isdir(os.path.join(ckpt_dir, "latest")):
        tr.restore_checkpoint(os.path.join(ckpt_dir, "latest"))
        print(f"resumed from {ckpt_dir} at gn={tr.gn}", flush=True)
    t0 = time.time()
    seg = seg or iterations
    gn0 = tr.gn  # nonzero on checkpoint resume
    while tr.gn < iterations:
        n = min(seg, iterations - tr.gn)
        tr.run(n, verbose=True)
        if ckpt_dir:
            tr.save_checkpoint(os.path.join(ckpt_dir, "latest"))
            print(f"checkpoint @ gn={tr.gn}: {tr.results()}", flush=True)
    dt = time.time() - t0
    done = tr.gn - gn0  # only the iterations executed THIS invocation
    if done > 0:
        print(f"{done} iters in {dt:.1f}s -> {done / dt:.1f} steps/s"
              + (f" (resumed at gn={gn0})" if gn0 else ""), flush=True)
    print("results:", tr.results(), flush=True)
    return tr


def config1(iterations=15000):
    """Fully-labeled 32^2 (the example recipe with N_u=0)."""
    p = TrainerParameters()
    p.identifier = "highres32"
    p.trainer.update(lr_init=1e-2, N_monitor_interval=1000)
    p.scheduler = {"milestones": [250, 1500], "factor": math.sqrt(0.1)}
    p.data.update(N_u=0, N_s=128, N_u_max=0, N_s_max=128, N_vo_max=0,
                  N_vo=0, N_val=128, armortized_bs=None, vo_spec={})
    rf = GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    dl, dlu = _loaders(rf, 256, 1)
    return _run(p, dl, dlu, iterations)


def config2(iterations=3000, cadence=None):
    """Semi-supervised 64^2 with virtual observables: 64 labeled + 1024
    unlabeled + 64 VO-constrained fields.  The VO cadence is the package
    default (50, measured-best -- PARITY.md "Constrain-VO staleness");
    pass ``cadence=250`` for the reference-parity run."""
    p = TrainerParameters()
    p.identifier = "highres"
    p.trainer.update(lr_init=1e-3, N_monitor_interval=500,
                     N_vo_holdoff=250, N_monte_carlo_vo=64)
    if cadence is not None:
        p.trainer["N_vo_update_interval"] = cadence
    p.scheduler = {"milestones": [500, 1500], "factor": math.sqrt(0.1)}
    p.data.update(N_u=1024, N_s=64, N_u_max=1024, N_s_max=64, N_vo_max=64,
                  N_vo=64, N_val=64, armortized_bs=64,
                  vo_spec=vo_spec_preset("constrain"))
    rf = GaussianRandomField.from_image(64, 64, 0.4, 0.8, 0.04, method="fft")
    dl, dlu = _loaders(rf, 64 + 64 + 64, 1024)
    return _run(p, dl, dlu, iterations)


def config2e(iterations=1000):
    """Config-2 with ENERGY virtual observables: the unlabeled fields'
    solution posteriors come from annealed randomized-subspace energy
    minimisation (reference VirtualObservables.py:672-793, 1001-1091)
    instead of linear-Gaussian conditioning."""
    p = TrainerParameters()
    p.identifier = "highres"
    p.trainer.update(lr_init=1e-3, N_monitor_interval=250,
                     N_vo_holdoff=50, N_vo_update_interval=10,
                     N_monte_carlo_vo=64)
    p.scheduler = {"milestones": [500, 1500], "factor": math.sqrt(0.1)}
    p.data.update(N_u=1024, N_s=64, N_u_max=1024, N_s_max=64, N_vo_max=64,
                  N_vo=64, N_val=64, armortized_bs=64,
                  vo_spec=vo_spec_preset("energy", T_iterations=iterations + 1))
    rf = GaussianRandomField.from_image(64, 64, 0.4, 0.8, 0.04, method="fft")
    dl, dlu = _loaders(rf, 64 + 64 + 64, 1024)
    return _run(p, dl, dlu, iterations)


def config2h(iterations=1000):
    """Config-2's virtual-observable pipeline at the 'highres' 128^2
    scale: the matrix-free constraint operator Gamma runs over 16,129
    free dofs (vs 4,065 at 64^2).  Flushes out scale bugs in the
    constraint-assembly path (reference VirtualObservables.py:57-69 at
    the highres preset scale)."""
    p = TrainerParameters()
    p.identifier = "highres128"
    p.trainer.update(lr_init=1e-3, N_monitor_interval=250,
                     N_vo_holdoff=250, N_monte_carlo_vo=64)
    p.scheduler = {"milestones": [iterations // 2], "factor": math.sqrt(0.1)}
    p.data.update(N_u=1024, N_s=64, N_u_max=1024, N_s_max=64, N_vo_max=64,
                  N_vo=64, N_val=64, armortized_bs=32,
                  vo_spec=vo_spec_preset("constrain"))
    rf = GaussianRandomField.from_image(128, 128, 0.4, 0.8, 0.04,
                                        method="fft")
    dl, dlu = _loaders(rf, 64 + 64 + 64, 1024)
    return _run(p, dl, dlu, iterations)


def config2he(iterations=2000):
    """Energy-VO at the 'highres' 128^2 scale -- the production
    semi-supervised arm (see the VO-ablation in PARITY.md) run where the
    randomized-subspace energy update spans 16,129 free dofs.  Long runs
    checkpoint every 1000 iterations to results/config2he_ckpt."""
    p = TrainerParameters()
    p.identifier = "highres128"
    p.trainer.update(lr_init=1e-3, N_monitor_interval=500,
                     N_vo_holdoff=50, N_vo_update_interval=10,
                     N_monte_carlo_vo=64)
    if iterations > 1000:
        p.scheduler = {"milestones": [iterations // 3, 2 * iterations // 3],
                       "factor": math.sqrt(0.1)}
    else:
        p.scheduler = {"milestones": [500], "factor": math.sqrt(0.1)}
    p.data.update(N_u=1024, N_s=64, N_u_max=1024, N_s_max=64, N_vo_max=64,
                  N_vo=64, N_val=64, armortized_bs=32,
                  vo_spec=vo_spec_preset("energy", T_iterations=iterations + 1))
    rf = GaussianRandomField.from_image(128, 128, 0.4, 0.8, 0.04,
                                        method="fft")
    dl, dlu = _loaders(rf, 64 + 64 + 64, 1024)
    ckpt = "results/config2he_ckpt" if iterations > 1000 else None
    return _run(p, dl, dlu, iterations, ckpt_dir=ckpt, seg=1000)


def config3(iterations=600):
    """High-contrast Matern at 128^2 with 16 MC ELBO samples per step.

    For converged runs (iterations > 1000) the LR decays scale with the
    budget (thirds, factor sqrt(0.1) as in the example recipe) and the run
    checkpoints every 1000 iterations to results/config3_ckpt."""
    p = TrainerParameters()
    p.identifier = "highres128"
    p.trainer.update(lr_init=1e-3, N_monitor_interval=200,
                     N_monte_carlo_elbo=16, N_monte_carlo_analysis=16)
    if iterations > 1000:
        p.scheduler = {"milestones": [iterations // 3, 2 * iterations // 3],
                       "factor": math.sqrt(0.1)}
    else:
        p.scheduler = {"milestones": [400], "factor": 0.5}
    p.data.update(N_u=256, N_s=128, N_u_max=256, N_s_max=128, N_vo_max=0,
                  N_vo=0, N_val=64, armortized_bs=32, vo_spec={})
    rf = GaussianRandomField.from_image(128, 128, 0.4, 1.0, 0.08,
                                        method="fft", kernel="matern32")
    dl, dlu = _loaders(rf, 128 + 64, 256)
    ckpt = "results/config3_ckpt" if iterations > 1000 else None
    return _run(p, dl, dlu, iterations, ckpt_dir=ckpt, seg=1000)


def config4(iterations=2000):
    """CGM-mismatch study: 8^2 embedded coarse model against a 256^2 FOM,
    amortized encoder over 10k unlabeled realisations."""
    p = TrainerParameters()
    p.identifier = "highres128"
    p.margs = {"num_refines": 5, "nx_rom": 8, "ny_rom": 8}  # FOM 256^2
    p.trainer.update(lr_init=1e-3, N_monitor_interval=500)
    p.scheduler = {"milestones": [1000], "factor": 0.5}
    p.data.update(N_u=10240, N_s=64, N_u_max=10240, N_s_max=64, N_vo_max=0,
                  N_vo=0, N_val=32, armortized_bs=32, vo_spec={})
    rf = GaussianRandomField.from_image(256, 256, 0.4, 0.8, 0.08,
                                        method="fft")
    dl, dlu = _loaders(rf, 64 + 32, 10240)
    return _run(p, dl, dlu, iterations)


def config512(iterations=3000):
    """Beyond BASELINE.json: the config-4 recipe one octave up -- 8^2
    embedded CGM against a 512^2 FOM (num_refines=6; 263,169 fine nodes,
    261,121 free dofs per solve), amortized encoder, f32 MG-PCG label
    solves.  The reference cannot express this scale at all (its random
    field sampler is capped at 8192 dofs = 90^2, RandomField.py:43, and
    its labels come from per-sample scipy solves)."""
    p = TrainerParameters()
    p.identifier = "highres128"
    p.margs = {"num_refines": 6, "nx_rom": 8, "ny_rom": 8}  # FOM 512^2
    p.trainer.update(lr_init=1e-3, N_monitor_interval=500)
    p.scheduler = {"milestones": [1000, 2000], "factor": 0.5}
    p.data.update(N_u=1024, N_s=64, N_u_max=1024, N_s_max=64, N_vo_max=0,
                  N_vo=0, N_val=32, armortized_bs=16, vo_spec={})
    rf = GaussianRandomField.from_image(512, 512, 0.4, 0.8, 0.08,
                                        method="fft")
    dl, dlu = _loaders(rf, 64 + 32, 1024)
    return _run(p, dl, dlu, iterations, ckpt_dir="results/config512_ckpt",
                seg=500)


def config5():
    """4096 batched PDE solves/step uncertainty sweep."""
    import subprocess
    import os
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__),
                                 "uncertainty_study.py"), "4096"],
                   check=True)


CONFIGS = {"1": config1, "2": config2, "2e": config2e, "2h": config2h,
           "2he": config2he, "3": config3, "4": config4, "5": config5,
           "512": config512}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "1"
    args = [int(a) for a in sys.argv[2:3]]
    CONFIGS[which](*args)
