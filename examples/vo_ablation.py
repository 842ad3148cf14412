#!/usr/bin/env python
"""The virtual-observables ablation: does the reference's central thesis
hold in this rebuild?

Three arms at EQUAL labeled budget (N_s=64), equal unlabeled budget
(N_u=1024, amortized), equal iterations, identical data permutations and
an IDENTICAL held-out validation set (the vo partition slot is reserved
in every arm so the validation fields are the same 64 samples):

  a "labels"    : no virtual observables -- the 64 VO fields are unused
  b "constrain" : + N_vo=64 fields with linear-Gaussian constraint VO
                  (CGR + flux + Gaussian sketch + RBF, the config-2 spec;
                  reference VirtualObservables.py:596-669)
  c "energy"    : + N_vo=64 fields with annealed randomized-subspace
                  energy VO (reference VirtualObservables.py:672-793)

If (b)/(c) do not beat (a) on posterior-predictive rel-L2 / r2 /
logscore, the semi-supervised machinery does not earn its keep
(reference thesis: readme.md:3-8).  Virtual observables substitute for
LABELS, so their value concentrates where labels are scarce -- ``--ns N``
sweeps the labeled budget (default 64; at N_s=64 the 64 labels already
saturate this model and VO has no headroom, see PARITY.md).  ``--ns 0``
is the ZERO-LABEL regime (the strongest form of the thesis: readme.md
promises training with 'little or NO labeled data') -- the labels arm
then has no y-information at all and serves as the untrained-gp control.

    python examples/vo_ablation.py [iterations] [arm] [--ns N]
        [--cadence C]      constrain-arm VO holdoff + update interval
        [--corrlength L]   field correlation length (0.15 makes r2_y
                           informative; default 0.04 = config-2)
        [--temper F]       constrain-arm prior_precision_factor (<1
                           weakens the stale self-distillation anchor)

Default runs all three arms sequentially and appends to
results/vo_ablation.json plus a summary table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.fem import GaussianRandomField
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation)


def _params(iterations: int, arm: str, n_s: int,
            vo_cadence: int | None = None,
            temper: float = 1.0) -> TrainerParameters:
    p = TrainerParameters()
    p.identifier = "highres"
    p.trainer.update(lr_init=1e-3, N_monitor_interval=500)
    p.scheduler = {"milestones": [iterations // 4, (5 * iterations) // 8],
                   "factor": math.sqrt(0.1)}
    # N_vo_max=64 in EVERY arm: the vo partition slot stays reserved so
    # supervised/validation index into identical fields across arms.
    p.data.update(N_u=1024, N_s=n_s, N_u_max=1024, N_s_max=n_s, N_vo_max=64,
                  N_val=64, armortized_bs=64)
    if arm == "labels":
        p.data.update(N_vo=0, vo_spec={})
    elif arm == "constrain":
        c = vo_cadence or 250
        p.trainer.update(N_vo_holdoff=c, N_vo_update_interval=c,
                         N_monte_carlo_vo=64)
        p.data.update(N_vo=64,
                      vo_spec={"type": "constrain", "CGR": True,
                               "flux": True, "N_gaussian": 8, "N_rbf": 8,
                               "l_rbf": 0.2,
                               "prior_precision_factor": temper})
    elif arm == "energy":
        p.trainer.update(N_vo_holdoff=50, N_vo_update_interval=10,
                         N_monte_carlo_vo=64)
        p.data.update(N_vo=64,
                      vo_spec={"type": "energy", "l_rbf": 0.2, "N_rbf": 32,
                               "energy_num_iterations_per_update": 10,
                               "T_init": 1.0, "T_final": 1e-6,
                               "T_iterations": iterations + 1})
    else:
        raise ValueError(arm)
    return p


def run_arm(arm: str, iterations: int, n_s: int = 64,
            vo_cadence: int | None = None, corrlength: float = 0.04,
            temper: float = 1.0) -> dict:
    # fresh loaders per arm, SAME keys -> identical fields and labels
    rf = GaussianRandomField.from_image(64, 64, 0.4, 0.8, corrlength,
                                        method="fft")
    dl = DataLoader.from_sampler(rf, n_s + 64 + 64, key=0)
    dlu = DataLoader.from_sampler(rf, 1024, key=1)
    dlu.lock_physics_assembly()

    p = _params(iterations, arm, n_s, vo_cadence, temper)
    t0 = time.time()
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    print(f"[{arm}] setup: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    tr.run(iterations, verbose=True)
    dt = time.time() - t0
    out = dict(tr.results())
    out.update(arm=arm, iterations=iterations, N_s=n_s,
               steps_per_sec=iterations / dt)
    # --cadence / --temper are wired into the constrain arm only (_params
    # ignores them elsewhere): tagging unaffected arms would record the
    # identical labels/energy config twice under different names
    if vo_cadence and arm == "constrain":
        out["vo_cadence"] = vo_cadence
        out["arm"] = f"{arm}@{vo_cadence}"
    if temper != 1.0 and arm == "constrain":
        out["temper"] = temper
        out["arm"] = f"{out['arm']}*t{temper}"
    if corrlength != 0.04:
        out["corrlength"] = corrlength
        out["arm"] = f"{out['arm']}/l{corrlength}"
    print(f"[{arm}] {iterations} iters in {dt:.1f}s "
          f"({out['steps_per_sec']:.2f} steps/s): {out}", flush=True)
    return out


def main():
    n_s = 64
    if "--ns" in sys.argv:
        i = sys.argv.index("--ns")
        n_s = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    vo_cadence = None
    if "--cadence" in sys.argv:  # constrain-arm holdoff + update interval
        i = sys.argv.index("--cadence")
        vo_cadence = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    corrlength = 0.04
    if "--corrlength" in sys.argv:  # 0.15 makes r2_y informative
        i = sys.argv.index("--corrlength")
        corrlength = float(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    temper = 1.0
    if "--temper" in sys.argv:  # constrain-arm prior tempering (<1)
        i = sys.argv.index("--temper")
        temper = float(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    arms = [sys.argv[2]] if len(sys.argv) > 2 else ["labels", "constrain",
                                                    "energy"]
    results = []
    path = "results/vo_ablation.json"
    if os.path.exists(path):
        results = json.load(open(path))  # accumulate across runs
    for arm in arms:
        tag = f"{arm}@{vo_cadence}" if vo_cadence else arm
        if temper != 1.0:
            tag = f"{tag}*t{temper}"
        if corrlength != 0.04:
            tag = f"{tag}/l{corrlength}"
        results = [r for r in results
                   if not (r["arm"] == tag and r.get("N_s", 64) == n_s)]
        results.append(run_arm(arm, iterations, n_s, vo_cadence, corrlength,
                               temper))
        os.makedirs("results", exist_ok=True)
        json.dump(results, open(path, "w"), indent=1)
    print(f"\n{'arm':<18} {'N_s':>4} {'rel-L2':>8} {'r2_y':>8} "
          f"{'logscore':>9}")
    for r in sorted(results, key=lambda r: (r.get("N_s", 64), r["arm"])):
        print(f"{r['arm']:<18} {r.get('N_s', 64):>4} {r['relerr_y']:>8.4f} "
              f"{r['r2_y']:>8.4f} {r['logscore_y']:>9.3f}")


if __name__ == "__main__":
    main()
