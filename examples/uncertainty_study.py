#!/usr/bin/env python
"""Posterior-predictive uncertainty-propagation sweep (BASELINE config 5).

For a grid of correlation lengths, push thousands of conductivity
realisations through batched full-order Darcy solves and extract a
quantity of interest (the pressure at the domain centre), collecting
moments into a ParameterStudy.  The whole sweep runs as ONE SPMD program:
cases are vmapped and (on a mesh) sharded over the 'dp' axis via
``sweep_over_devices``.  The reference did the analogue with a
*sequential* futures pool (parallel/utils.py:50-74 + utils/database.py:
9-107) and one FEniCS solve at a time.

Run:  python examples/uncertainty_study.py [batch_per_case] [--mesh N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.fem import QOI
from generative_physics_informed_pde_tpu.parallel import make_mesh
from generative_physics_informed_pde_tpu.utils import ParameterStudy, StopWatch

CORRLENGTHS = (0.04, 0.08, 0.16, 0.32)

# jitted sweep bodies keyed on (physics, C, B): a fresh @jax.jit closure
# per qoi_sweep call would RETRACE on every call, so the "warm" rate
# would silently include a full retrace + XLA compile
_RUN_CACHE: dict = {}


def _get_run(phys, C, B):
    cache_key = (id(phys), C, B)
    if cache_key not in _RUN_CACHE:
        conv = fem.PixelConverter(phys.grid)
        qoi = QOI(phys.grid, mx=0.5, my=0.5)

        @jax.jit
        def run(fields, bc_values):
            x_dg = conv.image_to_function(fields)
            Y = phys.solve_batched(jnp.exp(x_dg), bc_values)
            q = qoi.extract(Y, bc_values=bc_values,
                            profile=phys.profile).reshape(C, B)
            pct = jnp.percentile(q, jnp.array([5.0, 95.0]), axis=1)
            return {"mean": q.mean(axis=1), "std": q.std(axis=1),
                    "p5": pct[0], "p95": pct[1]}

        _RUN_CACHE[cache_key] = run
    return _RUN_CACHE[cache_key]


def qoi_sweep(phys, corrlengths, B, mesh=None, n=64, seed=0):
    """Sample ``B`` fields per correlation length and run the whole sweep
    as ONE flattened batched solve of C*B systems; per-case QOI moments
    are reduced afterwards.  With a mesh the flattened solve batch is
    sharded over 'dp' (better load balance than case-level sharding, and
    C need not divide the device count; ``sweep_over_devices`` remains
    the generic case-sharded runner for parameter studies).

    Returns a dict of per-case QOI moments, each an array of
    ``len(corrlengths)``.
    """
    C = len(corrlengths)
    theta = jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (C * B, 1))
    bc_values = phys.profile.constrained_values(theta)

    # per-case field sampling (host-side spectral filters differ per case)
    fields = jnp.concatenate([
        fem.GaussianRandomField.from_image(
            n, n, mean=0.4, stddev=0.8, corrlength=l, method="fft"
        ).sample(jax.random.PRNGKey(seed + int(l * 1000)), batch_size=B,
                 dtype=jnp.float32)
        for l in corrlengths])                     # (C*B, n, n)

    run = _get_run(phys, C, B)

    if mesh is not None:
        from generative_physics_informed_pde_tpu.parallel import (
            shard_data_dict)
        sharded = shard_data_dict(
            {"fields": fields, "bc": bc_values}, mesh)
        fields, bc_values = sharded["fields"], sharded["bc"]
    return run(fields, bc_values)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else 4096
    n_mesh = None
    if "--mesh" in sys.argv:
        n_mesh = int(sys.argv[sys.argv.index("--mesh") + 1])
    n = 64
    phys = fem.LinearEllipticPhysics("fom", "ND", fem.StructuredTriGrid(n, n))
    mesh = make_mesh(n_mesh) if n_mesh else None

    sw = StopWatch(start=True)
    out = qoi_sweep(phys, CORRLENGTHS, B, mesh=mesh, n=n)
    out = {k: np.asarray(v) for k, v in out.items()}
    dt = sw.stop()
    # steady-state rate (cached compile, fresh fields)
    sw2 = StopWatch(start=True)
    out2 = qoi_sweep(phys, CORRLENGTHS, B, mesh=mesh, n=n, seed=1)
    _ = {k: np.asarray(v) for k, v in out2.items()}
    dt2 = sw2.stop()

    study = ParameterStudy([("corrlength_x100", int)])
    for i, l in enumerate(CORRLENGTHS):
        study.accumulate((int(l * 100),), {
            "qoi_mean": float(out["mean"][i]), "qoi_std": float(out["std"][i]),
            "qoi_p5": float(out["p5"][i]), "qoi_p95": float(out["p95"][i])})
        print(f"l={l}: qoi = {out['mean'][i]:.4f} +- {out['std'][i]:.4f}"
              f"  [{out['p5'][i]:.4f}, {out['p95'][i]:.4f}]", flush=True)
    total_solves = B * len(CORRLENGTHS)
    print(f"{total_solves} batched {n}^2 solves in {dt:.1f}s "
          f"(cold, incl. compile) -> {total_solves / dt:.0f} solves/s; "
          f"warm: {dt2:.1f}s -> {total_solves / dt2:.0f} solves/s"
          + (f" (mesh dp={n_mesh})" if n_mesh else ""))
    study.save("results_uncertainty_study.json")
    print("study saved to results_uncertainty_study.json")


if __name__ == "__main__":
    main()
