#!/usr/bin/env python
"""Posterior-predictive uncertainty-propagation sweep (BASELINE config 5).

For a grid of correlation lengths, push thousands of conductivity
realisations through batched full-order Darcy solves and extract a
quantity of interest (the pressure at the domain centre), collecting
moments into a ParameterStudy.  On a multi-chip mesh the batch axis is
sharded over 'dp'; the reference did the analogue with a *sequential*
futures pool (parallel/utils.py:50-74) and one FEniCS solve at a time.

Run:  python examples/uncertainty_study.py [batch_per_case]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.fem import QOI
from generative_physics_informed_pde_tpu.utils import ParameterStudy, StopWatch


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = 64
    phys = fem.LinearEllipticPhysics("fom", "ND", fem.StructuredTriGrid(n, n))
    conv = fem.PixelConverter(phys.grid)
    qoi = QOI(phys.grid, mx=0.5, my=0.5)
    theta = jnp.tile(jnp.array([[0.0, 0.0, 1.0, 1.0]]), (B, 1))
    bc_values = phys.profile.constrained_values(theta)

    @jax.jit
    def run_case(fields):
        x_dg = conv.image_to_function(fields)
        Y = phys.solve_batched(jnp.exp(x_dg), bc_values)
        q = qoi.extract(Y, bc_values=bc_values, profile=phys.profile)
        return q.mean(), q.std(), jnp.percentile(q, jnp.array([5.0, 95.0]))

    study = ParameterStudy([("corrlength_x100", int)])
    sw = StopWatch(start=True)
    total_solves = 0
    for corrlength in (0.04, 0.08, 0.16, 0.32):
        rf = fem.GaussianRandomField.from_image(
            n, n, mean=0.4, stddev=0.8, corrlength=corrlength, method="fft")
        fields = rf.sample(jax.random.PRNGKey(int(corrlength * 1000)),
                           batch_size=B, dtype=jnp.float32)
        mean, std, pct = run_case(fields)
        study.accumulate((int(corrlength * 100),), {
            "qoi_mean": float(mean), "qoi_std": float(std),
            "qoi_p5": float(pct[0]), "qoi_p95": float(pct[1])})
        total_solves += B
        print(f"l={corrlength}: qoi = {float(mean):.4f} +- {float(std):.4f}"
              f"  [{float(pct[0]):.4f}, {float(pct[1]):.4f}]", flush=True)
    dt = sw.stop()
    print(f"{total_solves} batched {n}^2 solves in {dt:.1f}s "
          f"-> {total_solves / dt:.0f} solves/s")
    study.save("results_uncertainty_study.json")
    print("study saved to results_uncertainty_study.json")


if __name__ == "__main__":
    main()
