#!/usr/bin/env python
"""Minimal repro of the exp->batched-Cholesky ROM-solve TPU runtime fault.

Observed 2026-08-17 on v5e (axon tunnel): a jitted program that feeds an
elementwise chain (the model's ``exp(effprop) + 1e-8``) into the batched
dense ROM solve (``fem/solvers.py::rom_solve``: einsum stiffness ->
batched Cholesky -> cho_solve) crashes the TPU worker process outright
("UNAVAILABLE: TPU worker process crashed or restarted ... kernel
fault") for flat batch sizes >= ~3072:

    B=2048  exp inside jit          OK
    B=3072  exp inside jit          WORKER CRASH
    B=4096  exp inside jit          WORKER CRASH
    B=4096  solve-only jit          OK  (exp computed eagerly outside)
    B=4096  exp + lax.map chunks of 2048   OK

The ``optimization_barrier`` fence at the top of ``solve_batch`` does
NOT prevent the fault -- only keeping each dense-solve dispatch at
<= 2048 systems does, hence ``rom_solve``'s TPU default
``max_chunk=2048``.  This was the cause of every "first monitor eval
kills the worker" crash in the 64^2 configs: the analysis eval flattens
N_val x N_mc = 64 x 64 = 4096 solves into one call
(``inference/analysis.py::sample_predictive_y``).

This script runs the SAME computation three ways so the fault stays
reproducible if the workaround is ever removed.  Expected on a healthy
build: 'chunked' and 'solve_only' pass; 'fused' historically crashes
the worker at B>=3072 (give the worker ~1-5 min to restart afterwards).

Usage:  python benchmarks/rom_fusion_repro.py [B] [case]
        case in {chunked, solve_only, fused, all}; default B=4096 all
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from generative_physics_informed_pde_tpu import fem  # noqa: E402
from generative_physics_informed_pde_tpu.fem.solvers import rom_solve  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    case = sys.argv[2] if len(sys.argv) > 2 else "all"
    phys = fem.make_fom_rom_pair("ND", 8, 8, 3)
    romg = phys["rom"]
    M = jnp.asarray(romg.assembly_tensor, jnp.float32)
    bc = romg.constrained_dofs
    key = jax.random.PRNGKey(0)
    logX = 0.3 * jax.random.normal(key, (B, romg.grid.n_cells), jnp.float32)
    F = jnp.zeros((B, romg.grid.n_nodes), jnp.float32)
    F = F.at[:, jnp.asarray(bc)].set(1.0)

    def run(tag, fn, *args):
        y = jax.jit(fn)(*args)
        print(f"{tag:12s} B={B}: OK  max|y|={float(jnp.abs(y).max()):.6f}",
              flush=True)

    if case in ("chunked", "all"):
        # production path: TPU default max_chunk=2048
        run("chunked", lambda lx, f: rom_solve(M, jnp.exp(lx) + 1e-8, f, bc),
            logX, F)
    if case in ("solve_only", "all"):
        alphas = jnp.exp(logX) + 1e-8  # eager: exp not in the jitted program
        run("solve_only",
            lambda a, f: rom_solve(M, a, f, bc, max_chunk=B), alphas, F)
    if case in ("fused", "all"):
        print("fused: single-dispatch exp+solve -- historically CRASHES the "
              "TPU worker at B>=3072", flush=True)
        run("fused",
            lambda lx, f: rom_solve(M, jnp.exp(lx) + 1e-8, f, bc,
                                    max_chunk=B), logX, F)


if __name__ == "__main__":
    main()
