#!/usr/bin/env python
"""Minimal repro of the 256^2 multigrid-in-CG TPU runtime fault.

Observed 2026-08-16 on v5e (axon tunnel): jitting a batched PCG whose
preconditioner is a multigrid V-cycle and letting XLA fuse the V-cycle
smoother/transfer chains into the CG body produces fused kernels that
fault the TPU runtime ("XLA:TPU compile permanent error" /
runtime-internal fault) at 256^2 for batches > ~8.  Fencing the
preconditioner call (and each V-cycle level transition) with
``jax.lax.optimization_barrier`` bounds every fused kernel to one
smoother sweep and the fault disappears, with no measurable slowdown.

This script runs the SAME solve twice -- ``pcg_fused`` (barriers
stripped) and ``pcg_fenced`` (production path) -- so the fault stays
reproducible if the workaround is ever removed.  Expected on a healthy
build: pcg_fenced converges; pcg_fused historically faults at B>8.

Usage:  python benchmarks/mg_repro.py [B] [n]   (defaults B=16, n=256)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from generative_physics_informed_pde_tpu.fem.grid import StructuredTriGrid
from generative_physics_informed_pde_tpu.fem.assembly import StencilOperator
from generative_physics_informed_pde_tpu.fem.bc import DirichletProfile
from generative_physics_informed_pde_tpu.fem.multigrid import (
    MultigridPreconditioner)
from generative_physics_informed_pde_tpu.fem.batched_solver import (
    _apply_stencil_blast)


def build(n, B, fence: bool):
    grid = StructuredTriGrid(n, n)
    op = StencilOperator(grid)
    prof = DirichletProfile(grid)
    mg = MultigridPreconditioner.for_grid(grid)
    Ny = Nx = n + 1
    mask_np = np.asarray(prof.free_mask, np.float32).reshape(Ny, Nx)

    def solve(alphas, b_flat):
        coefs = jnp.moveaxis(op.coefficients(alphas), 0, -1)
        mask = jnp.asarray(mask_np)[..., None]
        levels = mg.setup(alphas)

        def matvec(v):
            return mask * _apply_stencil_blast(coefs, mask * v)

        if fence:
            def pre(r):
                return jax.lax.optimization_barrier(
                    mg.apply(levels, jax.lax.optimization_barrier(r)))
        else:
            def pre(r):
                return mg.apply(levels, r)

        b = mask * jnp.moveaxis(b_flat.reshape(-1, Ny, Nx), 0, -1)
        x0 = jnp.zeros_like(b)
        r0 = b
        z0 = pre(r0)
        g0 = jnp.sum(r0 * z0, axis=(0, 1))

        def body(state):
            x, r, p, gamma, k = state
            Ap = matvec(p)
            denom = jnp.sum(p * Ap, axis=(0, 1))
            alpha = gamma / jnp.where(denom == 0, 1.0, denom)
            x = x + alpha[None, None] * p
            r = r - alpha[None, None] * Ap
            z = pre(r)
            gn = jnp.sum(r * z, axis=(0, 1))
            beta = gn / jnp.where(gamma == 0, 1.0, gamma)
            return (x, r, z + beta[None, None] * p, gn, k + 1)

        def cond(state):
            _, r, _, _, k = state
            return jnp.logical_and(
                k < 40, jnp.any(jnp.sum(r * r, axis=(0, 1)) > 1e-10))

        x, r, *_ = jax.lax.while_loop(cond, body, (x0, r0, z0, g0, 0))
        return x, jnp.sqrt(jnp.sum(r * r, axis=(0, 1)))

    return grid, jax.jit(solve)


def run(n, B, fence):
    tag = "pcg_fenced" if fence else "pcg_fused"
    grid, solve = build(n, B, fence)
    key = jax.random.PRNGKey(0)
    alphas = jnp.exp(0.8 * jax.random.normal(
        key, (B, grid.n_cells), jnp.float32))
    b = jax.random.normal(key, (B, grid.n_nodes), jnp.float32)
    try:
        x, rnorm = solve(alphas, b)
        print(f"{tag}: OK  max residual {float(rnorm.max()):.2e}")
    except Exception as e:  # noqa: BLE001 -- we are documenting a fault
        print(f"{tag}: FAULT  {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(f"devices: {jax.devices()}  n={n} B={B}")
    run(n, B, fence=True)
    run(n, B, fence=False)
