#!/usr/bin/env python
"""Roofline measurement for the batched 7-point stiffness stencil apply.

The stencil apply is the innermost op of every CG iteration and multigrid
smoother sweep (fem/batched_solver.py).  It is HBM-bandwidth bound: per
(Ny, Nx, B) apply the minimum traffic is

    7-coef form : 7 coef grids + v + out          = 9  arrays
    sym-4 form  : 4 coef grids + v + out          = 6  arrays
    alpha-fused : 2 alpha grids + v + out         = 4  arrays

so the question is which implementation (XLA-fused shifts vs Pallas
kernels with explicit VMEM tiling) gets closest to streaming those bytes
at full HBM bandwidth.

Methodology: each variant is timed as N data-dependent applies chained
inside ONE jitted fori_loop (v_{k+1} = normalize(A v_k)), so per-apply
time excludes dispatch/tunnel latency entirely.  A jnp.copy of an
equal-size array measured the same way gives the achievable-bandwidth
reference (the "speed of light").

Run on the TPU:  python results/stencil_roofline.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from generative_physics_informed_pde_tpu.fem.grid import StructuredTriGrid
from generative_physics_informed_pde_tpu.fem.assembly import StencilOperator
from generative_physics_informed_pde_tpu.fem.bc import DirichletProfile
from generative_physics_informed_pde_tpu.fem.batched_solver import (
    _apply_stencil_blast, _apply_stencil_sym_blast)


def timed_chain(apply_fn, v0, n_iter=50, reps=3):
    """Per-apply seconds for ``v <- apply(v)/norm`` chained n_iter times."""

    @jax.jit
    def chain(v):
        def body(_, v):
            av = apply_fn(v)
            return av / jnp.sqrt(jnp.mean(av * av) + 1e-30)
        return jax.lax.fori_loop(0, n_iter, body, v)

    out = chain(v0)
    float(out.sum())  # compile + run (block via host transfer)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(v0).sum())
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best


def copy_bandwidth(nbytes, dtype=jnp.float32, reps=3):
    """Achievable HBM read+write bandwidth via chained scaled copies."""
    n = nbytes // np.dtype("float32").itemsize
    x = jnp.ones((n,), dtype)

    @jax.jit
    def chain(v):
        return jax.lax.fori_loop(0, 50, lambda _, u: u * 1.0000001, v)

    float(chain(x).sum())
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x).sum())
        best = min(best, (time.perf_counter() - t0) / 50)
    return 2 * nbytes / best  # read + write


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    itemsize = 4

    bw = copy_bandwidth(512 * 2 ** 20)
    print(f"achievable HBM bandwidth (copy): {bw / 1e9:.0f} GB/s")

    for (n, B) in [(64, 1024), (128, 256), (256, 64), (256, 128)]:
        grid = StructuredTriGrid(n, n)
        op = StencilOperator(grid)
        prof = DirichletProfile(grid)
        Ny = Nx = n + 1
        key = jax.random.PRNGKey(0)
        alphas = jnp.exp(0.5 * jax.random.normal(
            key, (B, grid.n_cells), jnp.float32))
        coefs = jnp.moveaxis(op.coefficients(alphas), 0, -1)      # (7,Ny,Nx,B)
        coefs4 = jnp.moveaxis(op.coefficients_sym(alphas), 0, -1)  # (4,...)
        mask = jnp.asarray(
            prof.free_mask.reshape(Ny, Nx)[..., None], jnp.float32)
        v0 = jax.random.normal(key, (Ny, Nx, B), jnp.float32)

        nelem = Ny * Nx * B
        t7 = timed_chain(
            lambda v: mask * _apply_stencil_blast(coefs, mask * v), v0)
        t4 = timed_chain(
            lambda v: mask * _apply_stencil_sym_blast(coefs4, mask * v), v0)

        rows = [("xla-7coef", t7, 9), ("xla-sym4", t4, 6)]

        from generative_physics_informed_pde_tpu.ops.stencil import (
            apply_stencil, apply_stencil_sym)
        interp = not on_tpu
        tp7 = timed_chain(
            lambda v: apply_stencil(coefs, mask * v, mask, interpret=interp),
            v0, n_iter=20 if interp else 50)
        rows.append(("pallas-7coef", tp7, 9))
        tps = timed_chain(
            lambda v: apply_stencil_sym(coefs4, mask * v, mask,
                                        interpret=interp),
            v0, n_iter=20 if interp else 50)
        rows.append(("pallas-sym4", tps, 6))

        # blocked layout: conversions happen once per solve, outside the
        # iteration -- time the native-layout chained apply
        from generative_physics_informed_pde_tpu.ops import stencil as st
        TY = st.choose_tile_rows(Ny, Nx)
        c_halo = st.pad_coefs_blocked(op.coefficients_sym(alphas), Ny, Nx, TY)
        mb = jnp.asarray(st.mask_blocked(
            np.asarray(prof.free_mask.reshape(Ny, Nx), np.float32), TY))
        vb0 = st.pad_blocked(jnp.moveaxis(mask * v0, -1, 0), Ny, Nx, TY)
        tb = timed_chain(
            lambda v: st.apply_stencil_sym_blocked(c_halo, v, mb, TY=TY,
                                                   interpret=interp),
            vb0, n_iter=20 if interp else 50)
        rows.append(("pallas-blocked", tb, 6))

        print(f"\n{n}^2 grid, batch {B}  ({nelem * itemsize / 2**20:.1f} MiB "
              f"per array)")
        for name, t, streams in rows:
            gbs = streams * nelem * itemsize / t / 1e9
            sol = streams * nelem * itemsize / bw
            print(f"  {name:14s} {t * 1e6:9.1f} us/apply   "
                  f"eff {gbs:6.0f} GB/s   roofline {sol * 1e6:7.1f} us "
                  f"({t / sol:4.1f}x off)")


if __name__ == "__main__":
    main()
