#!/usr/bin/env python
"""Multigrid-PCG throughput: f32 vs bf16 V-cycle internals.

The V-cycle preconditions CG; its internal dtype only perturbs the
(fixed, SPD) preconditioning operator, so bfloat16 halves the smoother
HBM traffic -- the dominant cost of MG-PCG at 128^2+ -- at identical
final accuracy (the CG matvec and residuals stay f32).  This measures
batched label-solve throughput and verifies the true residual.

Usage: python benchmarks/mg_bench.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from generative_physics_informed_pde_tpu import fem


def true_residual(fom, alphas, vals, Y):
    """||K_ff y - f_eff|| / ||f_eff|| via the stencil operator (f32)."""
    op = fom.op
    free = np.asarray(fom.profile.free_dofs)
    con = np.asarray(fom.profile.constrained_dofs)
    n = fom.grid.n_nodes
    B = alphas.shape[0]
    y_full = jnp.zeros((B, n), Y.dtype).at[:, free].set(Y)
    y_full = y_full.at[:, con].set(vals)
    r = jax.vmap(op.matvec)(alphas, y_full)[:, free]
    b = -jax.vmap(op.matvec)(
        alphas, jnp.zeros((B, n), Y.dtype).at[:, con].set(vals))[:, free]
    return float(jnp.linalg.norm(r) / jnp.linalg.norm(b))


def run(n, B, precond_dtype, reps=3, precond="mg", fields="lognormal",
        maxiter=None, ny=None, sym=False, fused_rr=True):
    # FOM only -- skip make_fom_rom_pair's dense W (1M x 81 at 1024^2)
    ny = ny or n
    grid = fem.StructuredTriGrid(n, ny)
    fom = fem.LinearEllipticPhysics("fom", "NDP", grid)
    assert fom.grid.nx == n, (fom.grid.nx, n)
    from generative_physics_informed_pde_tpu.fem.batched_solver import (
        make_batched_fom_solver)
    solve = jax.jit(make_batched_fom_solver(
        fom.op, fom.profile, precond=precond, precond_dtype=precond_dtype,
        maxiter=maxiter, sym=sym, fused_rr=fused_rr))
    key = jax.random.PRNGKey(0)
    if fields == "matern":
        # config-3's conductivity family: Matern-3/2, log-stddev 1.0 --
        # per-batch contrast max/min ~1e4 (the regime the ADVICE review
        # flagged as uncovered by the bf16 V-cycle parity evidence)
        rf = fem.GaussianRandomField.from_image(
            n, n, mean=0.4, stddev=1.0, corrlength=0.08, method="fft",
            kernel="matern32")
        x = rf.sample(key, batch_size=B, dtype=jnp.float32)
        conv = fem.PixelConverter(fom.grid)
        alphas = jnp.exp(conv.image_to_function(x))
        contrast = float(jnp.max(jnp.exp(x)) / jnp.min(jnp.exp(x)))
        print(f"    matern fields: contrast {contrast:.1e}", flush=True)
    else:
        alphas = jnp.exp(0.8 * jax.random.normal(
            key, (B, fom.grid.n_cells), jnp.float32))
    dims = f"{n}^2" if ny == n else f"{n}x{ny}"
    theta = jax.random.uniform(key, (B, 4), minval=-0.5, maxval=0.5)
    vals = fom.profile.constrained_values(theta).astype(jnp.float32)
    Y = solve(alphas, vals)
    float(Y.sum())  # compile + run
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(solve(alphas, vals).sum())
        best = min(best, time.perf_counter() - t0)
    res = true_residual(fom, alphas, vals, Y)
    tag = precond if precond != "mg" else f"mg/{precond_dtype}"
    print(f"{dims} B={B} {tag:12s}: {B / best:8.1f} solves/s "
          f"({best * 1e3:7.1f} ms)  true rel residual {res:.2e}", flush=True)
    return B / best, res


def threshold_study():
    """VERDICT r2 item 4: is the auto-MG nx>=128 threshold justified, or
    does MG-PCG already beat Jacobi-PCG at 64^2?  Measure both at the
    driver-metric shape (64^2 x B=1024) and at 32^2."""
    for (n, B) in [(32, 1024), (64, 1024)]:
        sj, rj = run(n, B, None, precond="jacobi")
        sm, rm = run(n, B, "bfloat16", precond="mg")
        winner = "mg" if sm > sj else "jacobi"
        print(f"  -> {n}^2 winner: {winner} ({sm / sj:.2f}x mg/jacobi, "
              f"residuals {rj:.1e} vs {rm:.1e})", flush=True)


def contrast_study():
    """ADVICE r2: the bf16 V-cycle parity evidence covered only benign
    lognormal alphas; a rounded (input-dependent) preconditioner under
    standard PCG with recurrence-residual termination could silently
    under-converge on high-contrast fields.  Verify the TRUE residual on
    config-3's Matern-3/2 stddev-1.0 fields, f32 vs bf16 V-cycle."""
    for (n, B) in [(64, 512), (128, 128)]:
        s32, r32 = run(n, B, "float32", fields="matern")
        s16, r16 = run(n, B, "bfloat16", fields="matern")
        ok = r16 < 3e-5  # ~10x the 2e-6 recurrence tol is the alarm line
        print(f"  -> {n}^2 matern: bf16 true residual {r16:.1e} vs f32 "
              f"{r32:.1e}  [{'OK' if ok else 'UNDER-CONVERGED'}]",
              flush=True)


def scale_study():
    """Headroom beyond the reference's own caps: the reference cannot
    even SAMPLE fields past 8192 dims (RandomField.py:43 caps the dense
    covariance, i.e. <= 90^2), let alone solve batches at 512^2+.  The
    stencil-operator + MG-PCG path has no such cap -- measure batched
    label-solve throughput at 512^2 and 1024^2 (pow2 grids share the
    same V-cycle machinery; B sized to keep the workspace in HBM).

    Both dtypes per grid: this study found the bf16 V-cycle inverts
    past 256^2 (rounding compounds across the deeper hierarchy and
    costs PCG iterations -- at 1024^2 it stalls at the iteration cap),
    which moved the auto precond_dtype default to f32 for nx > 256."""
    for (n, B) in [(512, 32), (1024, 8)]:
        s32, r32 = run(n, B, "float32", maxiter=150)
        s16, r16 = run(n, B, "bfloat16", maxiter=150)
        dofs = (n + 1) ** 2 * s32
        print(f"  -> {n}^2: f32 {s32:.1f} solves/s (res {r32:.1e}) = "
              f"{dofs / 1e6:.0f}M dof-solves/s; bf16 {s16:.1f} "
              f"(res {r16:.1e})", flush=True)


def envelope_study():
    """VERDICT r3 item 6: the auto-MG gate admitted only square
    power-of-two grids >= 64^2, silently dropping 96^2 / 64x128 / 100^2
    to Jacobi-PCG (2.7x slower at 64^2).  The V-cycle machinery actually
    coarsens ANY grid whose dims stay jointly even (96 -> 48 -> 24 -> 12
    -> 6); measure whether MG wins off the power-of-two envelope so the
    gate can be evidence-based."""
    for (nx, ny, B) in [(96, 96, 1024), (128, 64, 1024), (100, 100, 1024),
                        (192, 192, 256)]:
        sj, rj = run(nx, B, None, precond="jacobi", ny=ny)
        sm, rm = run(nx, B, "bfloat16", precond="mg", ny=ny)
        winner = "mg" if sm > sj else "jacobi"
        print(f"  -> {nx}x{ny} winner: {winner} ({sm / sj:.2f}x mg/jacobi,"
              f" residuals {rj:.1e} vs {rm:.1e})", flush=True)


def sym_study():
    """VERDICT r3 item 5: the stencil apply sits 1.6-1.8x off the 9-stream
    roofline; the remaining lever is fewer streams per CG/MG iteration.
    A/B the symmetric 4-coefficient apply (reuses each off-diagonal grid
    for +dir/-dir coupling: 4 coefficient streams/apply instead of 7)
    against the 7-grid form at the production shapes, both preconds."""
    for (n, B, pc, dt) in [(64, 1024, "mg", "bfloat16"),
                           (64, 1024, "jacobi", None),
                           (128, 256, "mg", "float32"),
                           (256, 64, "mg", "float32")]:
        s7, r7 = run(n, B, dt, precond=pc, sym=False)
        s4, r4 = run(n, B, dt, precond=pc, sym=True)
        print(f"  -> {n}^2 {pc}: sym4 {s4 / s7:.3f}x vs 7-grid "
              f"(residuals {r7:.1e} vs {r4:.1e})", flush=True)


def rr_study():
    """A/B the fused-rr CG loop (residual norm carried as a per-sample
    scalar from the body) against the round-3 form (cond re-streams the
    full residual each iteration).  Interleaved in ONE process, 2 rounds,
    because cross-process variance on the tunnel reaches ~15-40%."""
    for rnd in range(2):
        for (n, B, pc, dt) in [(64, 1024, "mg", "bfloat16"),
                               (64, 1024, "jacobi", None),
                               (128, 256, "mg", "float32")]:
            sa, _ = run(n, B, dt, reps=5, precond=pc, fused_rr=False)
            sb, _ = run(n, B, dt, reps=5, precond=pc, fused_rr=True)
            print(f"  -> rnd{rnd} {n}^2 {pc}: fused_rr {sb / sa:.3f}x "
                  f"vs cond-side dot(r,r)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    if "--rr" in sys.argv:
        rr_study()
        return
    if "--sym" in sys.argv:
        sym_study()
        return
    if "--threshold" in sys.argv:
        threshold_study()
        return
    if "--contrast" in sys.argv:
        contrast_study()
        return
    if "--scale" in sys.argv:
        scale_study()
        return
    if "--envelope" in sys.argv:
        envelope_study()
        return
    for (n, B) in [(128, 256), (256, 64)]:
        s32, r32 = run(n, B, "float32")
        s16, r16 = run(n, B, "bfloat16")
        print(f"  -> bf16 V-cycle speedup {s16 / s32:.2f}x "
              f"(residuals {r32:.1e} vs {r16:.1e})", flush=True)


if __name__ == "__main__":
    main()
