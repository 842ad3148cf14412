"""Batched linear solvers for the embedded FEM problems.

TPU-native replacements for:

* ``torch.solve`` batched dense ROM solves (reference: bottleneck/ROM.py:59-88)
  -> ``rom_solve`` (vmapped LU on the MXU, differentiable through
  ``jnp.linalg.solve``'s implicit rules).
* FEniCS/scipy ``spsolve`` full-order solves (reference:
  physics/LinearElliptic.py:85-133, the per-sample label loop in
  utils/data.py:96-99) -> matrix-free Jacobi-preconditioned conjugate
  gradients on the stencil operator, batched with ``vmap`` and fitted with a
  custom implicit-function-theorem VJP so gradients cost one extra solve
  instead of unrolling the iteration.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .assembly import StencilOperator
from ..utils.backend import effective_platform


# --------------------------------------------------------------------------
# Dense (coarse/ROM) path
# --------------------------------------------------------------------------

def stiffness_from_tensor(M: jnp.ndarray, alpha: jnp.ndarray,
                          bc_dofs: jnp.ndarray) -> jnp.ndarray:
    """Batched dense stiffness with Dirichlet rows replaced by identity.

    ``K[n] = M . alpha[n]`` then ``K[bc, :] = e_bc`` (reference:
    bottleneck/ROM.py:91-100 GetStiffness).  M: (d, d, c), alpha: (..., c).
    """
    K = jnp.einsum("ijc,...c->...ij", M, alpha)
    d = K.shape[-1]
    row_is_bc = jnp.zeros(d, dtype=bool).at[bc_dofs].set(True)
    eye = jnp.eye(d, dtype=K.dtype)
    return jnp.where(row_is_bc[:, None], eye, K)


def rom_solve(M: jnp.ndarray, alpha: jnp.ndarray, F: jnp.ndarray,
              bc_dofs: jnp.ndarray, max_chunk: Optional[int] = None
              ) -> jnp.ndarray:
    """Differentiable batched coarse solve ``K(alpha) y = F``.

    alpha: (..., c) positive conductivities; F: (..., d) force vectors that
    already carry the Dirichlet values at ``bc_dofs`` (reference:
    bottleneck/ROM.py:65-88 __call__).  Returns (..., d).

    Solved via the symmetric reduced system ``K_ff y_f = F_f - K_fc y_c``
    with a batched Cholesky factorisation (K_ff is SPD for positive
    conductivities) instead of the reference's row-replaced LU
    (torch.solve, ROM.py:59-61): measured 1.9-2.6x faster fwd+VJP on v5e
    at B>=2048 and -- unlike the LU path, whose triangular-solve kernel
    OOM'd scoped VMEM beyond ~128 systems -- it runs 8k+ systems in one
    dispatch.

    ``max_chunk`` defaults to 2048 on TPU and 8192 elsewhere.  The TPU
    cap is a measured runtime fault boundary, NOT a throughput choice:
    on the v5e runtime a program that feeds elementwise work (the
    model's ``exp(effprop)``) into this dense-solve block crashes the
    TPU worker outright for flat batches >= ~3072 (2048 is clean, 3072
    and 4096 fault; a solve-only program at 4096 is fine, and the
    ``optimization_barrier`` fence below does NOT prevent it).  Chunking
    through ``lax.map`` at 2048 sidesteps the fault -- kept repro:
    ``benchmarks/rom_fusion_repro.py``.  This was the cause of every
    "first monitor eval kills the worker" crash in the 64^2 configs
    (N_val x N_mc = 64 x 64 = 4096 flat solves).
    """
    # promote to one dtype up front: the scatter at the end
    # (out.at[FREE].set(yf)) must be same-dtype -- mixed f64/f32 inputs
    # (the x64 analysis path) used to downcast silently and will be a hard
    # error on future JAX (scatter dtype FutureWarning).
    if max_chunk is None:
        max_chunk = 2048 if effective_platform() == "tpu" else 8192
    dt = jnp.result_type(M.dtype, alpha.dtype, F.dtype)
    M = M.astype(dt)
    alpha = alpha.astype(dt)
    F = F.astype(dt)
    bc = np.asarray(bc_dofs)
    d = F.shape[-1]
    free = np.setdiff1d(np.arange(d), bc)
    FREE = jnp.asarray(free)
    BC = jnp.asarray(bc)

    def solve_batch(a, f):
        # fence the dense-solve block off from surrounding elementwise
        # work: XLA fusing the caller's exp/einsum chains into the
        # Cholesky kernels faults the v5e runtime at B ~ 4k (same failure
        # class as the multigrid-in-CG fault, benchmarks/mg_repro.py)
        a, f = jax.lax.optimization_barrier((a, f))
        K = jnp.einsum("ijc,...c->...ij", M, a)
        Kff = K[..., FREE[:, None], FREE[None, :]]
        L = jnp.linalg.cholesky(Kff)
        rhs = f[..., FREE]
        if len(bc):
            Kfc = K[..., FREE[:, None], BC[None, :]]
            yc = f[..., BC]
            rhs = rhs - jnp.einsum("...ij,...j->...i", Kfc, yc)
        yf = jax.scipy.linalg.cho_solve((L, True), rhs[..., None])[..., 0]
        out = f if len(bc) else jnp.zeros_like(f)
        return jax.lax.optimization_barrier(out.at[..., FREE].set(yf))

    batch_shape = alpha.shape[:-1]
    total = int(np.prod(batch_shape)) if batch_shape else 1
    if total <= max_chunk:
        return solve_batch(alpha, jnp.broadcast_to(F, batch_shape + (d,)))

    c = alpha.shape[-1]
    a2 = alpha.reshape(total, c)
    f2 = jnp.broadcast_to(F, batch_shape + (d,)).reshape(total, d)
    n_chunks = -(-total // max_chunk)
    pad = n_chunks * max_chunk - total
    a2 = jnp.pad(a2, ((0, pad), (0, 0)), constant_values=1.0)
    f2 = jnp.pad(f2, ((0, pad), (0, 0)))
    out = jax.lax.map(lambda args: solve_batch(*args),
                      (a2.reshape(n_chunks, max_chunk, c),
                       f2.reshape(n_chunks, max_chunk, d)))
    return out.reshape(n_chunks * max_chunk, d)[:total].reshape(
        batch_shape + (d,))


# --------------------------------------------------------------------------
# Matrix-free CG (fine/FOM) path
# --------------------------------------------------------------------------

class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resnorm: jnp.ndarray


def cg(matvec, b, x0=None, *, precond=None, tol=1e-10, maxiter=1000) -> CGResult:
    """Preconditioned conjugate gradients with static shapes.

    ``matvec``/``precond`` are pure functions on pytrees shaped like ``b``.
    Termination: ``||r|| <= tol * ||b||`` or ``maxiter`` (lax.while_loop,
    jit-compatible; no data-dependent Python control flow).
    """
    if precond is None:
        precond = lambda r: r
    if x0 is None:
        x0 = jnp.zeros_like(b)

    bnorm = jnp.sqrt(jnp.vdot(b, b).real)
    atol2 = (tol * bnorm) ** 2

    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    gamma0 = jnp.vdot(r0, z0).real

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(k < maxiter, jnp.vdot(r, r).real > atol2)

    def body(state):
        x, r, p, gamma, k = state
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap).real
        alpha = gamma / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        gamma_new = jnp.vdot(r, z).real
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        p = z + beta * p
        return (x, r, p, gamma_new, k + 1)

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x0, r0, p0, gamma0, 0))
    return CGResult(x, k, jnp.sqrt(jnp.vdot(r, r).real))


def make_fom_solver(op: StencilOperator, free_mask_np, *, tol=None,
                    maxiter=None):
    """Build a differentiable full-order solver for one grid + BC family.

    Returns ``solve(alpha, f_full, bc_full) -> y_full`` where

    * ``alpha``   (n_cells,) positive conductivities,
    * ``f_full``  (n_nodes,) raw Neumann/source force vector (zero in both
      reference problem families),
    * ``bc_full`` (n_nodes,) Dirichlet values scattered to constrained dofs
      (zero elsewhere),

    and ``y_full`` carries the Dirichlet values at constrained dofs.  The
    Dirichlet elimination ``K_ff y_f = f_f - K_fc y_c`` (reference:
    physics/LinearElliptic.py:137-159) is realised matrix-free with the
    masked operator ``A(v) = m * K(m * v)`` which is SPD on the free
    subspace.  Gradients w.r.t. ``alpha`` and ``f_full`` come from the
    implicit function theorem: one adjoint CG solve plus a per-cell
    bilinear contraction (no unrolling).
    """
    # Jacobi-PCG on the 2D elliptic stencil converges in O(grid side)
    # iterations; 30x the side is a comfortable ceiling.
    maxiter = maxiter or max(200, 30 * max(op.grid.nx, op.grid.ny))
    Ny, Nx = op.grid.ny + 1, op.grid.nx + 1
    # keep closure constants as NUMPY: a cached jnp array built while some
    # outer jit is tracing would leak a tracer into later calls.
    free_mask_flat_np = np.asarray(free_mask_np, dtype=np.float64)
    free_mask_grid_np = free_mask_flat_np.reshape(Ny, Nx)

    def _solve_free(coefs, rhs_grid, diag):
        m = jnp.asarray(free_mask_grid_np, dtype=rhs_grid.dtype)
        inv_diag = m / jnp.where(diag <= 0, 1.0, diag)
        # dtype-aware tolerance: 1e-10 is unreachable in f32 and would
        # force every solve to run the full maxiter
        tol_ = tol if tol is not None else (
            1e-10 if rhs_grid.dtype == jnp.float64 else 2e-6)

        def matvec(v):
            return m * op.apply_coeff(coefs, m * v)

        def precond(r):
            return inv_diag * r

        res = cg(matvec, m * rhs_grid, precond=precond, tol=tol_,
                 maxiter=maxiter)
        return res.x

    @jax.custom_vjp
    def solve(alpha, f_full, bc_full):
        y, _ = _fwd(alpha, f_full, bc_full)
        return y

    def _fwd(alpha, f_full, bc_full):
        coefs = op.coefficients(alpha)
        diag = coefs[0]
        bc_grid = bc_full.reshape(Ny, Nx).astype(coefs.dtype)
        f_grid = f_full.reshape(Ny, Nx).astype(coefs.dtype)
        rhs = f_grid - op.apply_coeff(coefs, bc_grid)
        y_free = _solve_free(coefs, rhs, diag)
        y = op.to_flat(y_free + bc_grid)
        return y, (alpha, f_full, bc_full, y, coefs, diag)

    def _bwd(res, ybar):
        alpha, f_full, bc_full, y, coefs, diag = res
        ybar_grid = ybar.reshape(Ny, Nx).astype(coefs.dtype)
        # adjoint solve: K_ff^T lam = ybar_f  (K symmetric)
        lam_grid = _solve_free(coefs, ybar_grid, diag)
        lam = op.to_flat(lam_grid)
        # d/dalpha of  [ -lam^T K(alpha) y ]  (y includes the BC values, so
        # this covers both the K_ff y_f and K_fc y_c dependence)
        alpha_bar = -op.cell_bilinear(lam, y)
        f_bar = lam
        # bc_full gradient: direct term (constrained part of ybar) minus the
        # coupling through the rhs; exposed for completeness.
        m = jnp.asarray(free_mask_flat_np, dtype=lam.dtype)
        Klam = op.matvec(alpha, lam)
        bc_bar = (1.0 - m) * (ybar - Klam)
        # cotangents must match the PRIMAL dtypes (mixed f32 alpha /
        # f64 f_full+bc_full calls are natural on the CPU-oracle path)
        return (alpha_bar.astype(alpha.dtype), f_bar.astype(f_full.dtype),
                bc_bar.astype(bc_full.dtype))

    solve.defvjp(_fwd, _bwd)
    return solve
