"""Batch-last ("structure-of-arrays") batched full-order solver.

The vmapped per-sample CG keeps arrays as (B, Ny, Nx): the trailing grid
axis (Ny*Nx, e.g. 65) maps poorly onto the TPU's (8, 128) vector registers
and every stencil shift touches misaligned lanes.  This module lays the
batch out LAST -- (Ny, Nx, B) -- so the batch fills the 128-wide lane
dimension perfectly, stencil shifts become cheap sublane moves, and every
CG operation is a dense aligned VPU op.  Per-sample CG scalars (step
sizes, convergence) reduce over the two leading spatial axes only.

Same math, same implicit-function-theorem VJP as ``make_fom_solver``
(fem/solvers.py); this is purely a performance layout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .assembly import StencilOperator, _OFFSETS, _SYM_DIRS


def _apply_stencil_blast(coefs, v):
    """coefs (7, Ny, Nx, B), v (Ny, Nx, B) -> (Ny, Nx, B)."""
    Ny, Nx = v.shape[0], v.shape[1]
    vp = jnp.pad(v, ((1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(v)
    for k, (oy, ox) in enumerate(_OFFSETS):
        out = out + coefs[k] * vp[1 + oy:1 + oy + Ny, 1 + ox:1 + ox + Nx, :]
    return out


def _apply_stencil_sym_blast(coefs4, v):
    """Symmetric-form apply: coefs4 (4, Ny, Nx, B) = [diag, c_N, c_E, c_D],
    v (Ny, Nx, B) -> (Ny, Nx, B).  Each off-diagonal grid is used for both
    the +dir and (shifted) -dir coupling -- 4 coefficient reads instead of
    7 on the HBM-bandwidth-bound hot path."""
    Ny, Nx = v.shape[0], v.shape[1]
    vp = jnp.pad(v, ((1, 1), (1, 1), (0, 0)))
    out = coefs4[0] * v
    for k, (oy, ox) in enumerate(_SYM_DIRS):
        c = coefs4[1 + k]
        cp = jnp.pad(c, ((1, 1), (1, 1), (0, 0)))
        out = out + c * vp[1 + oy:1 + oy + Ny, 1 + ox:1 + ox + Nx, :]
        out = out + (cp[1 - oy:1 - oy + Ny, 1 - ox:1 - ox + Nx, :]
                     * vp[1 - oy:1 - oy + Ny, 1 - ox:1 - ox + Nx, :])
    return out


def _batched_pcg(matvec, b, mask, precond, tol, maxiter, fence=True,
                 fused_rr=True):
    """PCG with per-sample scalars; arrays (Ny, Nx, B); ``matvec`` the
    masked SPD operator, ``precond`` a linear SPD map r -> z (Jacobi diag
    or a multigrid V-cycle).

    ``fused_rr``: carry the residual norm as a per-sample scalar computed
    in the body alongside ``gamma = <r, z>`` (one read of r feeds both
    reductions), so the while_loop ``cond`` reads B scalars instead of
    re-streaming the full (Ny, Nx, B) residual -- one fewer HBM pass per
    CG iteration.  False restores the cond-side dot(r, r) for A/B
    measurement (benchmarks/mg_bench.py --rr)."""

    def dot(a, c):
        return jnp.sum(a * c, axis=(0, 1))  # (B,)

    if fence:
        def pre(r):
            # Fence the preconditioner off from the CG body ops: letting
            # XLA fuse a multigrid V-cycle into the CG axpy/reduction
            # kernel produces a fused kernel that faults the TPU runtime
            # at 256^2 for batches > 8 (v5e, observed 2026-08-16; repro
            # in benchmarks/mg_repro.py -- pcg_pre faults, pcg_barrier
            # passes).  The fault is V-cycle-specific, so the trivial
            # Jacobi scale stays fused into the CG body (fence=False).
            return jax.lax.optimization_barrier(
                precond(jax.lax.optimization_barrier(r)))
    else:
        pre = precond

    b = mask * b
    bnorm2 = dot(b, b)
    atol2 = (tol ** 2) * bnorm2

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = pre(r0)
    gamma0 = dot(r0, z0)

    def cond(state):
        _, r, _, _, rr, k = state
        live = rr > atol2 if fused_rr else dot(r, r) > atol2
        return jnp.logical_and(k < maxiter, jnp.any(live))

    def body(state):
        x, r, p, gamma, _, k = state
        Ap = matvec(p)
        denom = dot(p, Ap)
        alpha = gamma / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha[None, None, :] * p
        r = r - alpha[None, None, :] * Ap
        z = pre(r)
        # <r,z> and <r,r> in one pass over r (fused reduction pair)
        gamma_new = dot(r, z)
        rr = dot(r, r) if fused_rr else bnorm2
        beta = gamma_new / jnp.where(gamma == 0, 1.0, gamma)
        p = z + beta[None, None, :] * p
        return (x, r, p, gamma_new, rr, k + 1)

    x, r, _, _, _, k = jax.lax.while_loop(
        cond, body, (x0, r0, z0, gamma0, bnorm2, 0))
    return x


def make_batched_fom_solver(op: StencilOperator, profile, *, tol=None,
                            maxiter=None, precond: str = "auto",
                            use_pallas: bool = False,
                            precond_dtype: str | None = None,
                            sym: bool = False, fused_rr: bool = True):
    """Build ``solve(alphas, bc_values) -> Y_free`` for a whole batch:
    alphas (B, n_cells), bc_values (B, n_constrained) -> (B, n_free),
    differentiable w.r.t. alphas via one adjoint batched CG.

    ``precond``: 'jacobi' | 'mg' | 'auto' (multigrid V-cycle on any grid
    with both dims even and min dim >= 64 whose profile is the standard
    left/right DirichletProfile, else Jacobi with a loud warning at
    sizes where that costs real throughput -- thresholds measured, see
    below).
    ``use_pallas``: route the masked stencil matvec through the Pallas
    kernel (ops/stencil.py) instead of the XLA-fused shifts.
    ``sym``: use the symmetric 4-grid coefficient form for every stencil
    apply in the solve (matvec, rhs, adjoint) -- 4 coefficient streams
    instead of 7 (K is symmetric; the apply reuses each off-diagonal grid
    for the +dir and -dir coupling).  Measured on v5e
    (benchmarks/mg_bench.py --sym): a WASH under MG (1.02x at 64^2,
    0.97x at 128^2 -- the V-cycle smoother still streams the 7-grid
    form, so only the outer CG matvec changes), 1.7x SLOWER under
    Jacobi (the extra rolls to reconstruct +dir/-dir coupling outweigh
    the 3 saved streams), and it triggered a TPU worker crash at 256^2
    B=64 -- hence default False; kept for A/B measurement.
    Ignored on the Pallas path, whose kernel takes the 7-grid form.
    ``precond_dtype``: internal dtype of the multigrid V-cycle.  The
    V-cycle only preconditions CG (a fixed SPD operator), so bfloat16
    halves the smoother HBM traffic at identical solution accuracy; the
    CG matvec itself always runs in the data dtype.  Default: bfloat16
    on TPU for grids up to 256^2 (measured 1.06x at 128^2/256^2,
    residuals unchanged), float32 beyond -- bf16 rounding compounds
    across the deeper hierarchy and costs PCG iterations instead of
    saving bytes (measured on v5e: 512^2 f32 95.5 vs bf16 55.0
    solves/s; 1024^2 f32 25.5 vs bf16 2.5, which stalls at the
    iteration cap -- benchmarks/mg_bench.py --scale).  Float32 on CPU
    always (emulated bf16 is slow).
    """
    if precond_dtype is None:
        from ..utils.backend import effective_platform
        precond_dtype = ("bfloat16"
                         if (effective_platform() == "tpu"
                             and max(op.grid.nx, op.grid.ny) <= 256)
                         else "float32")
    grid = op.grid
    Ny, Nx = grid.ny + 1, grid.nx + 1
    if precond not in ("auto", "mg", "jacobi"):
        raise ValueError(f"precond must be 'auto', 'mg' or 'jacobi', "
                         f"got {precond!r}")
    # the V-cycle's level masks assume the standard left/right Dirichlet
    # profile (multigrid._level_static builds DirichletProfile per
    # level); for any other constraint set MG would smooth the wrong dof
    # set silently
    from .bc import DirichletProfile
    _std_profile = np.array_equal(
        np.asarray(profile.free_mask),
        np.asarray(DirichletProfile(grid).free_mask))
    if precond == "auto":
        # thresholds measured on v5e (benchmarks/mg_bench.py --threshold
        # and --envelope, B=1024): 64^2 MG-PCG 2.70x Jacobi; 32^2 a wash
        # (1.03x), so Jacobi keeps the faster compile there.  Square
        # powers of two are NOT required: MG wins 4.8x at 96^2, 4.5x at
        # 128x64, 2.9x at 100^2 (only 3 V-cycle levels) and 12.7x at
        # 192^2 -- the gate admits any grid that coarsens at least once
        # (both dims even) with min dim >= 64.  (A v5e runtime fault at
        # 256^2 batch>8 was traced to XLA fusing the V-cycle into the CG
        # body kernel; _batched_pcg fences the preconditioner with
        # optimization_barrier -- see benchmarks/mg_repro.py.)
        mg_ok = (min(grid.nx, grid.ny) >= 64 and grid.nx % 2 == 0
                 and grid.ny % 2 == 0 and _std_profile)
        precond = "mg" if mg_ok else "jacobi"
        if not mg_ok and min(grid.nx, grid.ny) >= 64:
            # loud fallback: at this size Jacobi-PCG is 2.7-12.7x slower
            # than MG (measured); the user should know why they get it
            import warnings
            if grid.nx % 2 or grid.ny % 2:
                why = ("an odd grid dimension prevents coarsening; pad "
                       "the grid to even dims to enable it")
            else:
                why = ("a non-standard constraint profile (the V-cycle "
                       "level masks assume the left/right "
                       "DirichletProfile)")
            warnings.warn(
                f"auto precond chose Jacobi-PCG for {grid.nx}x{grid.ny} "
                f"because {why}; multigrid is 2.7-12.7x faster where it "
                "applies (benchmarks/mg_bench.py --envelope).",
                stacklevel=2)
    mg = None
    if precond == "mg":
        if not _std_profile:
            raise ValueError(
                "precond='mg' requires the standard left/right "
                "DirichletProfile (the V-cycle level masks assume it); "
                "use 'jacobi' for custom constraint sets")
        from .multigrid import MultigridPreconditioner
        mg = MultigridPreconditioner.for_grid(grid, dtype=precond_dtype)
        maxiter = maxiter or 60
    maxiter = maxiter or max(200, 30 * max(grid.nx, grid.ny))
    free_mask_np = np.asarray(profile.free_mask, dtype=np.float64
                              ).reshape(Ny, Nx)
    free_dofs = np.asarray(profile.free_dofs)
    con_dofs = np.asarray(profile.constrained_dofs)

    def _to_blast(flat):
        """(B, n_nodes) -> (Ny, Nx, B)"""
        return jnp.moveaxis(flat.reshape(-1, Ny, Nx), 0, -1)

    def _from_blast(grids):
        return jnp.moveaxis(grids, -1, 0).reshape(-1, Ny * Nx)

    sym = bool(sym and not use_pallas)
    if sym:
        # Measured-dangerous configuration: the symmetric 4-grid apply
        # faulted the v5e TPU worker at 256^2 B=64 (PARITY round 4,
        # benchmarks/mg_bench.py --sym), on top of being a wash (MG) or
        # 1.7x slower (Jacobi) where it does run.  Refuse it outright at
        # the faulting sizes rather than letting a settable flag kill
        # the process.
        from ..utils.backend import effective_platform
        if (effective_platform() == "tpu"
                and max(grid.nx, grid.ny) >= 256):
            raise ValueError(
                "sym=True (symmetric 4-grid stencil apply) is disabled "
                f"on TPU for grids >= 256 (got {grid.nx}x{grid.ny}): it "
                "crashed the TPU worker at 256^2 B=64 (PARITY round 4, "
                "benchmarks/mg_bench.py --sym) and offers no measured "
                "speedup.  Use the default 7-grid apply.")
    _apply = _apply_stencil_sym_blast if sym else _apply_stencil_blast

    def _coefs_blast(alphas):
        # (B, 4|7, Ny, Nx) -> (4|7, Ny, Nx, B)
        c = op.coefficients_sym(alphas) if sym else op.coefficients(alphas)
        return jnp.moveaxis(c, 0, -1)

    def _masked_matvec(coefs, mask):
        if use_pallas:
            from ..ops.stencil import apply_stencil

            from ..utils.backend import effective_platform
            interp = effective_platform() != "tpu"
            return lambda v: apply_stencil(coefs, mask * v, mask,
                                           interpret=interp)
        return lambda v: mask * _apply(coefs, mask * v)

    def _mg_for_dtype(dtype):
        mg_ = mg
        if dtype == jnp.float64:
            # f64 solves (CPU oracle paths, tol 1e-10) need the tight
            # preconditioner; the bf16 traffic cut is a TPU concern
            import dataclasses as _dc
            mg_ = _dc.replace(mg, dtype="float64")
        return mg_

    def _make_precond(alphas, coefs, mask, dtype, levels=None):
        """-> (precond_fn, levels): ``levels`` is the V-cycle hierarchy,
        returned so the VJP can reuse the forward's setup instead of
        re-coarsening all coefficients (None on the Jacobi path)."""
        diag = coefs[0]
        inv_diag = mask / jnp.where(diag <= 0, 1.0, diag)
        if mg is None:
            return (lambda r: inv_diag * r), None
        mg_ = _mg_for_dtype(dtype)
        if levels is None:
            levels = mg_.setup(alphas)
        return (lambda r: mg_.apply(levels, r)), levels

    def _forward_core(alphas, bc_values):
        dtype = alphas.dtype
        tol_ = tol if tol is not None else (
            1e-10 if dtype == jnp.float64 else 2e-6)
        B = alphas.shape[0]
        coefs = _coefs_blast(alphas)
        mask = jnp.asarray(free_mask_np, dtype=dtype)[..., None]
        pre, levels = _make_precond(alphas, coefs, mask, dtype)

        bc_full = jnp.zeros((B, Ny * Nx), dtype=dtype
                            ).at[:, con_dofs].set(bc_values.astype(dtype))
        bc_g = _to_blast(bc_full)
        rhs = -_apply(coefs, bc_g)
        y_free_g = _batched_pcg(_masked_matvec(coefs, mask), rhs, mask, pre,
                                tol_, maxiter, fence=mg is not None,
                                fused_rr=fused_rr)
        y_full = _from_blast(y_free_g + bc_g)
        return y_full, (coefs, mask, tol_, levels)

    @jax.custom_vjp
    def solve(alphas, bc_values):
        y_full, _ = _forward_core(alphas, bc_values)
        return y_full[:, free_dofs]

    def _fwd(alphas, bc_values):
        y_full, (coefs, mask, tol_, levels) = _forward_core(alphas, bc_values)
        return (y_full[:, free_dofs],
                (alphas, bc_values, y_full, coefs, mask, tol_, levels))

    def _bwd(res, ybar):
        alphas, bc_values, y_full, coefs, mask, tol_, levels = res
        B = alphas.shape[0]
        pre, _ = _make_precond(alphas, coefs, mask, alphas.dtype,
                               levels=levels)
        ybar_full = jnp.zeros((B, Ny * Nx), dtype=ybar.dtype
                              ).at[:, free_dofs].set(ybar)
        lam_g = _batched_pcg(_masked_matvec(coefs, mask), _to_blast(ybar_full),
                             mask, pre, tol_, maxiter, fence=mg is not None,
                             fused_rr=fused_rr)
        lam = _from_blast(lam_g)
        alpha_bar = -op.cell_bilinear(lam, y_full)
        # bc gradient: direct part + coupling through K
        Klam = _from_blast(_apply(coefs, lam_g))
        m_flat = jnp.asarray(free_mask_np.reshape(-1), dtype=lam.dtype)
        bc_full_bar = (1.0 - m_flat)[None, :] * (ybar_full - Klam)
        bc_bar = bc_full_bar[:, con_dofs]
        # cotangents must match the PRIMAL dtypes (a f32-alphas/f64-bc
        # mixed call would otherwise crash the custom_vjp shape check)
        return (alpha_bar.astype(alphas.dtype),
                bc_bar.astype(bc_values.dtype))

    solve.defvjp(_fwd, _bwd)
    return solve
