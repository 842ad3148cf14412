"""Matrix-free geometric multigrid preconditioner for the batched solver.

Beyond-reference performance component: the reference solves its full-order
systems with scipy ``spsolve`` / FEniCS LU one sample at a time
(physics/LinearElliptic.py:120-133, utils/data.py:96-99).  Here the batched
Jacobi-PCG (fem/batched_solver.py) gets a geometric V-cycle preconditioner
built from the same closed-form stencils on the nested grid hierarchy:

* coarse conductivities: geometric mean over the 8 fine triangles of each
  coarse square (robust for high-contrast fields),
* smoother: damped Jacobi (symmetric, batched, mask-aware),
* transfer: linear P1 interpolation along the triangulation diagonal and
  its transpose -- on nested P1 grids the rediscretised coarse operator is
  (near-)Galerkin so a symmetric V-cycle is a valid SPD preconditioner for
  CG,
* everything operates on (Ny, Nx, B) batch-last arrays (TPU lane-aligned)
  and is pure jittable stencil code.

Expected effect: O(1) CG iterations in the grid size instead of O(n),
i.e. an order of magnitude on 64^2+ grids.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .grid import StructuredTriGrid
from .assembly import StencilOperator
from .bc import DirichletProfile
from .batched_solver import _apply_stencil_blast


def _coarsen_alpha_cellgrid(a: jnp.ndarray) -> jnp.ndarray:
    """Cell-grid conductivities (ny, nx, 2, B) -> (ny/2, nx/2, 2, B) via
    the geometric mean over each coarse square's 8 fine triangles."""
    ny, nx = a.shape[0], a.shape[1]
    loga = jnp.log(a)
    # mean over the 2x2 block of squares and both orientations
    blocks = loga.reshape(ny // 2, 2, nx // 2, 2, 2, a.shape[-1])
    m = blocks.mean(axis=(1, 3, 4))                       # (ny/2, nx/2, B)
    return jnp.exp(m)[:, :, None, :].repeat(2, axis=2)    # both triangles


def _interleave(a: jnp.ndarray, b: jnp.ndarray, axis: int) -> jnp.ndarray:
    """a (n slices) and b (n-1 slices) -> (2n-1): a0 b0 a1 b1 ... a_{n-1}.

    Implemented with stack+reshape (strided scatter writes lower terribly
    on TPU)."""
    n = a.shape[axis]
    pad = jnp.zeros_like(jax.lax.slice_in_dim(b, 0, 1, axis=axis))
    b_pad = jnp.concatenate([b, pad], axis=axis)
    st = jnp.stack([a, b_pad], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] = 2 * n
    out = st.reshape(shape)
    return jax.lax.slice_in_dim(out, 0, 2 * n - 1, axis=axis)


def _prolong(e: jnp.ndarray) -> jnp.ndarray:
    """Coarse node grid (Nyc, Nxc, B) -> fine (2*Nyc-1, 2*Nxc-1, B):
    linear interpolation respecting the right-diagonal triangulation
    (odd-odd nodes average the lower-left/upper-right coarse pair)."""
    ex = 0.5 * (e[:, :-1] + e[:, 1:])
    rows_even = _interleave(e, ex, axis=1)        # (Nyc, Nx, B)
    ey = 0.5 * (e[:-1, :] + e[1:, :])
    ed = 0.5 * (e[:-1, :-1] + e[1:, 1:])
    rows_odd = _interleave(ey, ed, axis=1)        # (Nyc-1, Nx, B)
    return _interleave(rows_even, rows_odd, axis=0)


def _restrict(r: jnp.ndarray) -> jnp.ndarray:
    """Transpose of ``_prolong``: fine (Ny, Nx, B) -> coarse
    ((Ny+1)/2, (Nx+1)/2, B)."""
    rp = jnp.pad(r, ((1, 1), (1, 1), (0, 0)))
    c = rp[1:-1:2, 1:-1:2]
    out = (c
           + 0.5 * (rp[1:-1:2, 0:-2:2] + rp[1:-1:2, 2::2]
                    + rp[0:-2:2, 1:-1:2] + rp[2::2, 1:-1:2]
                    + rp[0:-2:2, 0:-2:2] + rp[2::2, 2::2]))
    return out


@dataclasses.dataclass(frozen=True)
class MultigridPreconditioner:
    """Static V-cycle setup for one (grid, BC) pair; ``setup(alphas)``
    builds the per-sample level data, ``apply`` runs one symmetric V-cycle.
    """

    grid: StructuredTriGrid
    num_levels: int
    nu_pre: int = 2
    nu_post: int = 2
    nu_coarse: int = 24
    omega: float = 0.8
    # Preconditioner-internal dtype.  The V-cycle only preconditions CG --
    # its rounding perturbs the preconditioning operator (strictly, makes
    # it weakly input-dependent), not the solution -- so bfloat16 halves
    # the smoother HBM traffic (the dominant cost at 128^2+).  TRUE
    # residuals verified identical to the f32 V-cycle on both benign
    # lognormal and high-contrast (1.8e4:1 Matern) fields on v5e:
    # PARITY.md (multigrid section), benchmarks/mg_bench.py --contrast.
    dtype: str = "float32"

    @classmethod
    def for_grid(cls, grid: StructuredTriGrid, min_size: int = 4, **kw):
        """Coarsen while BOTH dims stay even (each level halves both axes;
        counting only the min dim would over-coarsen e.g. 72x64, whose
        larger dim runs out of factors of two first) and the min dim stays
        >= ``min_size``.  Square power-of-two grids are NOT required --
        96^2 coarsens 96->48->24->12->6, 128x64 to 8x4, etc."""
        levels = 1
        nx, ny = grid.nx, grid.ny
        while (nx % 2 == 0 and ny % 2 == 0
               and min(nx, ny) // 2 >= min_size):
            nx //= 2
            ny //= 2
            levels += 1
        return cls(grid=grid, num_levels=levels, **kw)

    def _level_static(self) -> List[Tuple[StencilOperator, np.ndarray]]:
        ops = []
        g = self.grid
        for _ in range(self.num_levels):
            prof = DirichletProfile(g)
            mask = prof.free_mask.reshape(g.ny + 1, g.nx + 1)[..., None]
            ops.append((StencilOperator(g), mask))
            g = StructuredTriGrid(g.nx // 2, g.ny // 2, g.lx, g.ly)
        return ops

    def setup(self, alphas: jnp.ndarray):
        """alphas (B, n_cells) -> per-level (coefs, inv_diag, mask) with
        coefs in (7, Ny, Nx, B) batch-last layout, cast to ``self.dtype``."""
        statics = self._level_static()
        B = alphas.shape[0]
        dt = jnp.dtype(self.dtype)
        op0 = statics[0][0]
        a = op0.alpha_to_cellgrid(alphas)           # (B, ny, nx, 2)
        a = jnp.moveaxis(a, 0, -1)                  # (ny, nx, 2, B)
        levels = []
        for li, (op, mask_np) in enumerate(statics):
            # StencilOperator.coefficients expects (..., n_cells)
            a_batchfirst = jnp.moveaxis(a, -1, 0).reshape(B, -1)
            coefs = jnp.moveaxis(op.coefficients(a_batchfirst), 0, -1)
            mask = jnp.asarray(mask_np, dtype=alphas.dtype)
            diag = coefs[0]
            inv_diag = mask / jnp.where(diag <= 0, 1.0, diag)
            levels.append((coefs.astype(dt), inv_diag.astype(dt),
                           mask.astype(dt)))
            if li + 1 < len(statics):  # a coarser level follows
                a = _coarsen_alpha_cellgrid(a)
        return levels

    def apply(self, levels, r: jnp.ndarray) -> jnp.ndarray:
        """One symmetric V-cycle: r (Ny, Nx, B) -> z ~ A^{-1} r.

        Every level transition is fenced with ``optimization_barrier``:
        when the V-cycle is compiled inside a CG ``while_loop`` body, XLA
        otherwise fuses smoother+transfer chains into kernels that fault
        the v5e runtime at 256^2 for batches >~16 (benchmarks/mg_repro.py).
        The fences bound each fused kernel to one smoother sweep.

        Internal arithmetic runs in ``self.dtype`` (bfloat16 halves the
        smoother HBM traffic); the result is returned in r.dtype.
        """
        out_dtype = r.dtype
        r = r.astype(jnp.dtype(self.dtype))
        omega = self.omega
        fence = jax.lax.optimization_barrier

        def smooth(coefs, inv_diag, mask, z, r, nu):
            for _ in range(nu):
                Az = mask * _apply_stencil_blast(coefs, z)
                z = fence(z + omega * inv_diag * (r - Az))
            return z

        def vcycle(li, r):
            coefs, inv_diag, mask = levels[li]
            if li == len(levels) - 1:
                return smooth(coefs, inv_diag, mask,
                              jnp.zeros_like(r), r, self.nu_coarse)
            z = smooth(coefs, inv_diag, mask, jnp.zeros_like(r), r,
                       self.nu_pre)
            resid = mask * (r - mask * _apply_stencil_blast(coefs, z))
            coarse_mask = levels[li + 1][2]
            rc = fence(coarse_mask * _restrict(resid))
            ec = vcycle(li + 1, rc)
            z = fence(z + mask * _prolong(ec))
            return smooth(coefs, inv_diag, mask, z, r, self.nu_post)

        return vcycle(0, r).astype(out_dtype)
