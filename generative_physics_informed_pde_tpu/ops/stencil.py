"""Pallas TPU kernel for the batched 7-point stiffness stencil apply.

The innermost hot op of every fine-grid solve (CG iterations, multigrid
smoothing, constraint assembly) is

    out[y, x, b] = mask[y, x] * sum_k coefs[k, y, x, b] * v[y+oy_k, x+ox_k, b]

on batch-last (Ny, Nx, B) arrays -- the layout whose batch axis fills the
128-wide TPU lane dimension.  The kernel runs a 2-D grid over (batch
blocks of 128 lanes) x (row tiles); the row tile of ``v`` plus its +-1
halo is DMA'd from HBM into VMEM by the kernel itself (halo windows
overlap, which BlockSpecs cannot express), while coefficient tiles and
outputs use regular blocked pipelining.  Everything stays in VMEM for the
fused multiply-add chain and the masking.

``interpret=True`` runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fem.assembly import _OFFSETS

LANES = 128


def _make_kernel(TY: int, Ny: int, Nx: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(v_hbm, coefs_ref, mask_ref, out_ref, scratch, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)
        # DMA the row tile of the halo-padded v: rows [t*TY, t*TY + TY+2).
        # Columns are copied in full (8-aligned padded width) -- partial
        # sublane slices are not DMA-able on TPU.
        dma = pltpu.make_async_copy(
            v_hbm.at[pl.ds(t * TY, TY + 2), :, pl.ds(b * LANES, LANES)],
            scratch, sem)
        dma.start()
        dma.wait()
        acc = jnp.zeros(out_ref.shape, dtype=out_ref.dtype)
        for k, (oy, ox) in enumerate(_OFFSETS):
            sl = scratch[1 + oy:1 + oy + TY, 1 + ox:1 + ox + Nx, :]
            acc = acc + coefs_ref[k] * sl
        out_ref[:] = mask_ref[:] * acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows"))
def apply_stencil(coefs: jnp.ndarray, v: jnp.ndarray, mask: jnp.ndarray,
                  *, interpret: bool = False,
                  tile_rows: int = 0) -> jnp.ndarray:
    """Masked stencil apply via Pallas.

    coefs (7, Ny, Nx, B), v (Ny, Nx, B), mask (Ny, Nx, 1) -> (Ny, Nx, B).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    seven, Ny, Nx, B = coefs.shape
    assert seven == 7 and v.shape == (Ny, Nx, B)
    if tile_rows <= 0:
        # fit double-buffered coefs blocks + scratch in ~11MB of VMEM
        budget = 11 * 2 ** 20
        per_row = (2 * 7 + 3) * Nx * LANES * v.dtype.itemsize
        tile_rows = max(4, min(32, budget // per_row))
    TY = min(tile_rows, Ny)
    nt = -(-Ny // TY)
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        coefs = jnp.pad(coefs, [(0, 0), (0, 0), (0, 0), (0, Bp - B)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, Bp - B)])
    # halo-pad rows/cols; extend rows so every tile's halo window is in
    # bounds (nt*TY + 2 rows) and pad columns to a sublane-aligned width
    CP = -(-(Nx + 2) // 8) * 8
    v_halo = jnp.pad(v, [(1, nt * TY + 1 - Ny), (1, CP - Nx - 1), (0, 0)])

    grid = (Bp // LANES, nt)
    out = pl.pallas_call(
        _make_kernel(TY, Ny, Nx),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM
            pl.BlockSpec((7, TY, Nx, LANES), lambda b, t: (0, t, 0, b)),
            pl.BlockSpec((TY, Nx, 1), lambda b, t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TY, Nx, LANES), lambda b, t: (t, 0, b)),
        out_shape=jax.ShapeDtypeStruct((Ny, Nx, Bp), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((TY + 2, CP, LANES), v.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(v_halo, coefs, mask.astype(v.dtype))
    return out[..., :B]


def apply_stencil_reference(coefs, v, mask):
    """Pure-jnp oracle (identical math, XLA-fused)."""
    from ..fem.batched_solver import _apply_stencil_blast

    return mask * _apply_stencil_blast(coefs, v)
