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

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.assembly import _OFFSETS, _SYM_DIRS

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
        # floor at 1, not 4: for wide grids (Nx ~ 512 f32) per_row can
        # exceed budget/4, and a forced TY=4 overcommits the ~16MB VMEM
        # instead of shrinking the tile
        tile_rows = max(1, min(32, budget // per_row))
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


# ---------------------------------------------------------------------------
# Symmetric-form kernel: 4 coefficient grids instead of 7
# ---------------------------------------------------------------------------
#
# K is symmetric, so coefs[-dir][y, x] == coefs[+dir][y-dy, x-dx]; storing
# only [diag, c_N, c_E, c_D] cuts the HBM coefficient traffic from 7 to 4
# grids.  XLA cannot exploit this (its loop fusion re-reads the shifted
# coefficient stream), so the win needs an explicit VMEM tile: DMA the
# (TY+2)-row halo tile of v AND of the 4 coefficient grids once, then do
# all 7 shifted multiply-adds out of VMEM.  DMAs are double-buffered
# across a linearized (batch-block x row-tile) grid so the copy of tile
# i+1 overlaps the compute of tile i.


def _make_sym_kernel(TY: int, Ny: int, Nx: int, nt: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(v_hbm, c_hbm, mask_ref, out_ref, vs, cs, sem_v, sem_c):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dmas(slot, idx):
            b = idx // nt
            t = idx % nt
            return (
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(t * TY, TY + 2), :,
                             pl.ds(b * LANES, LANES)],
                    vs.at[slot], sem_v.at[slot]),
                pltpu.make_async_copy(
                    c_hbm.at[:, pl.ds(t * TY, TY + 2), :,
                             pl.ds(b * LANES, LANES)],
                    cs.at[slot], sem_c.at[slot]),
            )

        @pl.when(i == 0)
        def _():
            for d in dmas(0, i):
                d.start()

        @pl.when(i + 1 < n)
        def _():
            for d in dmas((i + 1) % 2, i + 1):
                d.start()

        slot = i % 2
        for d in dmas(slot, i):
            d.wait()

        v = vs[slot]
        c = cs[slot]
        # rows 1..TY, cols 1..Nx of the halo tile are the output points
        acc = c[0, 1:1 + TY, 1:1 + Nx, :] * v[1:1 + TY, 1:1 + Nx, :]
        for k, (oy, ox) in enumerate(_SYM_DIRS):
            # +dir coupling: c_dir[y, x] * v[y+oy, x+ox]
            acc += (c[1 + k, 1:1 + TY, 1:1 + Nx, :]
                    * v[1 + oy:1 + oy + TY, 1 + ox:1 + ox + Nx, :])
            # -dir coupling: c_dir[y-oy, x-ox] * v[y-oy, x-ox]
            acc += (c[1 + k, 1 - oy:1 - oy + TY, 1 - ox:1 - ox + Nx, :]
                    * v[1 - oy:1 - oy + TY, 1 - ox:1 - ox + Nx, :])
        out_ref[:] = mask_ref[:] * acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile_rows"))
def apply_stencil_sym(coefs4: jnp.ndarray, v: jnp.ndarray, mask: jnp.ndarray,
                      *, interpret: bool = False,
                      tile_rows: int = 0) -> jnp.ndarray:
    """Masked symmetric-form stencil apply via Pallas.

    coefs4 (4, Ny, Nx, B) = [diag, c_N, c_E, c_D] (StencilOperator
    .coefficients_sym layout), v (Ny, Nx, B), mask (Ny, Nx, 1)
    -> (Ny, Nx, B).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    four, Ny, Nx, B = coefs4.shape
    assert four == 4 and v.shape == (Ny, Nx, B)
    if tile_rows <= 0:
        # 2 slots x (v tile + 4 coef tiles) + double-buffered out/mask
        # blocks must fit in ~12MB of VMEM
        budget = 12 * 2 ** 20
        per_row = (2 * (1 + 4) + 2) * Nx * LANES * v.dtype.itemsize
        tile_rows = max(1, min(32, budget // per_row - 2))
    TY = min(tile_rows, Ny)
    nt = -(-Ny // TY)
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        coefs4 = jnp.pad(coefs4, [(0, 0), (0, 0), (0, 0), (0, Bp - B)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, Bp - B)])
    # halo-pad rows/cols of both v and the coefficient grids (zero padding
    # is exact: out-of-range couplings have zero coefficients); pad columns
    # to a sublane-aligned width
    CP = -(-(Nx + 2) // 8) * 8
    pad_rc = [(1, nt * TY + 1 - Ny), (1, CP - Nx - 1), (0, 0)]
    v_halo = jnp.pad(v, pad_rc)
    c_halo = jnp.pad(coefs4, [(0, 0)] + pad_rc)

    grid = ((Bp // LANES) * nt,)
    out = pl.pallas_call(
        _make_sym_kernel(TY, Ny, Nx, nt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # v stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # coefs stay in HBM
            pl.BlockSpec((TY, Nx, 1), lambda i: (i % nt, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TY, Nx, LANES),
                               lambda i: (i % nt, 0, i // nt)),
        out_shape=jax.ShapeDtypeStruct((Ny, Nx, Bp), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 2, CP, LANES), v.dtype),
            pltpu.VMEM((2, 4, TY + 2, CP, LANES), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(v_halo, c_halo, mask.astype(v.dtype))
    return out[..., :B]


def apply_stencil_sym_reference(coefs4, v, mask):
    """Pure-jnp oracle for the symmetric form."""
    from ..fem.batched_solver import _apply_stencil_sym_blast

    return mask * _apply_stencil_sym_blast(coefs4, v)


# ---------------------------------------------------------------------------
# Blocked-batch symmetric kernel: the production form
# ---------------------------------------------------------------------------
#
# Lessons from the (Ny, Nx, B) kernels above, measured on v5e
# (benchmarks/stencil_roofline.py):
#   1. jnp.pad of v and coefs INSIDE the jitted apply materialises extra
#      full passes over HBM (pallas_call inputs cannot fuse) -- that alone
#      costs more than the 7->4 coefficient saving.
#   2. slicing 128 lanes out of a B=1024 trailing axis makes every DMA row
#      segment 512 bytes -> ~2.5x below streaming bandwidth.
# Fix: keep ALL solver vectors in a halo-padded blocked layout
#   (Bb, R, CP, 128),  R = nt*TY + 2,  CP = 8-aligned (Nx + 2),
# interior at [1:1+Ny, 1:1+Nx], halo identically zero.  Every DMA is then
# a contiguous chunk, there is no per-apply pad, and the 4-grid symmetric
# coefficients are padded ONCE per solve (amortised over all CG
# iterations).  The kernel double-buffers v/coef tiles and writes output
# tiles with an explicit +1-row offset DMA (BlockSpecs cannot express the
# halo offset).


def pad_blocked(x: jnp.ndarray, Ny: int, Nx: int, TY: int = 0) -> jnp.ndarray:
    """(B, Ny, Nx) -> (Bb, R, CP, 128) halo-padded blocked layout."""
    B = x.shape[0]
    TY = TY or choose_tile_rows(Ny, Nx, x.dtype.itemsize)
    Bp = -(-B // LANES) * LANES
    nt = -(-Ny // TY)
    R = nt * TY + 2
    CP = -(-(Nx + 2) // 8) * 8
    x = jnp.pad(x.reshape(B, Ny, Nx),
                [(0, Bp - B), (1, R - Ny - 1), (1, CP - Nx - 1)])
    return jnp.moveaxis(x.reshape(Bp // LANES, LANES, R, CP), 1, -1)


def unpad_blocked(xb: jnp.ndarray, B: int, Ny: int, Nx: int) -> jnp.ndarray:
    """(Bb, R, CP, 128) -> (B, Ny, Nx)."""
    Bb, R, CP, _ = xb.shape
    x = jnp.moveaxis(xb, -1, 1).reshape(Bb * LANES, R, CP)
    return x[:B, 1:1 + Ny, 1:1 + Nx]


def _make_sym_blocked_kernel(TY: int, nt: int, R: int, CP: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(v_hbm, c_hbm, mask_ref, out_hbm,
               vs, cs, outs, zrow, sem_v, sem_c, sem_o, sem_z):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def in_dmas(slot, idx):
            b = idx // nt
            t = idx % nt
            return (
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(t * TY, TY + 2)], vs.at[slot],
                    sem_v.at[slot]),
                pltpu.make_async_copy(
                    c_hbm.at[:, b, pl.ds(t * TY, TY + 2)], cs.at[slot],
                    sem_c.at[slot]),
            )

        def out_dma(slot, idx):
            b = idx // nt
            t = idx % nt
            return pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[b, pl.ds(1 + t * TY, TY)],
                sem_o.at[slot])

        @pl.when(i == 0)
        def _():
            for d in in_dmas(0, 0):
                d.start()

        @pl.when(i + 1 < n)
        def _():
            for d in in_dmas((i + 1) % 2, i + 1):
                d.start()

        slot = i % 2
        for d in in_dmas(slot, i):
            d.wait()

        # the out scratch slot is reused every 2 steps: drain its DMA first
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        c = cs[slot]
        t = i % nt
        # pre-mask the tile so the operator is exactly mask*K*(mask*v) --
        # same as the XLA-fused form (constrained dofs contribute nothing)
        v = vs[slot] * mask_ref[pl.ds(t * TY, TY + 2)]
        m = mask_ref[pl.ds(1 + t * TY, TY)]

        def shift_x(a, s):
            """a[..., x, :] -> a[..., x+s, :] with zero fill (the couplings
            into the fake column are zero-coefficient, so the fill value
            never reaches the output)."""
            if s == 0:
                return a
            z = jnp.zeros_like(a[:, :1])
            if s > 0:
                return jnp.concatenate([a[:, 1:], z], axis=1)
            return jnp.concatenate([z, a[:, :-1]], axis=1)

        # out rows [1+t*TY, 1+(t+1)*TY) <- v/c tile rows [t*TY, t*TY+TY+2):
        # out local row j corresponds to v/c local row 1 + j
        acc = c[0, 1:1 + TY] * v[1:1 + TY]
        for k, (oy, ox) in enumerate(_SYM_DIRS):
            ck = c[1 + k]
            # +dir coupling: c[y, x] * v[y+oy, x+ox]
            acc += ck[1:1 + TY] * shift_x(v[1 + oy:1 + oy + TY], ox)
            # -dir coupling: c[y-oy, x-ox] * v[y-oy, x-ox] -- multiply on
            # aligned rows first, shift the product once
            prod = ck[1 - oy:1 - oy + TY] * v[1 - oy:1 - oy + TY]
            acc += shift_x(prod, -ox)
        outs[slot] = m * acc
        out_dma(slot, i).start()

        @pl.when(i == n - 1)
        def _():
            out_dma(slot, i).wait()

            @pl.when(n >= 2)
            def _():
                out_dma((i - 1) % 2, i - 1).wait()

        # zero the global halo rows 0 and R-1 once per batch block
        @pl.when(i % nt == 0)
        def _():
            zrow[...] = jnp.zeros_like(zrow)
            b = i // nt
            top = pltpu.make_async_copy(zrow, out_hbm.at[b, pl.ds(0, 1)],
                                        sem_z)
            top.start()
            top.wait()
            bot = pltpu.make_async_copy(zrow, out_hbm.at[b, pl.ds(R - 1, 1)],
                                        sem_z)
            bot.start()
            bot.wait()

    return kernel


def choose_tile_rows(Ny: int, Nx: int, itemsize: int = 4) -> int:
    """Largest TY (4..32) whose double-buffered v+coef tiles, two out
    tiles, and the mask fit in ~13MB of VMEM."""
    CP = -(-(Nx + 2) // 8) * 8
    budget = 13 * 2 ** 20
    for TY in (32, 24, 16, 12, 8, 6, 4):
        R = (-(-Ny // TY)) * TY + 2
        need = (2 * (1 + 4) * (TY + 2) + 2 * TY + 1) * CP * LANES * itemsize \
            + R * CP * itemsize
        if need <= budget:
            return TY
    return 4


@functools.partial(jax.jit, static_argnames=("TY", "interpret"))
def apply_stencil_sym_blocked(c_halo: jnp.ndarray, v: jnp.ndarray,
                              mask: jnp.ndarray, *, TY: int,
                              interpret: bool = False) -> jnp.ndarray:
    """Masked symmetric stencil apply on the blocked layout.

    c_halo (4, Bb, R, CP, 128) from ``pad_coefs_blocked`` (built once per
    solve), v (Bb, R, CP, 128) with zero halo, mask (R, CP, 1) zero
    outside the interior -> (Bb, R, CP, 128) with zero halo.  ``TY`` is
    the row-tile height the layout was built with (choose_tile_rows).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    four, Bb, R, CP, lanes = c_halo.shape
    assert four == 4 and lanes == LANES and v.shape == (Bb, R, CP, LANES)
    nt = (R - 2) // TY
    assert nt * TY == R - 2, (R, TY)

    grid = (Bb * nt,)
    return pl.pallas_call(
        _make_sym_blocked_kernel(TY, nt, R, CP),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # v in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # coefs in HBM
            pl.BlockSpec((R, CP, 1), lambda i: (0, 0, 0)),  # mask resident
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Bb, R, CP, LANES), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, TY + 2, CP, LANES), v.dtype),
            pltpu.VMEM((2, 4, TY + 2, CP, LANES), v.dtype),
            pltpu.VMEM((2, TY, CP, LANES), v.dtype),
            pltpu.VMEM((1, CP, LANES), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(v, c_halo, mask.astype(v.dtype))


def pad_coefs_blocked(coefs4: jnp.ndarray, Ny: int, Nx: int,
                      TY: int = 0) -> jnp.ndarray:
    """(B, 4, Ny, Nx) symmetric stencil coefficients -> the kernel's
    (4, Bb, R, CP, 128) halo-padded blocked layout (zero outside the
    interior).  Done once per solve; amortised over all CG iterations."""
    B = coefs4.shape[0]
    TY = TY or choose_tile_rows(Ny, Nx, coefs4.dtype.itemsize)
    nt = -(-Ny // TY)
    R = nt * TY + 2
    CP = -(-(Nx + 2) // 8) * 8
    Bp = -(-B // LANES) * LANES
    c = jnp.pad(coefs4,
                [(0, Bp - B), (0, 0), (1, R - Ny - 1), (1, CP - Nx - 1)])
    c = c.reshape(Bp // LANES, LANES, 4, R, CP)
    return jnp.moveaxis(jnp.moveaxis(c, 1, -1), 1, 0)  # (4, Bb, R, CP, 128)


def mask_blocked(free_mask_2d: np.ndarray, TY: int = 0) -> np.ndarray:
    """(Ny, Nx) free-dof mask -> (R, CP, 1) padded mask."""
    Ny, Nx = free_mask_2d.shape
    TY = TY or choose_tile_rows(Ny, Nx)
    nt = -(-Ny // TY)
    R = nt * TY + 2
    CP = -(-(Nx + 2) // 8) * 8
    m = np.zeros((R, CP, 1), dtype=free_mask_2d.dtype)
    m[1:1 + Ny, 1:1 + Nx, 0] = free_mask_2d
    return m
