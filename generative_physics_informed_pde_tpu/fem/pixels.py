"""Bidirectional DG0 <-> pixel-image converters.

TPU-native replacement for ``DiscontinuousGalerkinPixelConverter``
(reference: bottleneck/utils.py:5-214).  On the structured triangulation
each image pixel covers exactly two triangles; image -> function duplicates
the pixel value onto both cell dofs, function -> image averages them
(reference semantics: bottleneck/utils.py:80-88,115-132).  Here both
directions are pure static index operations (gather / reshape), trivially
jittable, vmappable and shardable.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np
import jax.numpy as jnp

from .grid import StructuredTriGrid


@dataclasses.dataclass(frozen=True)
class PixelConverter:
    """Image convention: row 0 = top of the domain (matches the reference's
    flipud ordering, bottleneck/utils.py:51-57,74-78)."""

    grid: StructuredTriGrid

    @property
    def py(self) -> int:
        return self.grid.ny

    @property
    def px(self) -> int:
        return self.grid.nx

    @cached_property
    def _pixel_to_cells(self) -> np.ndarray:
        # (py*px, 2) cell ids per flattened pixel
        return self.grid.pixel_to_cells.reshape(-1, 2)

    @cached_property
    def _cell_to_pixel(self) -> np.ndarray:
        # (n_cells,) flattened pixel index per cell
        out = np.empty(self.grid.n_cells, dtype=np.int32)
        p2c = self._pixel_to_cells
        out[p2c[:, 0]] = np.arange(p2c.shape[0])
        out[p2c[:, 1]] = np.arange(p2c.shape[0])
        return out

    def function_to_image(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., n_cells) DG0 vectors -> (..., py, px) images (cell-pair
        mean, reference FunctionToImageBatchedFast bottleneck/utils.py:115-125)."""
        idx = jnp.asarray(self._pixel_to_cells)
        vals = x[..., idx]  # (..., py*px, 2)
        img = 0.5 * (vals[..., 0] + vals[..., 1])
        return img.reshape(x.shape[:-1] + (self.py, self.px))

    def image_to_function(self, images: jnp.ndarray) -> jnp.ndarray:
        """(..., py, px) images -> (..., n_cells) DG0 vectors (duplicate,
        reference ImageToFunctionBatchedFast bottleneck/utils.py:127-132)."""
        flat = images.reshape(images.shape[:-2] + (-1,))
        return flat[..., jnp.asarray(self._cell_to_pixel)]
