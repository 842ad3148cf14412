"""Pallas TPU kernels for the hot compute paths."""

from .stencil import apply_stencil, apply_stencil_reference

__all__ = ["apply_stencil", "apply_stencil_reference"]
