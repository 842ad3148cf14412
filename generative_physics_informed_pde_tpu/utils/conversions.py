"""Sparse-format conversions.

Replacement for ``Convert_ScipySparse_PyTorchSparse``
(reference: utils/conversions.py:3-12): scipy sparse -> jax BCOO (and
dense).  The core framework never materialises sparse matrices (operators
are matrix-free stencils), but the converters are provided for
interoperability and for users porting scipy-based pipelines.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def convert_scipy_sparse_to_bcoo(A, dtype=None):
    """scipy.sparse matrix -> jax.experimental.sparse.BCOO."""
    from jax.experimental import sparse as jsparse

    coo = A.tocoo()
    data = jnp.asarray(coo.data, dtype=dtype)
    indices = jnp.stack([jnp.asarray(coo.row), jnp.asarray(coo.col)], axis=1)
    return jsparse.BCOO((data, indices), shape=coo.shape)


def convert_scipy_sparse_to_dense(A, dtype=None) -> jnp.ndarray:
    return jnp.asarray(np.asarray(A.todense()), dtype=dtype)
