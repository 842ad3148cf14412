"""Parameter-pytree utilities.

Functional equivalents of the reference's ``lamp.modules.BaseModule``
introspection and freezing helpers (lamp/modules.py:4-64: parameter
counting, gradient norms, freeze/unfreeze) and
``VariationalApproximation.freeze*`` (components.py:147-158).  In JAX,
"freezing" a parameter block means masking its optimizer updates --
``freeze_optimizer`` wraps any optax transform so that updates for the
selected sub-trees become zero.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import jax
import jax.numpy as jnp
import optax


def count_parameters(tree) -> int:
    """Total number of scalar parameters (lamp/modules.py param count)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def global_norm(tree) -> jnp.ndarray:
    """L2 norm over all leaves (lamp/modules.py gradient-norm helper)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def _path_matches(path, frozen: Sequence[str]) -> bool:
    keys = [getattr(e, "key", getattr(e, "name", None)) for e in path]
    return any(f in keys for f in frozen)


def freeze_mask(params, frozen: Union[Sequence[str], Callable]) -> dict:
    """Pytree of 'frozen'/'trainable' labels.  ``frozen`` is a list of
    key names (any path containing one is frozen, e.g. ['f', 'encoder'] or
    ['q_z']) or a predicate path -> bool."""
    if callable(frozen):
        pred = frozen
    else:
        pred = lambda path, leaf: _path_matches(path, frozen)  # noqa: E731
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: "frozen" if pred(path, leaf) else "trainable",
        params)


def freeze_optimizer(optimizer: optax.GradientTransformation, params,
                     frozen: Union[Sequence[str], Callable]
                     ) -> optax.GradientTransformation:
    """Wrap an optimizer so the selected parameter blocks receive zero
    updates (the JAX equivalent of requires_grad=False /
    BaseModule.freeze)."""
    labels = freeze_mask(params, frozen)
    return optax.multi_transform(
        {"trainable": optimizer, "frozen": optax.set_to_zero()}, labels)
