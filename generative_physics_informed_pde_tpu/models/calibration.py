"""Stand-alone calibration utilities for the ROM operator.

Re-implementation of ``OptimizeEffectiveProperties`` and
``ReducedOrderModelSolve`` (reference: bottleneck/utils.py:250-310):

* ``optimize_effective_properties`` fits per-sample coarse log-properties
  to labeled solutions by Adam on the MSE through the differentiable ROM
  -- here one jitted optax loop instead of a python loop of torch steps;
* ``reduced_order_model_solve`` is the Galerkin-projected ROM oracle
  ``y = W (W^T K W)^{-1} W^T f`` evaluated on the FINE system, used for
  validating the coarse model against the full-order operator.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..inference.likelihoods import relative_error_batched


def optimize_effective_properties(
        g, g_params: dict, Y: jnp.ndarray, F_ROM_BC: jnp.ndarray,
        num_iterations: int = 300, lr: float = 1e-2,
        y_preprocessor: Optional[Callable] = None,
        verbose: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray, list]:
    """Fit logX so that ``g.forward_mean(logX, F) ~ Y`` (reference:
    bottleneck/utils.py:250-282).  Returns (logX, Y_predict, objective)."""
    pre = y_preprocessor or (lambda y: y)
    Yp = pre(Y)
    logX = jnp.zeros((Y.shape[0], g.dim_effective_property), dtype=Y.dtype)
    opt = optax.adam(lr)

    def loss(lx):
        Y_pred = pre(g.forward_mean(lx, F_ROM_BC))
        return jnp.mean((Y_pred - Yp) ** 2)

    @jax.jit
    def step(lx, opt_state):
        val, grads = jax.value_and_grad(loss)(lx)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(lx, updates), opt_state, val

    opt_state = opt.init(logX)
    objective = []
    for n in range(num_iterations):
        logX, opt_state, val = step(logX, opt_state)
        objective.append(float(val))
        if verbose and n % 100 == 0 and n > 0:
            relerr = relative_error_batched(g.forward_mean(logX, F_ROM_BC), Y)
            print(f"Iteration {n} || RelErr : {float(relerr)}")
    Y_pred = g.forward_mean(logX, F_ROM_BC)
    return logX, Y_pred, objective


def reduced_order_model_solve(physics_fom, W: np.ndarray, X_DG: np.ndarray,
                              bc_values: np.ndarray) -> np.ndarray:
    """Galerkin-projected fine-system solves (reference:
    bottleneck/utils.py:285-310): per sample ``K_rom = W^T K_ff W``,
    ``y = W K_rom^{-1} W^T f_eff``.  Host-side float64 oracle."""
    from ..fem.assembly import dense_stiffness

    assert W.shape[0] > W.shape[1]
    free = physics_fom.free_dofs
    con = physics_fom.constrained_dofs
    N = X_DG.shape[0]
    Y_rom = np.zeros((N, free.size))
    for n in range(N):
        K = dense_stiffness(physics_fom.grid, np.exp(np.asarray(X_DG[n])))
        K_ff = K[np.ix_(free, free)]
        f_eff = -K[np.ix_(free, con)] @ np.asarray(bc_values[n])
        K_rom = W.T @ K_ff @ W
        y = W @ np.linalg.solve(K_rom, W.T @ f_eff)
        Y_rom[n] = y
    return Y_rom
