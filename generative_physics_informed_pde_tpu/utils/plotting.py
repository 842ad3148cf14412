"""Plotting: 3-D surface plots of nodal fields and trainer diagnostics.

Re-implementation of ``PlotFunction2D`` (reference: fawkes/Plotting.py:32-46)
and the ``Plot2D`` validation figure / elbo plots (reference:
training.py:483-589) without FEniCS Function objects: fields are plain
nodal vectors on a StructuredTriGrid.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..fem.grid import StructuredTriGrid


def plot_function_2d(grid: StructuredTriGrid, values, ax=None, fig=None,
                     title: Optional[str] = None, cmap: str = "viridis"):
    """3-D trisurf of a nodal field (reference: fawkes/Plotting.py:32-46)."""
    import matplotlib.pyplot as plt

    values = np.asarray(values).reshape(-1)
    assert values.size == grid.n_nodes
    if ax is None:
        fig = fig or plt.figure()
        ax = fig.add_subplot(projection="3d")
    xy = grid.node_coords
    ax.plot_trisurf(xy[:, 0], xy[:, 1], values,
                    triangles=np.asarray(grid.cells), cmap=cmap,
                    linewidth=0.1)
    if title:
        ax.set_title(title)
    return ax


PlotFunction2D = plot_function_2d


def plot_2d(trainer, indices: Optional[Sequence[int]] = None,
            n_monte_carlo: int = 1024, azim: int = 240, elev: int = 0):
    """Mean-prediction vs reference surfaces for validation samples
    (reference: training.py:504-589)."""
    import jax
    import matplotlib.pyplot as plt

    indices = list(indices) if indices is not None else [0, 1, 2]
    analysis = trainer._analysis
    fom = trainer.physics["fom"]
    Y_val = np.asarray(trainer._data_val["Y"])
    bce = trainer.datasets["validation"].get("BCE")
    vals = bce.constrained_values("fom")

    fig, axes = plt.subplots(len(indices), 2, figsize=(10, 4 * len(indices)),
                             subplot_kw={"projection": "3d"})
    axes = np.atleast_2d(axes)
    for i, ind in enumerate(indices):
        Y_sample = analysis.sample_predictive_y(
            trainer.state.params, trainer.state.pe_q,
            jax.random.PRNGKey(1000 + ind), n_monte_carlo, index=ind)
        y_mean = np.asarray(Y_sample.mean(axis=0))
        y_mean_full = np.asarray(
            fom.scatter_restricted_solution(y_mean, vals[ind]))
        y_true_full = np.asarray(
            fom.scatter_restricted_solution(Y_val[ind], vals[ind]))
        plot_function_2d(fom.grid, y_mean_full, ax=axes[i, 0])
        plot_function_2d(fom.grid, y_true_full, ax=axes[i, 1])
        for ax in axes[i]:
            ax.view_init(azim=azim, elev=elev)
        if i == 0:
            axes[i, 0].set_title("Mean Prediction")
            axes[i, 1].set_title("Reference")
    return fig


Plot2D = plot_2d


def plot_elbo(trainer, figsize=(6, 4)):
    """(reference: training.py:483-491)"""
    import matplotlib.pyplot as plt

    plt.figure(figsize=figsize)
    plt.plot(trainer._monitor["elbo_iter"], trainer._monitor["elbo"], "-o")
    plt.grid()
    plt.xlabel("Iterations")
    plt.ylabel("ELBO")
    plt.title("ELBO")


def plot_predictive_logscore(trainer, figsize=(6, 4)):
    """(reference: training.py:493-501)"""
    import matplotlib.pyplot as plt

    series = trainer._analysis.series["logscore_y"]
    plt.figure(figsize=figsize)
    plt.plot(series.iteration, series.value, "-o")
    plt.grid()
    plt.xlabel("# Iteration")
    plt.ylabel("Logscore")
    plt.title("Predictive Logscore (validation)")
