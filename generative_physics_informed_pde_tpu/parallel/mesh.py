"""Device meshes and sharding helpers.

TPU-native replacement for the reference's (absent) distributed layer: the
reference trains single-device and parallelises only parameter studies via
a sequential futures shim (parallel/utils.py:50-74).  Here the natural
in-graph parallelism of the workload -- batched PDE solves, per-datapoint
variational parameters, Monte-Carlo ELBO samples -- is expressed with
``jax.sharding``: pick a mesh, place the data and the N-indexed parameter
blocks over the 'dp' axis, and let XLA insert the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With one axis (default 'dp') the mesh is 1-D; pass ``shape`` for
    multi-axis meshes, e.g. ``make_mesh(8, ("dp", "mc"), (4, 2))``.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_pspec(mesh: Mesh, axis: str = "dp") -> P:
    """PartitionSpec for the batch (leading) dimension.

    On a plain mesh this is ``P(axis)``.  On a hybrid (DCN x ICI) mesh
    from ``parallel.make_hybrid_mesh`` the batch axis crosses hosts
    along the leading 'dcn' axis and local devices along ``axis``:
    ``P(('dcn', axis))`` -- shards stay process-major and contiguous,
    matching ``local_shard_slice``.  An ``axis`` the mesh does not have
    is an error (a typo here would otherwise silently train with the
    wrong data distribution)."""
    names = mesh.axis_names
    if axis not in names:
        raise ValueError(f"axis {axis!r} not in mesh axes {tuple(names)}")
    if "dcn" in names and axis != "dcn":
        return P(("dcn", axis))
    return P(axis)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """First-dim sharded over ``axis`` (and 'dcn' first on hybrid meshes)."""
    return NamedSharding(mesh, batch_pspec(mesh, axis))


def mc_batch_sharding(mesh: Mesh) -> NamedSharding:
    """First-dim sharded over ALL mesh axes jointly.

    For the flattened (N * n_mc) Monte-Carlo ELBO batch on a ("dp","mc")
    mesh: the sample-major flat axis is split dp-major, so each dp group
    keeps its data samples and the 'mc' axis subdivides their MC
    replicates (SURVEY §2.7's MC-ELBO-sample axis)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def shard_data_dict(data, mesh: Mesh, axis: str = "dp"):
    """Place every array in a (nested) data dict with its batch dimension
    sharded over ``axis``.

    Under multi-process jax, each array is contributed PROCESS-LOCALLY:
    only the rows this process owns (``local_shard_slice``) are read, via
    ``jax.make_array_from_process_local_data`` -- so a DataLoader that
    assembled labels only for its host's rows (``DataLoader.assemble(...,
    rows=...)``) feeds the mesh without any host ever holding a valid
    global copy.  Rows outside the local slice are never touched.
    Arrays whose leading dim does not divide by the process count (and
    0-d leaves) are placed replicated from the (then required) full host
    value.

    The process-local path is taken only when the MESH itself spans
    processes: a host-local mesh in a multi-process job (e.g. a
    ``sweep_over_devices`` study case using this host's chips) is fully
    addressable and takes the plain ``device_put`` path with the full
    host value."""
    sh = batch_sharding(mesh, axis)
    spec_axes = tuple(a for ax in sh.spec for a in
                      (ax if isinstance(ax, tuple) else (ax,)))
    n_shards = int(np.prod([mesh.shape[a] for a in spec_axes]))
    spans = len({d.process_index for d in mesh.devices.flat}) > 1
    if not spans:
        repl = replicated(mesh)

        def put_local(x):
            # same replicate-fallback contract as the multi-process path:
            # 0-d leaves and leading dims that don't divide the mesh
            # batch axes are replicated, not an error
            nd = getattr(x, "ndim", np.asarray(x).ndim)
            shape = getattr(x, "shape", np.asarray(x).shape)
            if nd == 0 or shape[0] % n_shards:
                return jax.device_put(x, repl)
            return jax.device_put(x, sh)

        return jax.tree_util.tree_map(put_local, data)
    n_proc = jax.process_count()
    from .distributed import global_array_from_local, local_shard_slice

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % n_proc:
            return jax.device_put(x, replicated(mesh))
        local = x[local_shard_slice(x.shape[0])]
        return global_array_from_local(mesh, local, axis=axis,
                                       global_shape=x.shape)

    return jax.tree_util.tree_map(put, data)


# one shared path-membership helper (utils.params also uses it for
# freeze masks) -- a fix for new pytree key kinds must land once
from ..utils.params import _path_matches as _path_contains  # noqa: E402


def shard_train_state(state, mesh: Mesh, axis: str = "dp",
                      data_indexed=("q_z", "q_X", "pe_q", "pe_opt_state")):
    """Place a TrainState: leaves living under per-datapoint parameter
    blocks (q_z / q_X / the prediction-ensemble posterior) -- and their
    optimizer moments, which mirror the same tree paths -- are sharded on
    their leading (datapoint) axis; everything else is replicated.

    This is the whole parallel layout of the model: network weights are
    tiny and replicated, while the N-indexed posteriors and all batched
    physics solves scale over the 'dp' mesh axis.
    """
    repl = replicated(mesh)
    shard = batch_sharding(mesh, axis)

    def place(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and _path_contains(path, data_indexed):
            return jax.device_put(leaf, shard)
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map_with_path(place, state)
