"""Training-state checkpoint / resume.

The reference has NO trainer checkpointing (SURVEY §5: only dataset caches
and encoder/decoder state_dicts, utils/data.py:284-310,
generative.py:125-139).  Here the full ``TrainState`` -- parameters,
optimizer moments, batch stats, prediction-ensemble posterior+optimizer,
PRNG key and step counter -- round-trips through orbax, giving exact
resume of ``Trainer.run``.

Multi-host (process-spanning) state is handled: leaves that are not
fully addressable (dp-sharded over a process-spanning mesh) are
allgathered to every host, process 0 writes the checkpoint, and a
cross-process barrier keeps peers from racing ahead of the write.
``path`` must live on a filesystem every process can read at restore
time (shared FS / NFS / GCS-fuse -- the standard pod setup).
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _host_tree(tree):
    """``jax.device_get`` that also handles process-spanning arrays:
    non-fully-addressable leaves (dp-sharded across hosts) are
    allgathered so every process holds the full global value.  A
    collective -- every process must call it with the same tree."""
    from ..parallel.distributed import fetch
    return jax.tree_util.tree_map(
        lambda x: fetch(x)
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable
        else jax.device_get(x), tree)


def save_train_state(path: str, state) -> str:
    """Persist a TrainState pytree; returns the absolute path.

    Under multi-process jax, every process must call this: the
    allgather of process-spanning leaves is a collective, and orbax's
    ``Checkpointer.save`` is itself multihost-aware (primary-process
    write + internal sync barriers), so it must be entered by all
    processes too."""
    path = os.path.abspath(path)
    host = _host_tree(state)
    _checkpointer().save(path, host, force=True)
    return path


def restore_train_state(path: str, like=None):
    """Restore a TrainState; pass the current state as ``like`` to get
    matching array types/structure.  Every process reads the checkpoint
    (shared filesystem); re-sharding onto a live mesh is the caller's
    job (``Trainer.restore_checkpoint`` does it)."""
    path = os.path.abspath(path)
    if like is not None:
        return _checkpointer().restore(path, item=_host_tree(like))
    return _checkpointer().restore(path)


def save_encoder_decoder(path: str, params) -> str:
    """Encoder/decoder-only snapshot (reference get_encoder_decoder_states,
    generative.py:134-139)."""
    subset = {k: params[k] for k in ("f", "encoder") if k in params}
    return save_train_state(path, subset)


def restore_encoder_decoder(path: str, params: dict) -> dict:
    """Load an encoder/decoder snapshot into a params pytree (reference
    set_encoder_decoder_states, generative.py:125-132)."""
    restored = restore_train_state(
        path, like={k: params[k] for k in ("f", "encoder") if k in params})
    out = dict(params)
    out.update(restored)
    return out
