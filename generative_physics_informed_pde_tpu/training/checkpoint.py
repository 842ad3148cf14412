"""Training-state checkpoint / resume.

The reference has NO trainer checkpointing (SURVEY §5: only dataset caches
and encoder/decoder state_dicts, utils/data.py:284-310,
generative.py:125-139).  Here the full ``TrainState`` -- parameters,
optimizer moments, batch stats, prediction-ensemble posterior+optimizer,
PRNG key and step counter -- round-trips through orbax, giving exact
resume of ``Trainer.run``.
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, state) -> str:
    """Persist a TrainState pytree; returns the absolute path."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def restore_train_state(path: str, like=None):
    """Restore a TrainState; pass the current state as ``like`` to get
    matching array types/structure."""
    path = os.path.abspath(path)
    if like is not None:
        return _checkpointer().restore(path, item=jax.device_get(like))
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
