"""Futures-compatible execution pools for parameter studies.

Re-implementation of ``DummyFuture`` / ``DummyProcessPool``
(reference: parallel/utils.py:4-74) plus real parallel backends the
reference only hinted at (its docstring says an external MPI pool was
swapped in):

* ``DummyProcessPool``  -- sequential, exception-capturing (parity),
* ``ThreadPool``        -- concurrent.futures threads; the right backend
  for JAX studies (dispatch is async, devices do the work),
* ``sweep_over_devices`` -- jax.sharding-based device sweep: runs a
  vmapped study function with the case axis sharded over the mesh, the
  TPU-native replacement for per-process parallelism.
"""

from __future__ import annotations

import warnings
from concurrent.futures import ThreadPoolExecutor


class DummyFuture:
    """Lazily computes ``f(*args)`` on ``.result()`` with optional
    exception capture (reference: parallel/utils.py:4-46)."""

    def __init__(self, catch_exceptions, f, args, kwargs):
        self._catch_exceptions = catch_exceptions
        self._f = f
        self._args = args
        self._kwargs = kwargs
        self._results = None
        self._exception = None
        # explicit done flag: keying "not yet computed" on _results is
        # None would re-execute (and re-run side effects of) a function
        # that legitimately returns None
        self._done = False

    def compute(self):
        if not self._done:
            try:
                self._results = self._f(*self._args, **self._kwargs)
            except Exception as e:  # noqa: BLE001 - parity with reference
                self._exception = e
            self._done = True
        if not self._catch_exceptions and self._exception is not None:
            raise self._exception

    def result(self):
        self.compute()
        if self._exception is not None:
            raise self._exception
        return self._results

    def done(self) -> bool:
        return True

    def exception(self):
        self.compute()
        return self._exception


class DummyProcessPool:
    """Sequential futures pool (reference: parallel/utils.py:50-74)."""

    def __init__(self, MAXWORKERS=None, catch_exceptions: bool = True):
        if MAXWORKERS is not None:
            warnings.warn("MAXWORKERS argument supplied to Dummy Process "
                          "Pool has no impact")
        self._catch_exceptions = catch_exceptions

    def activate_exceptions(self):
        self._catch_exceptions = False

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        return False

    def submit(self, f, *args, **kwargs) -> DummyFuture:
        return DummyFuture(self._catch_exceptions, f, args, kwargs)


class _ThreadFuture:
    """Adapter giving a concurrent.futures.Future the DummyFuture duck
    type: with exceptions activated (catch=False), ``exception()`` and
    ``compute()`` RAISE the captured error instead of returning it --
    code written against DummyProcessPool keys error handling on that."""

    def __init__(self, fut, catch: bool):
        self._fut = fut
        self._catch = catch

    def compute(self):
        e = self._fut.exception()  # blocks until done
        if e is not None and not self._catch:
            raise e

    def result(self):
        return self._fut.result()

    def done(self) -> bool:
        return self._fut.done()

    def exception(self):
        e = self._fut.exception()
        if e is not None and not self._catch:
            raise e
        return e


class ThreadPool:
    """concurrent.futures-backed pool with the same duck type.  For JAX
    workloads threads suffice: python only dispatches, XLA executes."""

    def __init__(self, MAXWORKERS: int = 8, catch_exceptions: bool = True):
        self._ex = ThreadPoolExecutor(max_workers=MAXWORKERS)
        self._catch = catch_exceptions

    def activate_exceptions(self):
        self._catch = False

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self._ex.shutdown(wait=True)
        return False

    def submit(self, f, *args, **kwargs) -> _ThreadFuture:
        # catch flag bound at submit time, like DummyProcessPool
        return _ThreadFuture(self._ex.submit(f, *args, **kwargs),
                             self._catch)


def sweep_over_devices(fn, case_args, mesh=None, axis: str = "dp"):
    """Vectorised device sweep: ``fn`` is vmapped over the leading case
    axis of ``case_args`` (a pytree of stacked per-case inputs) and the
    case axis is sharded over the mesh -- N cases run as one SPMD program
    across the ICI-connected devices instead of N processes."""
    import jax

    if mesh is None:
        from .mesh import make_mesh
        mesh = make_mesh()
    from .mesh import shard_data_dict

    case_args = shard_data_dict(case_args, mesh, axis)
    return jax.jit(jax.vmap(fn))(case_args)
