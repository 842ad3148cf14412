"""Shared default XLA compile-cache path for the repo entry points.

Both ``bench.py`` and ``__graft_entry__.py`` want a persistent compile
cache (the tunneled TPU compile service can take minutes per
executable), but a cache written on one machine must never be loaded on
another: XLA serializes machine-specific code and a cross-host CPU
feature mismatch can SIGILL the process -- which is why the package
keeps the cache opt-in (``GPIPDE_COMPILE_CACHE``) rather than on by
default.

The cache directory is therefore keyed by a machine fingerprint stronger
than the bare hostname (containers and cloned VMs often share
hostnames, and the repo-local ``.jax_cache`` may live on a shared
filesystem): hostname + ISA + a hash of the CPU feature flags from
``/proc/cpuinfo``.  No jax imports here -- callers set the env var
BEFORE the jax backend initializes.
"""

from __future__ import annotations

import hashlib
import os
import platform
import socket


def machine_fingerprint() -> str:
    """hostname-isa[-cpufeaturehash]: unique enough that two machines
    sharing a filesystem (or a hostname) get distinct cache dirs."""
    tag = f"{socket.gethostname()}-{platform.machine()}"
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith(("flags", "Features"))),
                         "")
        if flags:
            tag += "-" + hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:  # non-Linux: accept the weaker hostname-isa key
        pass
    return tag


def default_cache_dir(root: str | None = None) -> str:
    root = root or os.path.dirname(os.path.abspath(__file__))
    return os.path.join(root, ".jax_cache", machine_fingerprint())


def set_default_compile_cache() -> None:
    """Point GPIPDE_COMPILE_CACHE at the fingerprinted repo-local cache
    unless the caller already chose one."""
    os.environ.setdefault("GPIPDE_COMPILE_CACHE", default_cache_dir())
