#!/usr/bin/env python
"""Benchmark driver: SVI ELBO steps/sec at 64^2 (the BASELINE.json metric).

Runs the 'highres' 64^2 recipe (the reference example workload scaled to
the 64^2 preset) on the default accelerator, measures jitted SVI
steps/sec, and compares against the same math executed on the host CPU
backend (the stand-in for the PyTorch+FEniCS CPU reference, which cannot
run here -- FEniCS is not installed -- and whose per-step work this
framework reproduces exactly).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Extra detail goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Persistent XLA compilation cache, keyed by a machine fingerprint so a
# cache written on one machine is never loaded on another (the
# cross-host CPU machine-feature mismatch is why the package keeps this
# opt-in).  The tunneled TPU compile service has been observed to take
# 2+ minutes per executable on a bad day; the cache makes repeat bench
# runs' setup near-instant and costs nothing when compiles are fast.
import _cache_util

_cache_util.set_default_compile_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_trainer(steps_milestones=(250, 1500), loaders=None, grid=64,
                  fuse=False, trainer_overrides=None, model_overrides=None):
    import jax
    from generative_physics_informed_pde_tpu.data import DataLoader
    from generative_physics_informed_pde_tpu.fem import GaussianRandomField
    from generative_physics_informed_pde_tpu.training import (
        TrainerParameters, CreateTrainerFromPermutation)

    params = TrainerParameters()
    params.identifier = "highres" if grid == 64 else "highres128"
    params.trainer["lr_init"] = 1e-2
    params.trainer["N_monitor_interval"] = 10 ** 9  # no monitoring in bench
    params.scheduler = {"milestones": list(steps_milestones),
                        "factor": float(np.sqrt(0.1))}
    params.data.update(N_u=1024, N_s=128, N_u_max=1024, N_s_max=128,
                       N_vo_max=0, N_vo=0, N_val=128, armortized_bs=64,
                       vo_spec={})
    if fuse:  # one batched decode per ELBO (--fuse; see PARITY.md)
        params.margs = {"fuse_decodes": True}
    if model_overrides:
        params.margs = dict(params.margs or {}, **model_overrides)
    if trainer_overrides:
        params.trainer.update(trainer_overrides)

    if loaders is not None:
        # reuse the already-assembled arrays (fresh partition state)
        src_dl, src_dlu = loaders
        dl = DataLoader(src_dl.X, X_DG=src_dl._X_DG, Y=src_dl._Y,
                        BCE=src_dl._BCE, F_ROM_BC=src_dl._F_ROM_BC)
        dlu = DataLoader(src_dlu.X)
        dlu.lock_physics_assembly()
    else:
        # fields via the FFT path (no NxN-squared eigh at bench time)
        rf = GaussianRandomField.from_image(grid, grid, 0.4, 0.8, 0.04,
                                            method="fft")
        dl = DataLoader.from_sampler(rf, 128 + 128, key=jax.random.PRNGKey(0))
        dlu = DataLoader.from_sampler(rf, 1024, key=jax.random.PRNGKey(1))
        dlu.lock_physics_assembly()
    trainer = CreateTrainerFromPermutation(
        params, permutation=np.arange(dl.N), permutation_u=np.arange(dlu.N),
        dl=dl, dlu=dlu)
    return trainer, dl, dlu


def measure_steps_per_sec(trainer, n_steps: int, warmup: int = 5,
                          chunk: int = 25) -> float:
    """chunk=1 skips compiling the scanned step variant entirely (the
    scan compile alone takes tens of minutes on the 1-core host at
    128^2)."""
    import jax
    import jax.numpy as jnp

    dummy = trainer._vo_state or (np.zeros((1, 1), np.float32),) * 2
    dummy = tuple(jnp.asarray(d) for d in dummy)

    def run(k, c):
        logs = None
        for _ in range(k):
            trainer.state, logs = trainer._train_step(
                trainer.state, *dummy, holdoff=True, n_steps=c)
        # NB: block_until_ready does not reliably block on remote-tunnel
        # runtimes -- force a host transfer
        float(logs["elbo"])

    run(warmup, 1)
    if chunk > 1:
        run(1, chunk)  # compile the scanned variant
    n_dispatch = max(1, n_steps // chunk)
    t0 = time.perf_counter()
    run(n_dispatch, chunk)
    return n_dispatch * chunk / (time.perf_counter() - t0)


def measure_cg_solves_per_sec(physics, batch: int = 1024) -> float:
    import jax
    import jax.numpy as jnp

    fom = physics["fom"]
    key = jax.random.PRNGKey(0)
    alpha = jnp.exp(0.3 * jax.random.normal(
        key, (batch, fom.grid.n_cells), dtype=jnp.float32))
    theta = jax.random.uniform(key, (batch, 4), minval=-0.5, maxval=0.5)
    vals = fom.profile.constrained_values(theta)
    float(fom.solve_batched(alpha, vals).sum())    # compile + run
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        s = float(fom.solve_batched(alpha, vals).sum())  # force transfer
    return reps * batch / (time.perf_counter() - t0)


def main():
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    grid = 128 if "--grid128" in sys.argv else 64
    fuse = "--fuse" in sys.argv
    n_steps = int(args[0]) if args else 100
    backend = jax.default_backend()
    log(f"devices: {jax.devices()} (backend={backend})")

    t0 = time.perf_counter()
    trainer, dl, dlu = build_trainer(grid=grid, fuse=fuse)
    log(f"setup (incl. {dl.N} batched {grid}^2 label solves): "
        f"{time.perf_counter() - t0:.1f}s")

    sps = measure_steps_per_sec(trainer, n_steps)
    log(f"SVI steps/sec on {backend}: {sps:.2f}")

    cg = measure_cg_solves_per_sec(trainer.physics)
    log(f"batched {grid}^2 CG solves/sec on {backend}: {cg:.1f}")

    # CPU baseline of the same jitted step (stand-in for the torch+FEniCS
    # CPU reference).  Take the BEST of 3 measurements: host contention
    # only ever slows the CPU run down, so the max is the least-noisy
    # stand-in for an uncontended host (VERDICT round 1, item 10).
    vs_baseline = float("nan")
    if backend != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                trainer_cpu, _, _ = build_trainer(loaders=(dl, dlu),
                                                  grid=grid, fuse=fuse)
                if grid >= 128:  # ~30 s/step on the 1-core host
                    runs = [measure_steps_per_sec(trainer_cpu, 3, warmup=1,
                                                  chunk=1)]
                else:
                    runs = [measure_steps_per_sec(
                        trainer_cpu, max(5, n_steps // 20), warmup=2)
                        for _ in range(3)]
            sps_cpu = max(runs)
            log(f"SVI steps/sec on cpu: best {sps_cpu:.3f} of "
                f"{[round(r, 3) for r in runs]}")
            vs_baseline = sps / sps_cpu
        except Exception as e:  # pragma: no cover
            log(f"cpu baseline failed: {e}")

    print(json.dumps({
        "metric": f"svi_elbo_steps_per_sec_{grid}x{grid}",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": (round(vs_baseline, 2)
                        if np.isfinite(vs_baseline) else None),
        "caveat": "vs_baseline is same-math jitted JAX on THIS host's "
                  "single CPU core; a 16-core workstation would be "
                  "~10-16x faster, i.e. divide by ~10-16 for a "
                  "typical-CPU comparison",
    }))


if __name__ == "__main__":
    main()
