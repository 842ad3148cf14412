#!/usr/bin/env python
"""Count the collectives XLA inserts into the sharded training step.

Evidence base for DESIGN.md's multi-chip readiness section: on real
multi-chip hardware nothing about the program changes -- the same
NamedSharding annotations compile to the same HLO, with the collectives
below riding ICI instead of the virtual-device loopback.  Counting them
(and their payload bytes) on the 8-virtual-CPU-device mesh therefore
predicts the communication volume per step on a real slice.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
          python benchmarks/hlo_collectives.py
"""

from __future__ import annotations

import re
import sys


COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


_SHAPE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4,
          "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def count_collectives(hlo_text: str) -> dict:
    """op -> (count, total payload MB) over the optimized module.

    Handles both plain and TUPLE-shaped instructions -- XLA fuses the
    replicated-parameter gradient reductions into one tuple all-reduce
    (``%all-reduce = (f32[..], f32[..], ...) all-reduce(...)``), which a
    single-shape regex silently misses."""
    out = {}
    for op in COLLECTIVES:
        # result shape = everything between '= ' and ' <op>('
        pat = re.compile(r"= (\(?[^=]*?\)?) " + re.escape(op)
                         + r"(?:\.[0-9]+)?\(")
        n, mb = 0, 0.0
        for m in pat.finditer(hlo_text):
            n += 1
            for dt, dims_s in _SHAPE.findall(m.group(1)):
                elems = 1
                for d in dims_s.split(","):
                    if d:
                        elems *= int(d)
                mb += elems * _BYTES.get(dt, 4) / 1e6
        if n:
            out[op] = (n, mb)
    return out


def analyze(tag: str, jitted, *args, **kw) -> None:
    txt = jitted.lower(*args, **kw).compile().as_text()
    counts = count_collectives(txt)
    total_insts = txt.count("\n")
    print(f"\n[{tag}] optimized HLO: {total_insts} lines")
    if not counts:
        print("  (no cross-device collectives)")
    for op, (n, mb) in sorted(counts.items()):
        print(f"  {op:<20} x{n:<4d}  {mb:8.3f} MB payload")


def main() -> None:
    import numpy as np
    import jax

    jax.config.update("jax_platforms", "cpu")
    n = 8
    if len(jax.devices()) < n:
        sys.exit("need XLA_FLAGS=--xla_force_host_platform_device_count=8")

    sys.path.insert(0, ".")
    from generative_physics_informed_pde_tpu.data import DataLoader
    from generative_physics_informed_pde_tpu.fem import GaussianRandomField
    from generative_physics_informed_pde_tpu.parallel import make_mesh
    from generative_physics_informed_pde_tpu.training import (
        TrainerParameters, CreateTrainerFromPermutation)

    def build(mesh, n_mc=1):
        params = TrainerParameters()
        params.identifier = "highres32"
        params.debug = True
        params.trainer["lr_init"] = 1e-2
        if n_mc > 1:
            params.trainer["N_monte_carlo_elbo"] = n_mc
        params.scheduler = {"milestones": [100], "factor": 0.5}
        params.data.update(N_u=16, N_s=16, N_u_max=16, N_s_max=16,
                           N_vo=0, N_vo_max=0, N_val=8, armortized_bs=8,
                           vo_spec={})
        rf = GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
        dl = DataLoader.from_sampler(rf, 24, key=jax.random.PRNGKey(0))
        dlu = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(1))
        dlu.lock_physics_assembly()
        tr = CreateTrainerFromPermutation(
            params, permutation=np.arange(dl.N),
            permutation_u=np.arange(dlu.N), dl=dl, dlu=dlu)
        tr.setup(scheduler_spec=params.scheduler, mesh=mesh)
        return tr

    for tag, mesh, n_mc in [
            ("dp=8 step", make_mesh(n, ("dp",)), 1),
            ("dp=4 x mc=2 step, n_mc=4", make_mesh(n, ("dp", "mc"),
                                                   (4, 2)), 4)]:
        tr = build(mesh, n_mc)
        dummy = tr._vo_state or (np.zeros((1, 1), np.float32),) * 2
        analyze(tag, tr._train_step.jitted, tr.state, tr._step_data,
                *dummy, holdoff=True, n_steps=1)


if __name__ == "__main__":
    main()
