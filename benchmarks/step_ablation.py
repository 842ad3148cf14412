#!/usr/bin/env python
"""Fresh per-term composition of the headline SVI step.

Default 64^2 'highres'; pass --grid128 for the north-star 'highres128'.

The round-2 composition table (PARITY.md) predates the Cholesky ROM
solve and the current 300+ steps/s build; before spending effort on a
step optimisation, re-measure which term actually dominates now.

Variants (same data, same recipe as bench.py):
  full        supervised + amortized unsup + PE inner loop
  no_pe       N_PE_updates = 0
  no_unsup    unsupervised term removed (N_u = 0)
  sup_only    both removed

Run on the TPU:  python benchmarks/step_ablation.py [n_steps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(variant: str, loaders, grid=64):
    import jax
    from generative_physics_informed_pde_tpu.data import DataLoader
    from generative_physics_informed_pde_tpu.training import (
        TrainerParameters, CreateTrainerFromPermutation)

    params = TrainerParameters()
    params.identifier = "highres" if grid == 64 else "highres128"
    params.trainer["lr_init"] = 1e-2
    params.trainer["N_monitor_interval"] = 10 ** 9
    params.scheduler = {"milestones": [250, 1500],
                        "factor": float(np.sqrt(0.1))}
    n_u = 0 if variant in ("no_unsup", "sup_only") else 1024
    params.data.update(N_u=n_u, N_s=128, N_u_max=n_u, N_s_max=128,
                       N_vo_max=0, N_vo=0, N_val=128, armortized_bs=64,
                       vo_spec={})
    if variant in ("no_pe", "sup_only"):
        params.trainer["N_PE_updates"] = 0
    if variant == "pe_bf16":
        params.trainer["PE_compute_dtype"] = "bfloat16"
    if variant == "pe_f32":
        # explicit: the 'auto' default itself resolves to bf16 at >=128^2,
        # so the A/B baseline arm must force the f32 hot loop
        params.trainer["PE_compute_dtype"] = None
    if variant == "fuse":
        params.margs = {"fuse_decodes": True}
    if variant == "remat":
        params.margs = {"remat_codec": True}
    if variant == "unsup_bf16":
        params.margs = {"unsup_compute_dtype": "bfloat16"}
    if variant == "unsup_f32":
        # explicit: the 'auto' default itself resolves to bf16 at >=128^2
        params.margs = {"unsup_compute_dtype": None}
    if variant.startswith("pad"):
        # math-preserving channel padding (codec.pad_channels)
        params.margs = {"codec_pad_cin": int(variant[len("pad"):])}
    if variant.startswith("wide"):
        # wider-growth/shallower decoder (PARITY decode-architecture
        # study); NOT parity -- a different architecture.  wide12 =
        # g12/if12/(1,1,1,1) is the equal-parameter arm (1.05x the
        # baseline's 21.4k decoder params); wide16 = 1.54x params
        gr = int(variant[len("wide"):])
        params.margs = {"dec_growth_rate": gr,
                        "dec_init_features": gr,
                        "dec_blocks": (1, 1, 1, 1)}
    if variant.startswith("pe_int"):
        params.trainer["N_PE_interval"] = int(variant[len("pe_int"):])

    src_dl, src_dlu = loaders
    dl = DataLoader(src_dl.X, X_DG=src_dl._X_DG, Y=src_dl._Y,
                    BCE=src_dl._BCE, F_ROM_BC=src_dl._F_ROM_BC)
    # dlu is always passed (the factory would otherwise resample); the
    # unsupervised term is controlled via N_u_max
    dlu = DataLoader(src_dlu.X)
    dlu.lock_physics_assembly()
    trainer = CreateTrainerFromPermutation(
        params, permutation=np.arange(dl.N), permutation_u=np.arange(dlu.N),
        dl=dl, dlu=dlu)
    return trainer


def main():
    import bench

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    grid = 128 if "--grid128" in sys.argv else 64
    n_steps = int(args[0]) if args else (200 if grid == 128 else 500)
    _, dl, dlu = bench.build_trainer(grid=grid)  # assembles labels once
    loaders = (dl, dlu)

    ab_flags = {"--ab-pe": ("pe_f32", "pe_bf16"),
                "--ab-fuse": ("full", "fuse"),
                "--ab-interval": ("full", "pe_int2", "pe_int4", "pe_int8"),
                "--ab-remat": ("full", "remat"),
                "--ab-unsup": ("unsup_f32", "unsup_bf16"),
                "--ab-pad": ("full", "pad8", "pad32", "pad128"),
                "--ab-wide": ("full", "wide12", "wide16")}
    hit = [f for f in ab_flags if f in sys.argv]
    if hit:
        # interleaved same-process A/B (cross-run variance on the tunneled
        # runtime reaches 15-40%; alternate chunks instead)
        arms = ab_flags[hit[0]]
        trs = {v: build(v, loaders, grid=grid) for v in arms}
        acc = {v: [] for v in trs}
        for v, tr in trs.items():   # compile both first
            bench.measure_steps_per_sec(tr, 25)
        for _ in range(4):
            for v, tr in trs.items():
                acc[v].append(bench.measure_steps_per_sec(
                    tr, max(50, n_steps // 4)))
        for v, runs in acc.items():
            ms = [1e3 / r for r in runs]
            print(f"{v:<10} {np.median(runs):8.1f} steps/s  "
                  f"{np.median(ms):6.3f} ms/step  "
                  f"(chunks: {' '.join(f'{r:.1f}' for r in runs)})",
                  flush=True)
        return

    rows = []
    for variant in ("full", "no_pe", "no_unsup", "sup_only"):
        t0 = time.time()
        tr = build(variant, loaders, grid=grid)
        sps = bench.measure_steps_per_sec(tr, n_steps)
        rows.append((variant, sps, 1e3 / sps))
        print(f"{variant:<10} {sps:8.1f} steps/s  {1e3 / sps:6.3f} ms/step "
              f"(setup {time.time() - t0:.0f}s)", flush=True)

    full = rows[0][2]
    for v, _, ms in rows[1:]:
        print(f"implied cost of removed term(s) vs full "
              f"[{v}]: {full - ms:+.3f} ms")


if __name__ == "__main__":
    main()
