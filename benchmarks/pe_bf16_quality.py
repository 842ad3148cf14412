"""Paired quality check for the bf16 PredictionEnsemble hot loop at 128^2.

Two identical-seed 'highres128' bench-recipe runs (PE_compute_dtype None
vs 'bfloat16'), same data, N steps each, then finalize() and compare the
final validation metrics.  By construction the *training* trajectory is
independent of pe_q (the inner SVI only optimises the validation
posterior), so the only thing at risk is whether the f32 finalize-time
refinement recovers the same q optimum from a bf16-converged start --
this run measures exactly that.

Usage:  python benchmarks/pe_bf16_quality.py [n_steps]    (default 1500)
"""

import sys
import time

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    sys.path.insert(0, ".")
    import bench

    rows = {}
    loaders = None
    for mode in ("f32", "bf16"):
        t0 = time.time()
        # explicit override both ways: the default is 'auto', which itself
        # resolves to bf16 at 128^2 -- the f32 arm must force None.
        # lr 1e-3 = the converged-run recipes' value (bench's throughput
        # lr 1e-2 diverges over 1500 steps at 128^2 -- NaN in BOTH arms)
        ov = {"PE_compute_dtype": "bfloat16" if mode == "bf16" else None,
              "lr_init": 1e-3}
        tr, dl, dlu = bench.build_trainer(grid=128, loaders=loaders,
                                          trainer_overrides=ov)
        loaders = (dl, dlu)
        tr.run(n_steps, verbose=False)
        tr.finalize()
        res = tr.results()
        rows[mode] = {k: float(v) for k, v in res.items()
                      if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        print(f"{mode}: {rows[mode]}  (wall {time.time() - t0:.0f}s)",
              flush=True)

    print("\npaired deltas (bf16 - f32):", flush=True)
    for k in rows["f32"]:
        if k in rows["bf16"]:
            print(f"  {k:<14} {rows['bf16'][k] - rows['f32'][k]:+.5f}")


if __name__ == "__main__":
    main()
