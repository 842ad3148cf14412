"""Paired quality checks for PredictionEnsemble hot-loop optimizations
at 128^2.

Default mode (PE decode dtype): two identical-seed 'highres128'
bench-recipe runs (PE_compute_dtype None vs 'bfloat16'), same data, N
steps each, then finalize() and compare the final validation metrics.
By construction the *training* trajectory is independent of pe_q (the
inner SVI only optimises the validation posterior), so the only thing at
risk is whether the f32 finalize-time refinement recovers the same q
optimum from a bf16-converged start -- this run measures exactly that.

--interval mode (PE update cadence): N_PE_interval 1 vs 4 with
monitoring ON (every 250 steps).  Model parameters are bit-identical by
construction (tests/test_training.py::test_pe_interval_training_
invariant); what the monitor-point re-convergence burst must protect is
the MONITOR metric series -- compared point by point here -- plus the
final metrics.

--unsup mode (scoped unsup-term bf16): unsup_compute_dtype None vs
'bfloat16' with monitoring ON.  UNLIKE the PE modes this perturbs
training (unsup gradients + shared BatchNorm stats see bf16
activations), so the arms are NOT expected to match bit-for-bit; the
question is whether the quality TRAJECTORY is equal within run noise.

Usage:  python benchmarks/pe_bf16_quality.py [n_steps]
        [--interval | --unsup]   (default 1500 steps)
"""

import sys
import time

import numpy as np


def run_pair(n_steps, arm_overrides, monitor_interval=None,
             model_arm_overrides=None):
    sys.path.insert(0, ".")
    import bench

    rows, series = {}, {}
    loaders = None
    for mode, ov in arm_overrides.items():
        t0 = time.time()
        # lr 1e-3 = the converged-run recipes' value (bench's throughput
        # lr 1e-2 diverges over 1500 steps at 128^2 -- NaN in BOTH arms)
        ov = dict(ov, lr_init=1e-3)
        if monitor_interval is not None:
            ov["N_monitor_interval"] = monitor_interval
        tr, dl, dlu = bench.build_trainer(
            grid=128, loaders=loaders, trainer_overrides=ov,
            model_overrides=(model_arm_overrides or {}).get(mode))
        loaders = (dl, dlu)
        tr.run(n_steps, verbose=False)
        tr.finalize()
        res = tr.results()
        rows[mode] = {k: float(v) for k, v in res.items()
                      if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        series[mode] = {k: list(tr._analysis.series[k].value)
                        for k in ("relerr_y", "r2_y", "logscore_y")}
        print(f"{mode}: {rows[mode]}  (wall {time.time() - t0:.0f}s)",
              flush=True)
    return rows, series


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_steps = int(args[0]) if args else 1500

    iv_flags = [a for a in sys.argv if a.startswith("--interval")]
    if iv_flags:
        # optional cadence: `--interval=8` compares 1 vs 8 (default 4,
        # the round-4 validation).  `=` form only: a bare `--interval N`
        # would silently misparse N as n_steps.
        if iv_flags[0] != "--interval" and "=" not in iv_flags[0]:
            raise SystemExit(f"unknown flag {iv_flags[0]}; use --interval=N")
        iv = int(iv_flags[0].split("=")[1]) if "=" in iv_flags[0] else 4
        if iv <= 1:
            # {'int1': ..., 'int1': ...} would collapse to ONE arm and
            # report a vacuous zero-delta "validation"
            raise SystemExit("--interval must be > 1 (1 is the reference "
                             "cadence both arms are compared against)")
        arms = {"int1": {"N_PE_interval": 1},
                f"int{iv}": {"N_PE_interval": iv}}
        rows, series = run_pair(n_steps, arms, monitor_interval=250)
        a, b = "int1", f"int{iv}"
    elif "--unsup" in sys.argv:
        arms = {"unsup_f32": {}, "unsup_bf16": {}}
        rows, series = run_pair(
            n_steps, arms, monitor_interval=250,
            model_arm_overrides={
                # explicit both ways: the 'auto' default resolves to
                # bf16 at 128^2, so the f32 arm must force None
                "unsup_f32": {"unsup_compute_dtype": None},
                "unsup_bf16": {"unsup_compute_dtype": "bfloat16"}})
        a, b = "unsup_f32", "unsup_bf16"
    else:
        # explicit override both ways: the default is 'auto', which itself
        # resolves to bf16 at 128^2 -- the f32 arm must force None
        arms = {"f32": {"PE_compute_dtype": None},
                "bf16": {"PE_compute_dtype": "bfloat16"}}
        rows, series = run_pair(n_steps, arms)
        a, b = "f32", "bf16"

    print(f"\npaired deltas ({b} - {a}):", flush=True)
    for k in rows[a]:
        if k in rows[b]:
            print(f"  {k:<14} {rows[b][k] - rows[a][k]:+.5f}")
    for k in series[a]:
        va, vb = np.asarray(series[a][k]), np.asarray(series[b][k])
        n = min(len(va), len(vb))
        if n:
            d = np.abs(vb[:n] - va[:n])
            print(f"  monitor series {k:<12} n={n} "
                  f"max|delta|={d.max():.5f} mean|delta|={d.mean():.5f}")


if __name__ == "__main__":
    main()
