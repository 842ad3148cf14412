#!/usr/bin/env python
"""Speed-of-light analysis for the headline SVI training step.

The driver metric is SVI ELBO steps/sec on the 'highres' 64^2 recipe
(bench.py).  The stencil-apply roofline (stencil_roofline.py) settled
the SOLVER's bound; this script bounds the full TRAINING STEP: composite
ELBO value+grad (DenseNet decode fwd+bwd at batch 128, embedded batched
ROM Cholesky solve, likelihoods) + Adam + the prediction-ensemble inner
loop, scan-fused exactly as bench.py dispatches it.

Methodology:
  1. XLA's own cost model for the compiled step executable
     (``compiled.cost_analysis()``: flops + bytes accessed).  XLA's
     "bytes accessed" counts per-op HBM traffic of the fused graph --
     the same accounting the stencil roofline did by hand.
  2. Chip peaks are MEASURED, not quoted: f32 matmul FLOP/s from a
     4096^2 matmul chain, HBM bandwidth from a big-array copy chain
     (same methodology as stencil_roofline.py).
  3. bound = max(flops / peak_flops, bytes / peak_bw); report
     measured-step-time / bound.

The gap between the bound and the measured time is the op-count /
scheduling overhead of the ~2,000-op fused graph -- the part that is
XLA's to schedule, with no single hot op left to hand-optimise (the
composition ablation in PARITY.md: supervised 4.2 ms of 5.6 ms, convs
op-count-bound at growth-4 channels).

Run on the TPU:  python benchmarks/step_roofline.py [n_steps] [--grid128]

``--grid128`` repeats the methodology on the north-star 'highres128'
recipe (BASELINE.json's >=100x-at-128^2 bar; VERDICT r3 item 1).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _t(f, reps=3):
    """Best-of-reps wall time of f() with forced host materialisation."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measured_peaks():
    """Measured chip peaks: f32 matmul FLOP/s and HBM copy bandwidth."""
    import jax
    import jax.numpy as jnp

    n, chain = 4096, 32
    a = jnp.ones((n, n), jnp.float32)

    @jax.jit
    def mm(a):
        def body(_, x):
            return x @ a * (1.0 / n)
        return jax.lax.fori_loop(0, chain, body, a)

    float(mm(a).sum())  # compile
    dt = _t(lambda: float(mm(a).sum()))
    peak_flops = chain * 2 * n**3 / dt

    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB

    @jax.jit
    def cp(x):
        def body(_, x):
            return x + 1.0  # read + write one pass
        return jax.lax.fori_loop(0, chain, body, x)

    float(cp(big).sum())
    dt = _t(lambda: float(cp(big).sum()))
    peak_bw = chain * 2 * big.nbytes / dt
    return peak_flops, peak_bw


def main():
    import jax

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_steps = int(args[0]) if args else 500
    grid = 128 if "--grid128" in sys.argv else 64
    fuse = "--fuse" in sys.argv
    sys.path.insert(0, ".")
    import bench

    peak_flops, peak_bw = measured_peaks()
    print(f"measured peaks: {peak_flops / 1e12:.1f} TFLOP/s f32 matmul, "
          f"{peak_bw / 1e9:.0f} GB/s HBM copy", flush=True)

    trainer, _, _ = bench.build_trainer(grid=grid, fuse=fuse)
    sps = bench.measure_steps_per_sec(trainer, n_steps)
    step_ms = 1e3 / sps
    print(f"measured: {sps:.1f} steps/s = {step_ms:.2f} ms/step "
          f"(chunk-25 scan, dispatch amortised)", flush=True)

    # lower the compiled scan-25 executable and ask XLA for its cost model
    import jax.numpy as jnp
    dummy = trainer._vo_state or (np.zeros((1, 1), np.float32),) * 2
    dummy = tuple(jnp.asarray(d) for d in dummy)
    lowered = trainer._train_step.jitted.lower(
        trainer.state, trainer._step_data, *dummy, holdoff=True, n_steps=25)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = cost.get("flops", 0.0) / 25
    byts = cost.get("bytes accessed", 0.0) / 25
    t_flops = flops / peak_flops
    t_bw = byts / peak_bw
    bound = max(t_flops, t_bw)
    print(f"XLA cost model per step: {flops / 1e9:.2f} GFLOP, "
          f"{byts / 1e6:.1f} MB accessed")
    print(f"bounds: compute {t_flops * 1e3:.3f} ms, "
          f"memory {t_bw * 1e3:.3f} ms -> speed-of-light "
          f"{bound * 1e3:.3f} ms/step")
    print(f"step is {step_ms / (bound * 1e3):.2f}x off the bound "
          f"({'memory' if t_bw > t_flops else 'compute'}-bound)")


if __name__ == "__main__":
    main()
