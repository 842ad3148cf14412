"""Throughput of the AOT-exported discriminative surrogate ('highres' 64²).

Measures fields/s for the frozen x -> y surrogate three ways:
  * live jit (warm) -- the in-process ceiling,
  * the AOT-exported bundle (serving.SurrogateBundle.predict) -- what a
    server actually runs, including the pad-to-bucket path,
  * after a save/load roundtrip -- proves the on-disk artifact serves at
    the same rate.

Context numbers (PARITY.md): batched 64² MG-PCG direct solves run at
~24.8k solves/s, but a direct solve needs the assembled conductivity and
returns only the solution; the surrogate maps raw field images to
solutions through the trained encoder/gp/ROM pipeline, which is the
deployment artifact the reference extracts (generative.py:605-644).

Usage:  python benchmarks/serving_bench.py [--buckets 256 1024 4096]
"""

import argparse
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from generative_physics_informed_pde_tpu.factories.model import ModelFactory
from generative_physics_informed_pde_tpu.serving import (
    SurrogateBundle, surrogate_fn)


def _timeit(fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    dt = (time.perf_counter() - t0) / reps
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, nargs="+",
                    default=[256, 1024, 4096])
    ap.add_argument("--preset", default="highres")
    ap.add_argument("--bf16", action="store_true",
                    help="also serve with compute_dtype=bfloat16 convs "
                         "(same f32 params) and report speed + deviation")
    args = ap.parse_args()

    mf = ModelFactory.FromIdentifier(args.preset)
    physics, model, dm, _, dtype = mf.setup()
    img = physics["fom"].grid.nx
    dim_F = physics["rom"].grid.n_nodes
    rng = np.random.default_rng(0)
    data = {"supervised": {
        "X": jnp.asarray(rng.normal(0.4, 0.8, (4, img, img)), dtype),
        "Y": jnp.zeros((4, physics["fom"].dim_out), dtype),
        "F_ROM_BC": jnp.zeros((4, dim_F), dtype)}}
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (img, img))

    print(f"preset={args.preset} image={img}x{img} dim_F={dim_F} "
          f"backend={jax.default_backend()}")

    live = jax.jit(surrogate_fn(dm, params, bs))
    t_build0 = time.perf_counter()
    bundle = SurrogateBundle.build(dm, params, bs, (img, img), dim_F,
                                   buckets=args.buckets, dtype=dtype)
    t_build = time.perf_counter() - t_build0
    path = "/tmp/gpipde_surrogate_bench.zip"
    bundle.save(path)
    loaded = SurrogateBundle.load(path)
    size_mb = pathlib.Path(path).stat().st_size / 1e6
    print(f"bundle: build {t_build:.1f}s, {len(args.buckets)} buckets, "
          f"{size_mb:.1f} MB on disk, platforms={bundle.platforms}")

    print(f"{'B':>6} {'live jit':>12} {'AOT bundle':>12} {'loaded':>12}  "
          f"(fields/s)")
    for B in args.buckets:
        x = jnp.asarray(rng.normal(0.4, 0.8, (B, img, img)), dtype)
        F = jnp.asarray(rng.normal(size=(B, dim_F)), dtype)
        rows = []
        for f in (lambda: float(live(x, F).sum()),
                  lambda: float(bundle.predict(x, F).sum()),
                  lambda: float(loaded.predict(x, F).sum())):
            dt, _ = _timeit(f)
            rows.append(B / dt)
        print(f"{B:>6} {rows[0]:>12,.0f} {rows[1]:>12,.0f} {rows[2]:>12,.0f}")

    if args.bf16:
        # same f32 params through bf16 convs: inference-only mixed precision
        mf16 = ModelFactory.FromIdentifier(args.preset)
        mf16.set("compute_dtype", "bfloat16")
        _, model16, dm16, _, _ = mf16.setup()
        live16 = jax.jit(surrogate_fn(dm16, params, bs))
        B = args.buckets[-1]
        x = jnp.asarray(rng.normal(0.4, 0.8, (B, img, img)), dtype)
        F = jnp.asarray(rng.normal(size=(B, dim_F)), dtype)
        dt32, _ = _timeit(lambda: float(live(x, F).sum()))
        dt16, _ = _timeit(lambda: float(live16(x, F).sum()))
        y32, y16 = live(x, F), live16(x, F)
        rel = float(jnp.linalg.norm(y16 - y32) / jnp.linalg.norm(y32))
        print(f"bf16 convs @B={B}: {B / dt16:,.0f} vs f32 {B / dt32:,.0f} "
              f"fields/s ({dt32 / dt16:.2f}x); rel-L2 deviation from f32 "
              f"output: {rel:.2e}")

    # pad path: a ragged request served through the bucket above it
    n = args.buckets[-1] - args.buckets[-1] // 3
    x = jnp.asarray(rng.normal(0.4, 0.8, (n, img, img)), dtype)
    F = jnp.asarray(rng.normal(size=(n, dim_F)), dtype)
    dt, _ = _timeit(lambda: float(bundle.predict(x, F).sum()))
    print(f"ragged n={n} via bucket {args.buckets[-1]}: {n / dt:,.0f} "
          f"fields/s (pad overhead included)")


if __name__ == "__main__":
    main()
