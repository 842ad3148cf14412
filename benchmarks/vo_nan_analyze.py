#!/usr/bin/env python
"""Offline analysis of a GPIPDE_VO_DUMP capture (non-finite VO conditioning).

The VO failure containment (constraints/virtual_observables.py) dumps the
exact conditioning inputs when any sample's posterior moments go
non-finite.  This script replays the conditioning per failed sample in
f64 and f32 and localises the breakdown: non-finite inputs (training-side
divergence) vs an f32 Cholesky failure on finite inputs (conditioning-side
ill-conditioning), reporting the Schur-complement matrix's scale,
condition number, and the jitter that would have been needed.

    python benchmarks/vo_nan_analyze.py results/vo_dump_cadence50.npz
"""

import sys

import numpy as np


def analyze(path: str) -> None:
    d = np.load(path)
    Gamma, alpha = d["Gamma"], d["alpha"]
    G, PREC, vo_var = d["G"], d["PREC"], d["vo_var"]
    bad = d["bad"]
    print(f"iteration={int(d['iteration'])}  N={Gamma.shape[0]}  "
          f"m={Gamma.shape[1]}  d={Gamma.shape[2]}  "
          f"failed samples: {np.flatnonzero(bad).tolist()}")
    print(f"vo_var: min={vo_var.min():.3e} max={vo_var.max():.3e}")

    for n in np.flatnonzero(bad):
        gn, pn = G[n], PREC[n]
        fin_g, fin_p = np.isfinite(gn).all(), np.isfinite(pn).all()
        print(f"\n-- sample {n}: prior mean finite={fin_g} "
              f"prior precision finite={fin_p}")
        if not (fin_g and fin_p):
            print("   => TRAINING-side divergence (the model fed a "
                  "non-finite prior); conditioning is not at fault")
            continue
        print(f"   PREC range [{pn.min():.3e}, {pn.max():.3e}]  "
              f"|G| max {np.abs(gn).max():.3e}")
        cov = 1.0 / pn.astype(np.float64)
        Lam = (Gamma[n].astype(np.float64) * cov) @ Gamma[n].T.astype(
            np.float64) + np.diag(vo_var.astype(np.float64))
        eig = np.linalg.eigvalsh(Lam)
        print(f"   Lambda(f64): diag [{Lam.diagonal().min():.3e}, "
              f"{Lam.diagonal().max():.3e}]  eig [{eig.min():.3e}, "
              f"{eig.max():.3e}]  cond {eig.max() / max(eig.min(), 1e-300):.3e}")
        for dt in (np.float64, np.float32):
            L = _try_chol(Lam.astype(dt))
            print(f"   cholesky({np.dtype(dt).name}): "
                  f"{'ok' if L else 'FAILS'}")
        if eig.min() <= 0 or eig.max() / max(eig.min(), 1e-300) > 1e7:
            # the jitter that would have kept an f32 factorisation safe
            need = eig.max() * 1e-6
            print(f"   => relative jitter needed ~{need:.3e} "
                  f"(current absolute floor: {vo_var.min():.1e})")


def _try_chol(A) -> bool:
    try:
        np.linalg.cholesky(A)
        return True
    except np.linalg.LinAlgError:
        return False


if __name__ == "__main__":
    analyze(sys.argv[1] if len(sys.argv) > 1
            else "results/vo_dump_cadence50.npz")
