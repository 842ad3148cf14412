"""Learning-rate schedules (optax) matching the reference wrapper.

TPU-native re-implementation of ``LearningScheduleWrapper``
(reference: lamp/optimization.py:5-93).  Torch's stateful schedulers map to
optax schedule functions of the update count:

* ``MultiStepLR(milestones, factor)`` -> piecewise-constant scale,
* ``StepLR(step_size, factor)``      -> staircase exponential decay,
* ``Dummy``                          -> constant,
* ``ReduceLROnPlateau``              -> host-driven scale (the metric is a
  runtime value, so the trainer adjusts a scale factor outside jit via
  ``optax.inject_hyperparams`` -- see PlateauController).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import optax


def multistep_lr(lr_init: float, milestones: Sequence[int], factor: float,
                 steps_per_update: float = 1) -> optax.Schedule:
    """lr_init scaled by ``factor`` at each milestone (in *training
    iterations*; ``steps_per_update`` converts to optimiser update counts
    when an optimiser takes several updates per training iteration, like
    the prediction ensemble's inner Adam).  May be fractional: an
    optimiser gated to every k-th training step advances updates/k counts
    per iteration (e.g. the PE inner Adam under N_PE_interval)."""
    assert factor < 1
    # accumulate factors for milestones that round to the SAME update
    # count (fractional steps_per_update can collapse neighbours): each
    # requested decay must still apply, or the optimiser silently runs at
    # 1/factor times the intended lr afterwards
    boundaries: dict = {}
    for m in milestones:
        b = max(1, round(int(m) * steps_per_update))
        boundaries[b] = boundaries.get(b, 1.0) * factor
    return optax.piecewise_constant_schedule(lr_init, boundaries)


def step_lr(lr_init: float, step_size: int, factor: float = 0.1,
            steps_per_update: float = 1) -> optax.Schedule:
    assert factor < 1
    return optax.exponential_decay(
        lr_init, transition_steps=max(1, round(step_size * steps_per_update)),
        decay_rate=factor, staircase=True)


def constant_lr(lr_init: float) -> optax.Schedule:
    return optax.constant_schedule(lr_init)


def make_schedule(spec: Optional[dict], lr_init: float,
                  steps_per_update: float = 1) -> optax.Schedule:
    """Build a schedule from a reference-style spec dict:
    {'milestones': [...], 'factor': f} | {'step_size': n, 'factor': f} |
    None (constant)."""
    if lr_init is None:
        raise ValueError(
            "learning rate is unset (params.trainer['lr_init'] is None); "
            "set it before building the trainer")
    if not spec:
        return constant_lr(lr_init)
    if "milestones" in spec:
        return multistep_lr(lr_init, spec["milestones"], spec["factor"],
                            steps_per_update)
    if "step_size" in spec:
        return step_lr(lr_init, spec["step_size"], spec.get("factor", 0.1),
                       steps_per_update)
    raise ValueError(f"unknown schedule spec {spec}")


@dataclasses.dataclass
class PlateauController:
    """Host-side ReduceLROnPlateau (reference: lamp/optimization.py:30-37):
    tracks a metric (mode 'max'), scales the lr by ``factor`` after
    ``patience`` non-improving steps, floored at ``min_lr``.

    Use with ``optax.inject_hyperparams``: the trainer multiplies the
    injected learning rate by ``self.scale`` each step.
    """

    patience: int
    threshold: float = 1e-3
    factor: float = 0.1
    min_lr: float = 1e-3
    mode: str = "max"
    lr_init: float = 1e-2

    best: float = None
    bad_steps: int = 0
    scale: float = 1.0

    def state_dict(self) -> dict:
        """Mutable state for checkpointing (``best`` may be None; stored
        as NaN to keep orbax leaf types stable)."""
        return {"best": float("nan") if self.best is None else
                float(self.best),
                "bad_steps": int(self.bad_steps), "scale": float(self.scale)}

    def load_state_dict(self, d: dict) -> None:
        best = float(d["best"])
        self.best = None if best != best else best  # NaN -> None
        self.bad_steps = int(d["bad_steps"])
        self.scale = float(d["scale"])

    def step(self, metric: float) -> float:
        metric = float(metric)
        better = (self.best is None or
                  (metric > self.best + self.threshold
                   if self.mode == "max"
                   else metric < self.best - self.threshold))
        if better:
            self.best = metric
            self.bad_steps = 0
        else:
            self.bad_steps += 1
            if self.bad_steps > self.patience:
                new_scale = max(self.scale * self.factor,
                                self.min_lr / self.lr_init)
                self.scale = new_scale
                self.bad_steps = 0
        return self.scale
