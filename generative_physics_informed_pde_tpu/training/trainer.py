"""SVI training loop for the physics-informed generative model.

TPU-native re-implementation of ``Trainer`` / ``TrainerParameters`` and the
``CreateTrainer*`` glue (reference: training.py:22-663).  The per-iteration
work -- composite-ELBO gradient step, Adam update, and the prediction
ensemble's inner optimisation -- is ONE jitted function closing over the
registered dataset shards; the python loop only orchestrates cadence
(virtual-observable refresh every ``N_vo_update_interval`` steps,
monitoring every ``N_monitor_interval`` steps), mirroring
training.py:393-462.
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from functools import partial
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..data.sampling import minibatch_indices
from ..factories.data import DataFactory
from ..factories.model import ModelFactory
from ..inference.analysis import Analysis
from ..inference.prediction import PredictionEnsemble
from .metrics import MetricsWriter
from .schedules import make_schedule

DEFAULT_CONFIG = dict(
    # reference: training.py:162-187 setup_config
    lr_init=None,
    normalize=False,
    l2_penalty=None,
    l1_penalty=None,
    N_PE_updates=3,
    N_PE_updates_final=100,
    # Run the PE inner SVI only every k-th training step (1 = every step,
    # the reference cadence, training.py:441-449).  The PE posterior is
    # consumed ONLY at monitor points and finalize -- it never feeds back
    # into model parameters or batch stats (PredictionEnsemble.elbo
    # discards the BN update), so the training trajectory is bit-identical
    # at any interval (tested).  When > 1, each monitor point first runs a
    # re-convergence burst (N_PE_updates_monitor inner iterations) so the
    # analysed q is as converged as the every-step cadence's.  Default 8:
    # measured 1.30x full-step at 128^2 and 1.19x at 64^2 (PARITY.md
    # round 4 cadence table), with the monitor metric series identical to
    # 5 decimals vs interval 1 and the 1500-step endpoint agreeing to
    # ~2e-6 (PARITY.md round 5).  Pass 1 for the reference's every-step
    # cadence.
    N_PE_interval=8,
    # inner PE iterations of the monitor-point burst (only used when
    # N_PE_interval > 1); None -> 8 * N_PE_updates
    N_PE_updates_monitor=None,
    # Prediction-ensemble hot-loop decode dtype: 'auto' (default),
    # 'bfloat16', or None.  The inner SVI optimises only the validation
    # posterior -- never model parameters -- so bf16 there cannot perturb
    # the training trajectory, and finalize re-refines q at full precision
    # before the final metrics.  'auto' resolves to bf16 when the decode
    # grid is >= 128^2 (measured 1.16x full-step win at 128^2; no win at
    # 64^2 where the step is op-count-bound -- PARITY.md round 4) and
    # to None below that.
    PE_compute_dtype="auto",
    N_monte_carlo_analysis=64,
    N_monte_carlo_analysis_final=128,
    N_monitor_interval=500,
    N_tensorboard_logging_interval=1,
    # VO refresh cadence: the reference uses 250 (training.py:407-409), but
    # the measured ablation (PARITY.md "Constrain-VO staleness") shows
    # constrain-VO at 250 self-distills stale targets and cadence 50
    # recovers ~40% of the quality gap at negligible cost (the update is
    # ~0.2% of step time at cadence 50).  50 is therefore the default;
    # pass 250 explicitly for reference-parity runs.
    N_vo_update_interval=50,
    N_vo_holdoff=100,
    N_monte_carlo_vo=128,
    N_monte_carlo_elbo=1,  # MC ELBO samples/step (config-3 extension)
    MonitorTraining=True,
    # fail fast on divergence: a NaN ELBO never recovers, and unattended
    # long runs otherwise burn hours stepping on NaNs (beyond the
    # reference, which has no such guard)
    halt_on_divergence=True,
)

# allowed fused-scan lengths: keeps the number of distinct compilations of
# the scanned train step small while still amortising dispatch latency.
# Capped at 100: (a) the chunk sweep measured throughput flat from 25
# fused steps up (PARITY.md, benchmarks/step_roofline.py: 309.5/308.8/
# 310.9 steps/s at 25/50/100), so longer scans buy nothing; (b) the
# scan-500 executable of the 512^2 training step crashes this TPU
# runtime's worker process outright (benchmarks/scan512_repro.py) --
# the third at-scale runtime fault after vmap-of-while_loop (PARITY
# config-5 note) and MG-in-CG fusion (benchmarks/mg_repro.py), while
# buckets <= 100 run 512^2 cleanly.
_SCAN_BUCKETS = (1, 2, 3, 4, 5, 6, 10, 25, 50, 100)

# Host-side monitor reductions, jitted: eager jnp ops on process-spanning
# (multi-host dp-sharded) arrays raise "not fully addressable"; the same
# reduction inside jit is ordinary SPMD and returns a replicated scalar
# every process can float().
_jit_mean = jax.jit(jnp.mean)
_jit_mean_exp = jax.jit(lambda x: jnp.mean(jnp.exp(x)))
_jit_avg_precision = jax.jit(lambda ls: jnp.mean(1.0 / jnp.exp(ls) ** 2))

DEBUG_CONFIG = dict(
    # reference: training.py:192-203 debug shadow
    N_monitor_interval=5,
    N_PE_updates=1,
    N_PE_updates_final=5,
    N_monte_carlo_analysis=8,
    N_monte_carlo_analysis_final=16,
    N_monte_carlo_vo=16,
    N_tensorboard_logging_interval=1,
)


class TrainingDivergedError(RuntimeError):
    """Raised at a monitor point when the ELBO has gone non-finite."""


def resolve_pe_compute_dtype(pe_dt, x_shape):
    """Resolve the PE_compute_dtype config value against the validation
    field shape (..., py, px).  'auto' -> bf16 hot loop only where measured
    to win (PARITY round 4): >= 128^2 decodes are MXU/HBM-bound (1.16x
    full-step); below that the step is op-count-bound and reduced
    precision buys nothing."""
    if isinstance(pe_dt, str) and pe_dt == "auto":
        pe_dt = "bfloat16" if min(x_shape[-2:]) >= 128 else None
    if isinstance(pe_dt, str):
        from ..factories.model import fetch_dtype
        return fetch_dtype(pe_dt)
    return pe_dt


class TrainerParameters:
    """Config struct matching the reference's three-tier dict layout
    (reference: training.py:22-54 + example.ipynb cell 2)."""

    def __init__(self):
        self.data = dict(N_u=0, N_s=None, N_vo=0, N_u_max=0, N_s_max=None,
                         N_vo_max=0, N_val=None, armortized_bs=None,
                         vo_spec=dict())
        self.scheduler = dict()
        self.trainer = dict()
        self.optimizer = dict()
        self.margs = dict()
        self.dargs = dict()
        self.identifier = None
        self.folder = None
        self.comment = ""
        self.debug = False
        self.Iterations = None
        self.seed = 0


@struct.dataclass
class TrainState:
    """All mutable training state as one pytree (donated through the jitted
    step)."""

    params: Any
    opt_state: Any
    batch_stats: Any
    pe_q: Any
    pe_opt_state: Any
    key: Any
    step: Any  # int32 scalar


class Trainer:
    """Orchestrates SVI on the composite ELBO (reference: training.py:59-501)."""

    def __init__(self, mf: ModelFactory, folder: Optional[str] = None,
                 comment: str = "", debug: bool = False, seed: int = 0):
        self._mf = mf
        physics, model, discriminative, encoder, dtype = mf.setup()
        self.physics = physics
        self.model = model
        self.discriminative_model = discriminative
        self.encoder = encoder
        self._dtype = dtype
        self.debug = debug
        # multi-process: only process 0 owns the metrics files (peers keep
        # the in-memory store so monitor/finalize logic stays identical);
        # the backend is already initialized by the model setup above, so
        # process_index() is safe to ask here
        if folder is not None and jax.process_index() != 0:
            folder = None
        self.writer = MetricsWriter(folder, comment=comment)
        self.model_writer_logs: Dict[str, list] = {}

        self._config = None
        self.datasets = None
        self.VO = None
        self._armortized_bs = None
        self._vo_is_initialized = False
        self._finalized = False
        self._global_runtime = 0.0
        self._global_iteration_counter = 0
        self._seed = seed
        self._monitor = dict(elbo=[], elbo_iter=[], lr=[], lr_iter=[])

        self.state: Optional[TrainState] = None
        self._mesh = None
        self._train_step = None
        self._plateau = None
        self._schedule_fn = None
        self._vo_state = None
        self._dl = None
        self._dlu = None

    # ----------------------------------------------------------- factory
    @classmethod
    def FromIdentifier(cls, identifier: str, margs=None, dargs=None,
                       **kwargs) -> "Trainer":
        mf = ModelFactory.FromIdentifier(identifier)
        if margs:
            for key, val in margs.items():
                mf.set(key, val)
        if dargs:
            # reference parity: dargs is deprecated/unused there too
            # (training.py:224-226 'this is actually not used and handled
            # externally') -- warn instead of silently discarding
            warnings.warn(
                "TrainerParameters.dargs is accepted for reference parity "
                "but has no effect; configure data via DataFactory presets "
                "or pass dl/dlu explicitly", stacklevel=2)
        return cls(mf=mf, **kwargs)

    from_identifier = FromIdentifier

    # ------------------------------------------------------------ config
    def setup_config(self, **kwargs):
        self._config = dict(DEFAULT_CONFIG)
        for key, value in kwargs.items():
            if key not in self._config:
                raise KeyError(f"Could not set > {key} < in trainer config")
            self._config[key] = value

    @property
    def config(self) -> dict:
        if self._config is None:
            raise RuntimeError("Config has not yet been setup")
        if self.debug:
            cfg = dict(self._config)
            cfg.update(DEBUG_CONFIG)
            return cfg
        return self._config

    def get(self, key):
        try:
            return self.config[key]
        except KeyError:
            raise KeyError(f"Could not retrieve > {key} < from trainer config")

    @property
    def dtype(self):
        return self._dtype

    @property
    def gn(self) -> int:
        return self._global_iteration_counter

    def tinfo(self, N: Optional[int] = None):
        """Average seconds/iteration + projection (reference:
        training.py:265-273)."""
        if self.gn == 0:
            return
        avg = self._global_runtime / self.gn
        print(f"{self.gn} iterations in {self._global_runtime} seconds : "
              f"that makes on average {avg} seconds per iteration")
        if N is not None:
            print(f"Will require (approx) {avg * N} for {N} iterations")

    def reset(self):
        raise NotImplementedError  # reference parity (training.py:235-236)

    @property
    def mf(self):
        return self._mf

    @property
    def dl(self):
        return self._dl

    @property
    def dlu(self):
        return self._dlu

    # --------------------------------------------------------------- data
    def set_data_from_datasets(self, dl, dlu, datasets, Nu, Ns, Nvo,
                               VO=None, vo_spec=None, armortized_bs=None):
        """Restrict chunks and build virtual observables
        (reference: training.py:285-361)."""
        assert "validation" in datasets and datasets["validation"].N > 0
        assert all(v is not None and v >= 0 for v in (Nu, Ns, Nvo))
        self._dl, self._dlu = dl, dlu

        assert "supervised" in datasets
        datasets["supervised"].restrict(Ns)
        if Ns == 0:
            # zero-label regime (reference thesis: readme.md:3-8 --
            # "little or NO labeled data"): the supervised ELBO term is
            # disabled and virtual observables / the unlabeled term carry
            # all learning signal.  The empty supervised chunk stays in
            # the pytree (0-row q_z block) so shapes/partitions are
            # unchanged across arms of an ablation.
            self.model = dataclasses.replace(self.model,
                                             disable_elbo_supervised=True)
        if Nvo > 0:
            assert "vo" in datasets and datasets["vo"].N > 0
            datasets["vo"].restrict(Nvo)
        else:
            datasets.pop("vo", None)
        if Nu > 0:
            assert "unsupervised" in datasets and datasets["unsupervised"].N > 0
            datasets["unsupervised"].restrict(Nu)
        else:
            # N_u == 0 disables the unsupervised term entirely (a leftover
            # partition chunk must not leak into the ELBO)
            datasets.pop("unsupervised", None)
            armortized_bs = None

        if Nvo > 0 and VO is None:
            from ..constraints import build_virtual_observables_ensemble
            VO = build_virtual_observables_ensemble(
                vo_spec, datasets["vo"], self.physics, dtype=self._dtype)
        self.VO = VO

        if armortized_bs is not None and self.encoder is None:
            raise RuntimeError("amortized batch size set but factory has no"
                               " encoder")
        if armortized_bs is None and Nu > 0:
            # non-amortized unsupervised path uses a per-datapoint q_z
            self.model = dataclasses.replace(self.model, encoder=None)
        self._armortized_bs = armortized_bs
        self.datasets = datasets

    # -------------------------------------------------------------- setup
    def setup(self, scheduler_spec: Optional[dict] = None, mesh=None):
        """Build params, optimisers, jitted step and analyses
        (reference: training.py:246-261).

        ``mesh``: optional ``jax.sharding.Mesh``; when given, dataset
        shards and per-datapoint parameter blocks are placed over the
        mesh's 'dp' axis (see parallel.mesh.shard_train_state) and the
        jitted step runs SPMD across devices with XLA-inserted
        collectives."""
        if self._config is None:
            raise RuntimeError("Config has not yet been setup")
        lr = self.get("lr_init")
        self._plateau = None
        if scheduler_spec and "patience" in scheduler_spec:
            # ReduceLROnPlateau (reference: lamp/optimization.py:30-37):
            # metric-driven, so the scale lives outside jit -- we inject
            # the learning rate as an optimizer hyperparameter and the
            # host adjusts it at monitor points.
            from .schedules import PlateauController

            self._plateau = PlateauController(
                patience=scheduler_spec["patience"],
                threshold=scheduler_spec.get("threshold", 1e-3),
                factor=scheduler_spec.get("factor", 0.1),
                min_lr=scheduler_spec.get("min_lr", 1e-3),
                mode=scheduler_spec.get("mode", "max"), lr_init=lr)
            self.optimizer = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr)
            self._schedule_fn = None  # lr comes from the plateau scale
        else:
            schedule = make_schedule(scheduler_spec, lr)
            self.optimizer = optax.adam(schedule)
            self._schedule_fn = schedule  # for lr monitoring in _record
        n_mc = self.get("N_monte_carlo_elbo")
        if n_mc != self.model.n_mc:
            self.model = dataclasses.replace(self.model, n_mc=n_mc)
        if mesh is not None and n_mc > 1 and "mc" in mesh.axis_names:
            # spread the flattened (N*n_mc) MC batch over dp AND mc axes
            from ..parallel.mesh import mc_batch_sharding
            self.model = dataclasses.replace(
                self.model, mc_sharding=mc_batch_sharding(mesh))

        # -- device-resident dataset shards --------------------------------
        dt = self._dtype
        ds = self.datasets
        data_sup = {
            "X": ds["supervised"].get("X"),
            "Y": ds["supervised"].get("Y"),
            "F_ROM_BC": ds["supervised"].get("F_ROM_BC"),
        }
        if data_sup["X"] is None:
            # N_s == 0 (zero-label regime): keep 0-row arrays of the right
            # trailing shape so the init/step signatures are unchanged; the
            # supervised ELBO term itself is disabled in
            # set_data_from_datasets
            data_sup = {k: jnp.zeros((0,) + ds["validation"].get(k).shape[1:],
                                     dtype=dt)
                        for k in ("X", "Y", "F_ROM_BC")}
        data_vo = None
        if self.VO is not None and "vo" in ds and ds["vo"].N > 0:
            data_vo = {
                "X": ds["vo"].get("X"),
                "F_ROM_BC": ds["vo"].get("F_ROM_BC"),
            }
        X_unsup = None
        if "unsupervised" in ds and ds["unsupervised"] is not None \
                and ds["unsupervised"].N > 0:
            X_unsup = ds["unsupervised"].get("X")
        self._mesh = mesh
        if mesh is not None:
            from ..parallel.mesh import shard_data_dict
            data_sup = shard_data_dict(data_sup, mesh)
            if data_vo is not None:
                data_vo = shard_data_dict(data_vo, mesh)
            if X_unsup is not None:
                X_unsup = shard_data_dict({"X": X_unsup}, mesh)["X"]
        self._data_sup, self._data_vo, self._X_unsup = (data_sup, data_vo,
                                                        X_unsup)

        # -- parameters -----------------------------------------------------
        init_sets = {"supervised": {"X": data_sup["X"]}}
        if X_unsup is not None:
            init_sets["unsupervised"] = {"X": X_unsup}
        if data_vo is not None:
            init_sets["vo"] = {"X": data_vo["X"]}
        key = jax.random.PRNGKey(self._seed)
        key, k_init = jax.random.split(key)
        params, batch_stats = self.model.init_params(
            k_init, init_sets, data_sup["X"].shape[1:])

        # -- prediction ensemble -------------------------------------------
        pe_spec = None if (scheduler_spec and "patience" in scheduler_spec) \
            else scheduler_spec
        # The PE inner Adam's update count advances N_PE_updates per
        # PE-ACTIVE step, i.e. N_PE_updates / N_PE_interval per training
        # iteration on average -- scale the milestone conversion by that,
        # so the PE lr decays at the documented training iterations
        # regardless of the gating cadence.  (Monitor bursts add
        # 8*N_PE_updates counts per monitor point, a few-% drift at the
        # default cadences; the burst re-converges q anyway.)
        pe_sched = make_schedule(
            pe_spec, lr,
            steps_per_update=(self.get("N_PE_updates")
                              / max(1, int(self.get("N_PE_interval") or 1))))
        X_val = ds["validation"].get("X")
        pe_dt = resolve_pe_compute_dtype(self.get("PE_compute_dtype"),
                                         X_val.shape)
        self._PE = PredictionEnsemble(
            model=self.model, X=X_val,
            optimizer=optax.adam(pe_sched), compute_dtype=pe_dt)
        self._pe_burst_update = None  # (re)built lazily against this _PE
        pe_q, pe_opt_state = self._PE.init(dtype=dt)

        self.state = TrainState(
            params=params, opt_state=self.optimizer.init(params),
            batch_stats=batch_stats, pe_q=pe_q, pe_opt_state=pe_opt_state,
            key=key, step=jnp.zeros((), dtype=jnp.int32))
        if mesh is not None:
            from ..parallel.mesh import shard_train_state
            self.state = shard_train_state(self.state, mesh)

        # -- analyses -------------------------------------------------------
        data_val = {
            "X": ds["validation"].get("X"),
            "Y": ds["validation"].get("Y"),
            "F_ROM_BC": ds["validation"].get("F_ROM_BC"),
        }
        self._data_val = data_val
        self._analysis = Analysis(model=self.model, data=data_val,
                                  label="validation", writer=self.writer)
        self._analysis_training = Analysis(model=self.model, data=data_sup,
                                           label="training",
                                           writer=self.writer)
        self._analysis_encoder = None
        self._encoder_q_fn = None
        if self.model.encoder is not None:
            self._analysis_encoder = Analysis(
                model=self.model, data=data_val, label="validation_encoder",
                writer=self.writer)
            X_val = data_val["X"]

            # X_val rides as an ARGUMENT, not a closure constant -- the
            # same no-constants rule as _build_train_step (at 512^2 the
            # validation images alone are ~34 MB of HLO payload)
            @jax.jit
            def encoder_q(params, batch_stats, X):
                (mean, logsigma), _ = self.model.apply_encoder(
                    params, batch_stats, X, train=False)
                return {"mean": mean, "logsigma": logsigma}

            self._encoder_q_fn = lambda p, bs: encoder_q(p, bs, X_val)
        self.writer.logging_interval = self.get(
            "N_tensorboard_logging_interval")

        self._train_step = self._build_train_step()
        self._vo_propagate = None
        if data_vo is not None:
            # data_vo as a runtime argument (no-closure-constants rule)
            vo_prop = jax.jit(partial(self.model.propagate_vo_moments,
                                      n_monte_carlo=self.get(
                                          "N_monte_carlo_vo")))
            self._vo_propagate = lambda params, key: vo_prop(
                params, data_vo, key=key)

    # ------------------------------------------------------- jitted step
    def _build_train_step(self):
        model = self.model
        optimizer = self.optimizer
        pe = self._PE
        armortized_bs = self._armortized_bs
        n_pe = self.get("N_PE_updates")
        n_pe_interval = int(self.get("N_PE_interval") or 1)
        normalize = self.get("normalize")
        l2_penalty = self.get("l2_penalty")
        if self.get("l1_penalty") is not None:
            # reference parity: setting l1_penalty raises there too
            # (bottleneck/generative.py:280-281)
            raise NotImplementedError(
                "l1_penalty is declared but not implemented (the "
                "reference raises NotImplementedError as well); use "
                "l2_penalty")
        amortized = model.encoder is not None

        # the dataset shards are passed as ARGUMENTS, never closed over:
        # closure constants get serialized into the HLO, which blows up
        # compile payloads at scale (a 256^2 run shipped 270MB of data to
        # the compiler before this).
        step_data = {"sup": self._data_sup}
        if self._X_unsup is not None:
            step_data["unsup"] = self._X_unsup
        if self._data_vo is not None:
            step_data["vo"] = self._data_vo
        self._step_data = step_data

        def step_body(state: TrainState, step_data, vo_mean, vo_logsigma,
                      holdoff: bool):
            key, k_batch, k_elbo, k_pe = jax.random.split(state.key, 4)

            data = {"supervised": step_data["sup"]}
            if "unsup" in step_data:
                X_unsup = step_data["unsup"]
                if amortized:
                    idx = minibatch_indices(k_batch, X_unsup.shape[0],
                                            armortized_bs)
                    data["unsupervised"] = {"X": X_unsup[idx]}
                else:
                    data["unsupervised"] = {"X": X_unsup}
            vo_state = None
            if "vo" in step_data:
                data["vo"] = step_data["vo"]
                vo_state = (vo_mean, vo_logsigma)

            def loss(p):
                elbo, bs, logs = model.elbo(
                    p, state.batch_stats, data, k_elbo, vo_state=vo_state,
                    vo_holdoff=holdoff, normalize=normalize,
                    l2_penalty=l2_penalty)
                return -elbo, (bs, logs)

            (neg_elbo, (batch_stats, logs)), grads = jax.value_and_grad(
                loss, has_aux=True)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)

            if n_pe_interval <= 1:
                pe_q, pe_opt_state, pe_elbo, pe_logL = pe.update(
                    params, batch_stats, state.pe_q, state.pe_opt_state,
                    k_pe, n_pe)
            else:
                # cadence-gated PE: q is consumed only at monitor points
                # (which re-converge it with a burst first), so skipped
                # steps carry q/opt unchanged and log NaN metrics -- the
                # monitor overwrites them with the post-burst values
                nanm = jnp.full((), jnp.nan, dtype=pe.X.dtype)
                pe_q, pe_opt_state, pe_elbo, pe_logL = jax.lax.cond(
                    state.step % n_pe_interval == 0,
                    lambda a: pe.update(*a, n_pe),
                    lambda a: (a[2], a[3], nanm, nanm),
                    (params, batch_stats, state.pe_q, state.pe_opt_state,
                     k_pe))
            logs = dict(logs)
            logs["PredictionEnsemble/elbo"] = pe_elbo
            logs["PredictionEnsemble/logL"] = pe_logL
            logs["PredictionEnsemble/KLD"] = pe_logL - pe_elbo
            logs["PredictionEnsemble/AvgLatentStddev"] = jnp.mean(
                jnp.exp(pe_q["logsigma"]))

            new_state = TrainState(
                params=params, opt_state=opt_state, batch_stats=batch_stats,
                pe_q=pe_q, pe_opt_state=pe_opt_state, key=key,
                step=state.step + 1)
            return new_state, logs

        @partial(jax.jit, static_argnames=("holdoff", "n_steps"),
                 donate_argnums=(0,))
        def train_step_n(state: TrainState, step_data, vo_mean, vo_logsigma,
                         *, holdoff: bool, n_steps: int = 1):
            """n_steps SVI iterations fused into one dispatch (lax.scan):
            amortises host->device launch latency, critical on remote TPU
            runtimes.  Returns the LAST step's logs."""
            if n_steps == 1:
                return step_body(state, step_data, vo_mean, vo_logsigma,
                                 holdoff)

            def scan_body(st, _):
                st, _logs = step_body(st, step_data, vo_mean, vo_logsigma,
                                      holdoff)
                return st, None

            # run n-1 logless steps, then one with logs
            state, _ = jax.lax.scan(scan_body, state, None, length=n_steps - 1)
            return step_body(state, step_data, vo_mean, vo_logsigma, holdoff)

        def run_step(state, vo_mean, vo_logsigma, *, holdoff, n_steps=1):
            return train_step_n(state, self._step_data, vo_mean, vo_logsigma,
                                holdoff=holdoff, n_steps=n_steps)

        run_step.jitted = train_step_n  # for AOT lowering / cost analysis
        return run_step

    # ---------------------------------------------------------------- VO
    def use_vo(self) -> bool:
        return self.VO is not None and self._data_vo is not None

    def update_vo(self) -> bool:
        """Cadence gate (reference: training.py:383-389)."""
        if not self.use_vo():
            return False
        return (self.gn >= self.get("N_vo_holdoff")
                and (self.gn % self.get("N_vo_update_interval") == 0
                     or not self._vo_is_initialized))

    def update_virtual_observables(self, step: int, resample: bool = True):
        """MC-propagate q through gp o g, then condition the VO posterior
        (reference: generative.py:182-222 + VO.update)."""
        key = jax.random.fold_in(jax.random.PRNGKey(self._seed + 7919), step)
        k1, k2 = jax.random.split(key)
        Y_mean, Y_std = self._vo_propagate(self.state.params, key=k1)
        if resample:
            self.VO.resample(k2)
        self.VO.update(Y_mean, 1.0 / (Y_std ** 2), step, writer=self.writer)
        self._vo_state = (self.VO.mean, self.VO.logsigma)
        self._vo_is_initialized = True

    # ---------------------------------------------------------------- run
    def run(self, N: int, verbose: bool = True, callback=None,
            profile_dir: Optional[str] = None):
        """The SVI loop (reference: training.py:393-462).

        ``profile_dir``: capture an XLA/TPU profiler trace of the run
        (beyond the reference, which only has wall-clock timers --
        SURVEY §5); view with tensorboard or xprof.
        """
        if self._finalized:
            raise RuntimeError("Cannot run trainer which has already been"
                               " finalized")
        if profile_dir is not None:
            jax.profiler.start_trace(profile_dir)
        t_start = time.time()
        try:
            self._run_loop(N, verbose, callback)
        finally:
            # accrue runtime and finalize any active profiler trace even
            # when the loop raises (divergence guard, interrupt): a leaked
            # trace blocks every subsequent profiled run
            self._global_runtime += time.time() - t_start
            if profile_dir is not None:
                jax.profiler.stop_trace()

    def _run_loop(self, N: int, verbose: bool, callback):
        dummy_vo = (jnp.zeros((1, 1), dtype=self._dtype),) * 2
        last_elbo = None
        mi = self.get("N_monitor_interval")
        vo_int = self.get("N_vo_update_interval")
        vo_hold = self.get("N_vo_holdoff")

        n = 0
        while n < N:
            if self.update_vo():
                self.update_virtual_observables(self.gn)

            # holdoff only matters when a VO term exists; keep it False
            # otherwise so non-VO runs compile ONE step executable
            # instead of a holdoff=True/False pair per bucket
            holdoff = self.use_vo() and self.gn < vo_hold
            vo_mean, vo_logsigma = (self._vo_state if self._vo_state
                                    is not None else dummy_vo)

            # chunk size: fuse steps up to the next cadence event
            # (monitor point, VO refresh, holdoff boundary, end of run)
            chunk = N - n
            if callback is not None:
                chunk = 1
            if mi > 0:
                # monitoring fires after executing iteration k with k % mi
                # == 0 (k > 0): chunk must END exactly there
                next_mon = n if (n % mi == 0 and n > 0) else ((n // mi) + 1) * mi
                chunk = min(chunk, next_mon - n + 1)
            if self.use_vo():
                next_vo = ((self.gn // vo_int) + 1) * vo_int
                chunk = min(chunk, max(1, next_vo - self.gn))
                if holdoff:
                    chunk = min(chunk, max(1, vo_hold - self.gn))
            chunk = max(1, min(chunk, N - n))
            # bucket to limit distinct compiled scan lengths
            chunk = max(c for c in _SCAN_BUCKETS if c <= chunk)

            self.state, logs = self._train_step(
                self.state, vo_mean, vo_logsigma,
                holdoff=bool(holdoff or (self.use_vo()
                                         and not self._vo_is_initialized)),
                n_steps=int(chunk))
            last_elbo = logs["elbo"]
            n_last = n + chunk - 1
            n += chunk
            self._global_iteration_counter += chunk

            if mi > 0 and n_last % mi == 0 and n_last > 0:
                if (not np.isfinite(float(last_elbo))
                        and self.get("halt_on_divergence")):
                    raise TrainingDivergedError(
                        f"non-finite ELBO at iteration {n_last} -- training "
                        "diverged (set trainer config halt_on_divergence="
                        "False to keep stepping anyway)")
                if self._plateau is not None:
                    # rebuild the opt state functionally: the state pytree
                    # is donated to the jitted step, so in-place mutation
                    # of .hyperparams would alias donated buffers
                    scale = self._plateau.step(float(last_elbo))
                    hp = dict(self.state.opt_state.hyperparams)
                    hp["learning_rate"] = jnp.asarray(
                        self._plateau.lr_init * scale,
                        dtype=hp["learning_rate"].dtype)
                    self.state = self.state.replace(
                        opt_state=self.state.opt_state._replace(
                            hyperparams=hp))
                logs = self._pe_monitor_burst(logs)
                self._record(n_last, logs)
                if verbose:
                    print(f"Step: {n_last} / {N} || "
                          f"ELBO= {float(last_elbo):.4g} || LogScore(y): "
                          f"{self._analysis.series['logscore_y'].final():.4g}")
            if callback is not None:
                callback(n_last, self.gn)

        # final PE refinement + eval (reference: training.py:457-460),
        # fused into ONE jitted call (an eager per-call loop pays remote
        # dispatch latency 250 times over)
        n_final = self.get("N_PE_updates_final") * self.get("N_PE_updates")
        if n_final > 0:
            pe_update = jax.jit(self._PE.update,
                                static_argnames=("num_iter", "final"))
            key = jax.random.fold_in(jax.random.PRNGKey(self._seed + 13),
                                     self.gn)
            # final=True: full-precision refinement regardless of the
            # hot loop's PE_compute_dtype, so final metrics see an f32 q
            pe_q, pe_opt_state, _, _ = pe_update(
                self.state.params, self.state.batch_stats, self.state.pe_q,
                self.state.pe_opt_state, key, num_iter=n_final, final=True)
            self.state = self.state.replace(pe_q=pe_q,
                                            pe_opt_state=pe_opt_state)
        self._analysis.eval_all_y(
            self.state.params, self.state.pe_q,
            jax.random.PRNGKey(self._seed + 17),
            self.get("N_monte_carlo_analysis_final"),
            iteration=self.gn + self.get("N_PE_updates_final"))

    # ---------------------------------------------------------- monitoring
    def _pe_monitor_burst(self, logs: dict) -> dict:
        """With N_PE_interval > 1, re-converge the PE posterior to the
        CURRENT params before the monitor analysis (the hot loop only
        updates it every k-th step) and substitute the post-burst PE
        metrics for the step's (possibly NaN-skipped) ones."""
        if int(self.get("N_PE_interval") or 1) <= 1:
            return logs
        n_burst = self.get("N_PE_updates_monitor")
        if n_burst is None:
            n_burst = 8 * self.get("N_PE_updates")
        if n_burst <= 0:
            # no burst to refresh them: drop cadence-skipped NaN PE
            # metrics rather than writing bare NaN tokens (invalid
            # strict JSON) into metrics.jsonl
            import math
            return {k: v for k, v in logs.items()
                    if not (k.startswith("PredictionEnsemble")
                            and not math.isfinite(float(v)))}
        if getattr(self, "_pe_burst_update", None) is None:
            self._pe_burst_update = jax.jit(
                self._PE.update, static_argnames=("num_iter", "final"))
        key = jax.random.fold_in(jax.random.PRNGKey(self._seed + 37), self.gn)
        pe_q, pe_opt_state, pe_elbo, pe_logL = self._pe_burst_update(
            self.state.params, self.state.batch_stats, self.state.pe_q,
            self.state.pe_opt_state, key, num_iter=int(n_burst))
        self.state = self.state.replace(pe_q=pe_q, pe_opt_state=pe_opt_state)
        logs = dict(logs)
        logs["PredictionEnsemble/elbo"] = pe_elbo
        logs["PredictionEnsemble/logL"] = pe_logL
        logs["PredictionEnsemble/KLD"] = pe_logL - pe_elbo
        logs["PredictionEnsemble/AvgLatentStddev"] = _jit_mean_exp(
            pe_q["logsigma"])
        return logs

    def _record(self, n: int, logs: dict):
        gn = self.gn
        self.writer.add_scalars({k: v for k, v in logs.items()}, gn,
                                prefix="objective/")
        # model.record equivalents (reference: generative.py:112-119)
        if self.model.independent_X and "supervised" in \
                self.state.params["q_X"] \
                and self.state.params["q_X"]["supervised"]["mean"].size:
            qX = self.state.params["q_X"]["supervised"]
            self.writer.add_scalar("Monitoring/logEffProp_sup_mean",
                                   _jit_mean(qX["mean"]), gn)
            self.writer.add_scalar("Monitoring/logEffProp_sup_sigma",
                                   _jit_mean(qX["logsigma"]), gn)
        self.writer.add_scalar(
            "Monitoring/S_avg_precisions",
            _jit_avg_precision(self.state.params["g"]["logsigmas_y"]),
            gn)

        self._monitor["elbo_iter"].append(gn)
        self._monitor["elbo"].append(float(logs["elbo"]))
        # lr series (reference: training.py:426) -- plateau scale or the
        # static schedule evaluated at the current step
        lr_now = (self._plateau.lr_init * self._plateau.scale
                  if self._plateau is not None
                  else float(self._schedule_fn(gn))
                  if getattr(self, "_schedule_fn", None) is not None
                  else None)
        if lr_now is not None:
            self._monitor["lr"].append(float(lr_now))
            self._monitor["lr_iter"].append(gn)
            self.writer.add_scalar("Monitoring/lr", float(lr_now), gn)

        key = jax.random.fold_in(jax.random.PRNGKey(self._seed + 23), gn)
        self._analysis.eval_all_y(self.state.params, self.state.pe_q, key,
                                  self.get("N_monte_carlo_analysis"),
                                  iteration=gn)
        if self.get("MonitorTraining") and self._data_sup["X"].shape[0] > 0:
            q_sup = self.state.params["q_z"]["supervised"]
            self._analysis_training.eval_all_y(
                self.state.params, q_sup, key,
                self.get("N_monte_carlo_analysis"), iteration=gn)
            if self._analysis_encoder is not None:
                q_enc = self._encoder_q_fn(self.state.params,
                                           self.state.batch_stats)
                # _final MC count here is intentional: the reference uses
                # it at this exact monitor site (training.py:439)
                logscore, r2, relerr = self._analysis_encoder.eval_all_y(
                    self.state.params, q_enc, key,
                    self.get("N_monte_carlo_analysis_final"))
                self.writer.add_scalar("validation_encoder/logscore_y",
                                       logscore, gn)
                self.writer.add_scalar("validation_encoder/r2_y", r2, gn)
                self.writer.add_scalar("validation_encoder/relerr_y", relerr,
                                       gn)

    def results(self, analysis: Optional[Analysis] = None) -> dict:
        """(reference: training.py:364-378)"""
        analysis = analysis or self._analysis
        out = {k: analysis.series[k].final()
               for k in ("relerr_y", "r2_y", "logscore_y")}
        out["runtime"] = self._global_runtime
        return out

    def finalize(self):
        """(reference: training.py:464-480)"""
        # results() reads the FINAL value of each analysis series; a run
        # halted before the first analysis pass has empty series
        # (DataSeries.final -> IndexError).  Only that specific case is
        # tolerated -- and loudly -- so a genuinely missing metric is not
        # silently eaten at the end of a long run.
        try:
            results = self.results()
        except IndexError:
            warnings.warn(
                "Trainer.finalize: analysis series are empty (run ended "
                "before the first analysis pass); skipping hparams summary.",
                RuntimeWarning)
        else:
            self.writer.add_hparams({"dummy": 0}, results)
        self.writer.flush()
        self.writer.close()
        self._finalized = True

    # ------------------------------------------------- checkpoint / resume
    def save_checkpoint(self, path: str) -> str:
        """Persist the full training state (exceeds the reference, which
        cannot resume Trainer.run -- SURVEY §5).

        The VO posterior (``_vo_state``) is deliberately NOT persisted:
        it is model-derived state, and ``update_vo`` reconditions it at
        the first post-resume step (``_vo_is_initialized`` is False), so
        a resumed VO run self-heals; the Gamma-hyperprior precision is
        recomputed from residuals at every update (stateless), and the
        energy-VO temperature is a pure function of the restored step
        counter.  Tested: test_trainer_vo_checkpoint_resume."""
        from .checkpoint import save_train_state
        meta = {"state": self.state,
                "gn": self._global_iteration_counter,
                "runtime": self._global_runtime}
        if self._plateau is not None:
            meta["plateau"] = self._plateau.state_dict()
        return save_train_state(path, meta)

    def export_surrogate(self, path: Optional[str] = None, *,
                         buckets=None, platforms=None):
        """AOT-export the trained discriminative surrogate as a serving
        bundle (``serving.SurrogateBundle``): one StableHLO executable
        per static batch bucket, current params baked in.  Writes
        ``path`` (zip) if given; returns the bundle.

        The deployable the reference extracts by pickling the torch
        module (generative.py:605-644) becomes a versioned, code-free
        artifact here.
        """
        from ..serving import DEFAULT_BUCKETS, SurrogateBundle
        if self.state is None:
            raise RuntimeError("call setup()/run() before exporting")
        img = self.physics["fom"].grid.nx
        bundle = SurrogateBundle.build(
            self.discriminative_model, self.state.params,
            self.state.batch_stats, (img, img),
            self.physics["rom"].grid.n_nodes,
            buckets=DEFAULT_BUCKETS if buckets is None else buckets,
            dtype=self._dtype, platforms=platforms)
        if path is not None:
            bundle.save(path)
        return bundle

    def restore_checkpoint(self, path: str):
        from .checkpoint import restore_train_state
        like = {"state": self.state, "gn": 0, "runtime": 0.0}
        if self._plateau is not None:
            like["plateau"] = self._plateau.state_dict()
        try:
            meta = restore_train_state(path, like=like)
        except Exception:
            if "plateau" not in like:
                raise
            # older checkpoint written before plateau state was persisted
            like.pop("plateau")
            meta = restore_train_state(path, like=like)
        state = meta["state"]
        if not isinstance(state, TrainState):
            state = TrainState(**state)
        if self._mesh is not None:
            # re-shard the restored host arrays onto the live mesh (the
            # checkpoint stores full global values on every process;
            # device_put with a NamedSharding re-splits them, across
            # processes too)
            from ..parallel.mesh import shard_train_state
            state = shard_train_state(state, self._mesh)
        else:
            state = jax.tree_util.tree_map(jnp.asarray, state)
        self.state = state
        if self._plateau is not None and meta.get("plateau") is not None:
            self._plateau.load_state_dict(meta["plateau"])
        self._global_iteration_counter = int(meta["gn"])
        self._global_runtime = float(meta["runtime"])

    def info(self):  # pragma: no cover
        ds = self.datasets or {}
        print("============ MODEL INFO ==============")
        for name in ("unsupervised", "supervised", "vo", "validation"):
            n = ds[name].N if name in ds and ds[name] else 0
            print(f"N_{name}: {n}")
        print(f"Armortization: {self.model.encoder is not None}")
        print(f"Dtype: {self._dtype}")
        print("========================================")


# ---------------------------------------------------------------------------
# Glue functions (reference: training.py:592-663)
# ---------------------------------------------------------------------------

def CreateTrainer(params: TrainerParameters, dl, dlu) -> Trainer:
    return CreateTrainerFromPermutation(
        params, permutation=np.arange(dl.N), permutation_u=np.arange(dlu.N),
        dl=dl, dlu=dlu)


def CreateTrainerFromPermutation(params: TrainerParameters, permutation=None,
                                 permutation_u=None, dl=None, dlu=None,
                                 datasets=None, BCE_encoding=None) -> Trainer:
    if params.optimizer:
        # the reference defines this tier but never consumes it either
        # (training.py:29 is its only appearance); Adam hyperparameters
        # beyond the lr/schedule are not configurable -- warn rather than
        # let an experiment silently record settings that were not applied
        warnings.warn(
            "TrainerParameters.optimizer is accepted for reference parity "
            "but has no effect; the optimizer is Adam(lr/schedule)",
            stacklevel=2)
    trainer = Trainer.FromIdentifier(
        params.identifier, params.margs, params.dargs, folder=params.folder,
        comment=params.comment, debug=params.debug, seed=params.seed)

    BCE = None
    if BCE_encoding is not None:
        from ..fem.bc import BoundaryConditionEnsemble
        family = trainer.physics["fom"].physics_id
        BCE = BoundaryConditionEnsemble.from_encoding(family, BCE_encoding)
        BCE.register_function_space("fom", trainer.physics["fom"].grid)
        BCE.register_function_space("rom", trainer.physics["rom"].grid)

    if datasets is None:
        dl, dlu, datasets = CreateDataSetsFromPermutation(
            params.identifier, permutation, permutation_u,
            params.data["N_val"], params.data["N_u_max"],
            params.data["N_s_max"], params.data["N_vo_max"], trainer.physics,
            BCE, trainer.dtype, dl=dl, dlu=dlu)

    trainer.set_data_from_datasets(
        dl, dlu, datasets, params.data["N_u"], params.data["N_s"],
        params.data["N_vo"], VO=None, vo_spec=params.data["vo_spec"],
        armortized_bs=params.data["armortized_bs"])
    trainer.setup_config(**params.trainer)
    trainer.setup(scheduler_spec=params.scheduler or None)
    return trainer


def CreateDataSetsFromPermutation(identifier, permutation, permutation_u,
                                  N_val, N_u_max, N_s_max, N_vo_max, physics,
                                  BCE, dtype, dl=None, dlu=None):
    """(reference: training.py:635-663)"""
    if dl is None or dlu is None:
        df = DataFactory.FromIdentifier(identifier)
        dl, dlu = df.setup()
    if dl._Y is None:  # skip when labels were already assembled
        dl.assemble(physics, BCE=BCE)

    # None is a documented default: randomized_partition draws a fresh
    # permutation itself (loader.py:253-255) -- only validate lengths for
    # USER-supplied permutations
    if permutation is not None and len(dl) != len(permutation):
        raise ValueError(f"permutation has {len(permutation)} entries for "
                         f"{len(dl)} supervised fields")
    if permutation_u is not None and len(dlu) != len(permutation_u):
        raise ValueError(f"permutation_u has {len(permutation_u)} entries "
                         f"for {len(dlu)} unsupervised fields")

    partition = {"supervised": N_s_max}
    if N_vo_max > 0:
        partition["vo"] = N_vo_max
    partition["validation"] = N_val
    dl.randomized_partition(partition, identifier="default",
                            permutation=permutation)
    datasets = dl.construct_dataset_dictionary(identifier="default",
                                               dtype=dtype)

    if N_u_max > 0:
        dlu.randomized_partition({"unsupervised": N_u_max},
                                 identifier="default",
                                 permutation=permutation_u)
        datasets_aux = dlu.construct_dataset_dictionary(identifier="default",
                                                        dtype=dtype)
        datasets["unsupervised"] = datasets_aux["unsupervised"]

    return dl, dlu, datasets
