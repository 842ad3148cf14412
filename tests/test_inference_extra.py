"""Discriminative model, encoder-based analysis, eval_all, energy-VO
trainer path, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from generative_physics_informed_pde_tpu import fem
from generative_physics_informed_pde_tpu.models import (
    CNNDecoder, CNNEncoder, EffectivePropertyMap, ReducedOrderModelOperator,
    GenerativeModel, DiscriminativeModel)
from generative_physics_informed_pde_tpu.inference import Analysis
from generative_physics_informed_pde_tpu.data import DataLoader
from generative_physics_informed_pde_tpu.training import (
    TrainerParameters, CreateTrainerFromPermutation)


@pytest.fixture(scope="module")
def small_model():
    physics = fem.make_fom_rom_pair("NDP", 4, 4, 3)
    g = ReducedOrderModelOperator.from_physics(physics)
    dec = CNNDecoder(target_img_size=32, dim_latent=8, latent_img_size=8,
                     latent_img_features=1, init_features=4, blocks=(1, 1),
                     growth_rate=4)
    enc = CNNEncoder(imsize=32, latent_dim=8, blocks=(1, 1), growth_rate=4,
                     init_features=4)
    gp = EffectivePropertyMap(latent_dim=8,
                              dim_effective_property=g.dim_effective_property)
    model = GenerativeModel(f=dec, g=g, gp=gp, encoder=enc,
                            dtype=jnp.float32)
    rng = np.random.default_rng(0)
    Ns = 4
    X = jnp.asarray(rng.normal(0.4, 0.8, (Ns, 32, 32)), dtype=jnp.float32)
    Y = jnp.asarray(rng.normal(size=(Ns, physics["fom"].dim_out)),
                    dtype=jnp.float32)
    F = jnp.zeros((Ns, physics["rom"].grid.n_nodes), dtype=jnp.float32)
    data = {"supervised": {"X": X, "Y": Y, "F_ROM_BC": F}}
    params, bs = model.init_params(jax.random.PRNGKey(0), data, (32, 32))
    return physics, model, params, bs, data


def test_discriminative_model(small_model):
    physics, model, params, bs, data = small_model
    dm = DiscriminativeModel(model)
    X, F = data["supervised"]["X"], data["supervised"]["F_ROM_BC"]
    y = dm(params, bs, X, F)
    assert y.shape == (X.shape[0], physics["fom"].dim_out)
    assert bool(jnp.all(jnp.isfinite(y)))
    # FromLatentEncoding path: pass latents directly
    z = jnp.zeros((2, model.dim_latent))
    y2 = dm(params, bs, z, F[:2], use_encoder=False)
    assert y2.shape == (2, physics["fom"].dim_out)


def test_analysis_from_encoder_and_eval_all(small_model):
    physics, model, params, bs, data = small_model
    d = dict(data["supervised"])
    analysis, q = Analysis.from_encoder(model, params, bs, d)
    assert q["mean"].shape == (4, model.dim_latent)
    logscore, r2, relerr = analysis.eval_all_y(params, q,
                                               jax.random.PRNGKey(0), 8)
    assert np.isfinite(logscore) and np.isfinite(relerr)
    out = analysis.eval_all(params, bs, q, jax.random.PRNGKey(1), 8,
                            iteration=5)
    assert np.isfinite(out["relerr_x"]) and np.isfinite(out["logscore_x"])
    assert analysis.series["relerr_x"].final() == out["relerr_x"]
    assert analysis.series["relerr_y"].iteration[-1] == 5
    # iteration=None has no series to record into, so the y scalars must
    # come back in the dict (round-5 review: they were computed and
    # silently dropped)
    out_n = analysis.eval_all(params, bs, q, jax.random.PRNGKey(1), 8,
                              iteration=None)
    for k in ("relerr_x", "logscore_x", "relerr_y", "r2_y", "logscore_y"):
        assert k in out_n and np.isfinite(out_n[k]), k


def test_analysis_chunked_eval_matches_oneshot(small_model, monkeypatch):
    """The streamed-moment MC-chunked eval (large grids) must agree with
    the one-shot eval to within MC noise at a large sample count, and
    must actually take the chunked path under a tiny element budget."""
    from generative_physics_informed_pde_tpu.inference import analysis as an
    physics, model, params, bs, data = small_model
    d = dict(data["supervised"])
    analysis, q = Analysis.from_encoder(model, params, bs, d)
    S = 512
    one_y = analysis.eval_all_y(params, q, jax.random.PRNGKey(2), S)
    one_x = analysis.eval_all(params, bs, q, jax.random.PRNGKey(3), S)

    # force chunking: budget admits only a handful of MC samples at once
    per_mc = d["Y"].shape[0] * d["Y"].shape[-1]
    monkeypatch.setattr(an, "_EVAL_ELEMENT_BUDGET", per_mc * 64)
    assert an._mc_chunk(S, per_mc)[1] > 1  # chunked path engaged
    analysis2 = Analysis(model=model, data=d)
    chk_y = analysis2.eval_all_y(params, q, jax.random.PRNGKey(2), S)
    chk_x = analysis2.eval_all(params, bs, q, jax.random.PRNGKey(3), S)

    for a, b in zip(one_y, chk_y):  # (logscore, r2, relerr)
        assert np.isfinite(b)
        assert abs(a - b) < 0.15 * max(1.0, abs(a))
    for k in ("relerr_x", "logscore_x"):
        assert np.isfinite(chk_x[k])
        assert abs(one_x[k] - chk_x[k]) < 0.15 * max(1.0, abs(one_x[k]))


@pytest.mark.slow
def test_trainer_energy_vo():
    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    dl = DataLoader.from_sampler(rf, 20, key=jax.random.PRNGKey(0))
    dlu = DataLoader.from_sampler(rf, 8, key=jax.random.PRNGKey(1))
    dlu.lock_physics_assembly()
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True
    p.trainer["lr_init"] = 1e-2
    p.trainer["N_vo_holdoff"] = 2
    p.trainer["N_vo_update_interval"] = 4
    p.scheduler = {"milestones": [10], "factor": 0.5}
    p.data.update(N_u=8, N_s=8, N_u_max=8, N_s_max=8, N_vo_max=4, N_vo=4,
                  N_val=4, armortized_bs=4,
                  vo_spec={"type": "energy", "l_rbf": 0.25, "N_rbf": 6,
                           "energy_num_iterations_per_update": 3,
                           "T_init": 1.0, "T_final": 0.01,
                           "T_iterations": 1000})
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    tr.run(8, verbose=False)
    assert tr._vo_is_initialized
    assert bool(jnp.all(jnp.isfinite(tr.VO.mean)))
    assert tr.VO.temperature < 1.0  # schedule advanced


@pytest.mark.slow
def test_trainer_checkpoint_roundtrip(tmp_path):
    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    dl = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(0))
    dlu = DataLoader.from_sampler(rf, 8, key=jax.random.PRNGKey(1))
    dlu.lock_physics_assembly()
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True
    p.trainer["lr_init"] = 1e-2
    p.scheduler = {"milestones": [50], "factor": 0.5}
    p.data.update(N_u=8, N_s=8, N_u_max=8, N_s_max=8, N_vo_max=0, N_vo=0,
                  N_val=4, armortized_bs=4, vo_spec={})
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    tr.run(4, verbose=False)
    ck = str(tmp_path / "ckpt")
    tr.save_checkpoint(ck)
    ref = np.asarray(tr.state.params["q_z"]["supervised"]["mean"]).copy()
    tr.state = tr.state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, tr.state.params))
    tr.restore_checkpoint(ck)
    np.testing.assert_allclose(
        np.asarray(tr.state.params["q_z"]["supervised"]["mean"]), ref)
    assert tr.gn == 4
    tr.run(2, verbose=False)  # resumes cleanly
    assert tr.gn == 6

    # determinism: interrupt-and-resume (4+2) must equal an uninterrupted
    # 6-step run -- the property users actually rely on.  (The PRNG key,
    # optimizer moments and step counter all live in the checkpoint.)
    dl2 = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(0))
    dlu2 = DataLoader.from_sampler(rf, 8, key=jax.random.PRNGKey(1))
    dlu2.lock_physics_assembly()
    tr2 = CreateTrainerFromPermutation(p, permutation=np.arange(dl2.N),
                                       permutation_u=np.arange(dlu2.N),
                                       dl=dl2, dlu=dlu2)
    tr2.run(6, verbose=False)
    resumed = tr.state.params
    straight = tr2.state.params
    flat_a, tree_a = jax.tree_util.tree_flatten(resumed)
    flat_b, tree_b = jax.tree_util.tree_flatten(straight)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_plateau_state_checkpoint_roundtrip(tmp_path):
    """A resumed plateau run must keep the decayed LR: the controller's
    scale/best/bad_steps ride in the checkpoint, so the first post-resume
    monitor point cannot snap the LR back to lr_init."""
    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True   # monitor every 5 steps
    p.trainer["lr_init"] = 1e-2
    p.scheduler = {"patience": 0, "factor": 0.5, "min_lr": 1e-4,
                   "threshold": 1e12}  # always decay
    p.data.update(N_u=8, N_s=8, N_u_max=8, N_s_max=8, N_vo_max=0, N_vo=0,
                  N_val=4, armortized_bs=4, vo_spec={})

    def make():
        dl = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(0))
        dlu = DataLoader.from_sampler(rf, 8, key=jax.random.PRNGKey(1))
        dlu.lock_physics_assembly()
        return CreateTrainerFromPermutation(
            p, permutation=np.arange(16), permutation_u=np.arange(8),
            dl=dl, dlu=dlu)

    tr = make()
    # monitor points fire after local iterations mi+1, 2mi+1 (reference
    # loop-index semantics); 12 steps -> two plateau.step calls -> decay
    tr.run(12, verbose=False)
    scale = tr._plateau.scale
    assert scale < 1.0  # decayed at least once
    ck = str(tmp_path / "ckpt")
    tr.save_checkpoint(ck)

    tr2 = make()
    tr2.restore_checkpoint(ck)
    assert tr2._plateau.scale == scale
    assert tr2._plateau.best == tr._plateau.best
    assert tr2._plateau.bad_steps == tr._plateau.bad_steps
    # the restored opt-state LR survives the next monitor point
    tr2.run(5, verbose=False)
    lr_now = float(tr2.state.opt_state.hyperparams["learning_rate"])
    assert lr_now <= 1e-2 * scale + 1e-12


@pytest.mark.slow
def test_trainer_plateau_scheduler():
    rf = fem.GaussianRandomField.from_image(32, 32, 0.4, 0.8, 0.15)
    dl = DataLoader.from_sampler(rf, 16, key=jax.random.PRNGKey(0))
    dlu = DataLoader.from_sampler(rf, 8, key=jax.random.PRNGKey(1))
    dlu.lock_physics_assembly()
    p = TrainerParameters()
    p.identifier = "highres32"
    p.debug = True   # monitor every 5 steps
    p.trainer["lr_init"] = 1e-2
    p.scheduler = {"patience": 0, "factor": 0.5, "min_lr": 1e-4,
                   "threshold": 1e12}  # impossible threshold -> always decay
    p.data.update(N_u=8, N_s=8, N_u_max=8, N_s_max=8, N_vo_max=0, N_vo=0,
                  N_val=4, armortized_bs=4, vo_spec={})
    tr = CreateTrainerFromPermutation(p, permutation=np.arange(dl.N),
                                      permutation_u=np.arange(dlu.N),
                                      dl=dl, dlu=dlu)
    assert tr._plateau is not None
    tr.run(12, verbose=False)
    lr_now = float(tr.state.opt_state.hyperparams["learning_rate"])
    assert lr_now < 1e-2  # decayed at least once
    assert lr_now >= 1e-4 - 1e-12
