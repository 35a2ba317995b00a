"""End-to-end trainer tests on the synthetic sequence (CPU, tiny shapes)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_sequence, tiny_lss_cfg
from monoforce_tpu.config import LSSConfig, PhysicsConfig
from monoforce_tpu.datasets import ROUGH
from monoforce_tpu.training import Trainer, avg_pool_grid
from monoforce_tpu.utils import NumpyLoader


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    seq = make_sequence(str(root), n_frames=4)
    lss_dict = tiny_lss_cfg()
    dphys = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=1.0)
    ds = ROUGH(seq, lss_cfg=lss_dict, dphys_cfg=dphys)
    loader = NumpyLoader(ds, batch_size=2, drop_last=True)
    lss_cfg = LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
                        grid_conf=lss_dict["grid_conf"],
                        soft_classes=lss_dict["soft_classes"])
    log_dir = str(tmp_path_factory.mktemp("run"))
    trainer = Trainer(dphys_cfg=dphys, lss_cfg=lss_cfg, lr=1e-3,
                      log_dir=log_dir)
    batch = next(iter(loader))
    trainer.init_state(tuple(jnp.asarray(b) for b in batch))
    return trainer, loader, batch, log_dir


@pytest.mark.smoke
def test_make_optimizer_zeroes_nan_gradients():
    """The production chain (make_optimizer: zero_non_finite -> clip ->
    Adam) must turn a NaN/inf gradient into a skipped contribution, never
    NaN params.

    This is the exact failure observed with plain ``optax.adam`` on the
    full-B0 sharded artifact (scripts/full_b0_sharded.py): the stiff-contact
    BPTT emitted a NaN cotangent, Adam wrote it into the params, and the
    NEXT forward pass was NaN — finite loss at step k, NaN at step k+1.
    The reference crashes on this (its NaN handling is an emergency
    checkpoint + abort, train.py); the guard is our documented improvement
    (trainer.py make_optimizer docstring).  The inf leg matters separately:
    ``optax.zero_nans`` would pass inf to clip_by_global_norm, where
    inf * (1/inf) = NaN re-enters downstream of the guard.
    """
    from monoforce_tpu.training.trainer import make_optimizer

    params = {"a": jnp.ones((3,)), "b": jnp.full((2,), 2.0)}
    grads = {"a": jnp.array([jnp.nan, jnp.inf, 1.0]),
             "b": jnp.array([0.5, -0.5])}
    tx = make_optimizer(lr=1e-2)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    import optax
    new_params = optax.apply_updates(params, updates)
    for leaf in jax.tree.leaves(new_params):
        assert np.isfinite(np.asarray(leaf)).all()
    # the clean gradient leaf still learns (weight decay alone is ~1e-7*2,
    # far below the ~1e-2 Adam step)
    assert not np.allclose(np.asarray(new_params["b"]),
                           np.asarray(params["b"]), atol=1e-4)


def test_avg_pool_grid():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    y = avg_pool_grid(x, 2)
    assert y.shape == (1, 1, 2, 2)
    np.testing.assert_allclose(np.asarray(y)[0, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_train_step_runs_and_logs(setup):
    trainer, loader, batch, log_dir = setup
    losses, _ = trainer.epoch(loader, train=True)
    for k in ("geom", "terrain", "phys", "total"):
        assert np.isfinite(losses[k]), k
    assert losses["phys"] >= 0
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))


def test_eval_step_and_loss_stays_finite(setup):
    """Repeated steps on one batch stay finite (the stiff-contact BPTT used
    to overflow f32 without the identity-clip carry) and make progress in
    train mode."""
    trainer, loader, batch, _ = setup
    jb = tuple(jnp.asarray(b) for b in batch)
    rng = jax.random.PRNGKey(1)
    totals = []
    for i in range(6):
        rng, sub = jax.random.split(rng)
        trainer.state, aux = trainer.train_step(trainer.state, jb, sub)
        totals.append(float(aux["total"]))
    assert np.isfinite(totals).all(), totals
    # the purpose is stability, not monotone descent (shared-module state
    # means earlier tests may already have trained close to a local min):
    # losses must not blow up across repeated steps
    assert min(totals[1:]) < totals[0] * 2.0, totals
    ev = trainer.eval_step(trainer.state, jb)
    assert np.isfinite(float(ev["total"]))


def test_checkpoint_roundtrip_and_partial_load(setup, tmp_path):
    trainer, loader, batch, log_dir = setup
    trainer.save_checkpoint("ck")
    params_before = jax.tree.leaves(trainer.state.params)
    # load into freshly initialized params -> identical to saved
    fresh = trainer.model.init(
        jax.random.PRNGKey(7), *[jnp.asarray(b) for b in batch[:6]])
    params, stats = trainer.load_pretrained(
        os.path.join(log_dir, "ck"), fresh["params"], fresh["batch_stats"])
    for a, b in zip(jax.tree.leaves(params), params_before):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_full_checkpoint_resume(setup):
    trainer, loader, batch, log_dir = setup
    jb = tuple(jnp.asarray(b) for b in batch)
    trainer.state, _ = trainer.train_step(trainer.state, jb,
                                          jax.random.PRNGKey(9))
    trainer.save_checkpoint("full_ck", full=True)
    step_before = int(trainer.state.step)
    p_before = jax.tree.leaves(trainer.state.params)
    # perturb, then resume
    trainer.state, _ = trainer.train_step(trainer.state, jb,
                                          jax.random.PRNGKey(10))
    trainer.resume("full_ck")
    assert int(trainer.state.step) == step_before
    for a, b in zip(jax.tree.leaves(trainer.state.params), p_before):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gradients_reach_all_heads(setup):
    """Physics + heightmap losses must backprop into encoder params,
    including the friction head (gradient flows only through the rollout)."""
    trainer, loader, batch, _ = setup
    jb = tuple(jnp.asarray(b) for b in batch)

    def loss_fn(params):
        state = trainer.state.replace(params=params)
        aux = trainer.eval_step(state, jb)
        return aux["total"]

    # finite total gradient norm over all parameters
    g = jax.grad(lambda p: loss_fn(p))(trainer.state.params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_overfit_converges(setup, tmp_path):
    """The trainer LEARNS, not just runs — via the reference's OWN staged
    production recipe (train.sh:8-17): physics training starts from a
    PRETRAINED terrain encoder (train.sh:13-17 loads val.pth) at lr 1e-4
    (train.sh:11, train.py:28), never phys-from-scratch at a hot lr.

    Stage 1 overfits the heightmap heads only (phys_weight=0, lr 1e-3 —
    this plays val.pth's role); stage 2 enables the physics term from that
    init at the production lr 1e-4.  The phys-from-scratch lr=1e-3 variant
    this test used through round 4 is knife-edge: bit-identical first steps
    converge 28x in isolation yet diverge (0.149 -> ~24) in suite context,
    purely from jit-compilation-context rounding — documented in
    docs/PERFORMANCE.md and docs/convergence/README.md.  Measured margins
    for the staged gates (tests/../staged repro, 30+30 steps): warm 63x vs
    the 5x gate; phys-term 7.8x vs the 2x gate; the phys stage shows NO
    transient spike (max total == first total) vs the 3x stability bound."""
    trainer, loader, batch, _ = setup
    jb = tuple(jnp.asarray(b) for b in batch)

    # stage 1: heightmap-only warm-up (the pretrained-encoder surrogate)
    warm = type(trainer)(dphys_cfg=trainer.dphys_cfg, lss_cfg=trainer.lss_cfg,
                         lr=1e-3, phys_weight=0.0,
                         log_dir=str(tmp_path / "warm"))
    warm.init_state(jb, seed=0)
    rng = jax.random.PRNGKey(0)
    w_first, w_tot, w_ter, w_geo = None, [], [], []
    for _ in range(30):
        rng, sub = jax.random.split(rng)
        warm.state, aux = warm.train_step(warm.state, jb, sub)
        if w_first is None:
            w_first = {k: float(v) for k, v in aux.items()}
        w_tot.append(float(aux["total"]))
        w_ter.append(float(aux["terrain"]))
        w_geo.append(float(aux["geom"]))
    assert min(w_tot[-5:]) < w_first["total"] / 5.0, (w_first, w_tot[-5:])
    assert min(w_ter[-5:]) < w_first["terrain"], (w_first, w_ter[-5:])
    assert min(w_geo[-5:]) < w_first["geom"], (w_first, w_geo[-5:])

    # stage 2: enable physics from the warm init at the production lr
    # (train.sh:11; phys_weight stays at the train.py:36 CLI default 1.0)
    phys = type(trainer)(dphys_cfg=trainer.dphys_cfg, lss_cfg=trainer.lss_cfg,
                         lr=1e-4, phys_weight=1.0,
                         log_dir=str(tmp_path / "phys"))
    phys.init_state(jb, seed=0)
    phys.state = phys.state.replace(params=warm.state.params,
                                    batch_stats=warm.state.batch_stats)
    p_first, p_tot, p_phys = None, [], []
    for _ in range(30):
        rng, sub = jax.random.split(rng)
        phys.state, aux = phys.train_step(phys.state, jb, sub)
        if p_first is None:
            p_first = {k: float(v) for k, v in aux.items()}
        p_tot.append(float(aux["total"]))
        p_phys.append(float(aux["phys"]))
    assert np.isfinite(p_tot).all(), p_tot
    # stability: from a pretrained init at lr 1e-4 there is no transient
    # spike at all (the old recipe blew up 160x here)
    assert max(p_tot) < 3.0 * p_first["total"], (p_first, max(p_tot))
    # the physics term itself converges (gradient through the rollout works)
    assert min(p_phys[-5:]) < p_first["phys"] / 2.0, (p_first, p_phys[-5:])
    assert min(p_tot[-5:]) < p_first["total"] / 2.0, (p_first, p_tot[-5:])


def test_prediction_figure_logged(setup):
    """Per-epoch prediction figure (reference train.py:207-226): written from
    the last seen batch with the current params."""
    trainer, loader, batch, log_dir = setup
    trainer._last_batch = tuple(jnp.asarray(b) for b in batch)
    path = trainer.log_prediction_figure(trainer._last_batch, "test")
    assert os.path.getsize(path) > 1000
    assert path.startswith(os.path.join(log_dir, "figures"))
