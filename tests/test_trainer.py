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


def test_overfit_converges(setup):
    """The trainer LEARNS, not just runs (BASELINE config #5 intent /
    reference train.py:187-226): overfitting the synthetic fixture batch
    from a fresh init drops the total loss >5x and improves the masked
    terrain MSE.  The committed loss-curve artifact comes from
    scripts/overfit_demo.py (docs/convergence/)."""
    trainer, loader, batch, _ = setup
    jb = tuple(jnp.asarray(b) for b in batch)
    saved = trainer.state
    try:
        state = trainer.init_state(jb, seed=0)
    finally:
        trainer.state = saved  # don't disturb the shared module fixture

    # same trajectory as the committed artifact (scripts/overfit_demo.py:
    # 0.13 -> 0.0009 over 120 steps, 141x); 60 steps and a 5x gate leave
    # wide margin over per-step dropout noise.  Compare train-mode to
    # train-mode (after 60 steps the BatchNorm running stats, momentum
    # 0.99, still sit near the init, so eval-mode losses lag by
    # construction), and take the min of the last few steps so a single
    # noisy drop-connect draw cannot fail the gate.
    first, totals, terrains, geoms = None, [], [], []
    rng = jax.random.PRNGKey(0)
    for _ in range(60):
        rng, sub = jax.random.split(rng)
        state, aux = trainer.train_step(state, jb, sub)
        if first is None:
            first = {k: float(v) for k, v in aux.items()}
        totals.append(float(aux["total"]))
        terrains.append(float(aux["terrain"]))
        geoms.append(float(aux["geom"]))
    assert min(totals[-5:]) < first["total"] / 5.0, (first, totals[-5:])
    assert min(terrains[-5:]) < first["terrain"], (first, terrains[-5:])
    assert min(geoms[-5:]) < first["geom"], (first, geoms[-5:])


def test_prediction_figure_logged(setup):
    """Per-epoch prediction figure (reference train.py:207-226): written from
    the last seen batch with the current params."""
    trainer, loader, batch, log_dir = setup
    trainer._last_batch = tuple(jnp.asarray(b) for b in batch)
    path = trainer.log_prediction_figure(trainer._last_batch, "test")
    assert os.path.getsize(path) > 1000
    assert path.startswith(os.path.join(log_dir, "figures"))
