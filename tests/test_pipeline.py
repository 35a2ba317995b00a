"""End-to-end pipeline + evaluator + vis tests on the synthetic sequence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_sequence, tiny_lss_cfg
from monoforce_tpu.config import LSSConfig, PhysicsConfig
from monoforce_tpu.datasets import ROUGH
from monoforce_tpu.pipeline import MonoForce
from monoforce_tpu.physics.engine import RigidState


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    seq = make_sequence(str(root), n_frames=2)
    ld = tiny_lss_cfg()
    dcfg = PhysicsConfig(robot="tradr", traj_sim_time=1.0)
    dcfg.n_sim_trajs = 8
    lss = LSSConfig(data_aug_conf=ld["data_aug_conf"],
                    grid_conf=ld["grid_conf"], soft_classes=ld["soft_classes"])
    ds = ROUGH(seq, lss_cfg=ld, dphys_cfg=dcfg)
    inputs = tuple(jnp.asarray(a)[None] for a in ds.get_images_data(0))
    mf = MonoForce(dphys_cfg=dcfg, lss_cfg=lss)
    mf.init_params(inputs)
    return mf, inputs, ds, dcfg


def test_pipeline_end_to_end(setup):
    mf, inputs, ds, dcfg = setup
    terrain, plan = mf.run(*inputs, key=jax.random.PRNGKey(0))
    B = dcfg.n_sim_trajs
    n = dcfg.n_sim_steps
    assert plan.xs.shape == (B, n, 3)
    assert plan.Rs.shape == (B, n, 3, 3)
    assert plan.costs.shape == (B,)
    assert 0 <= int(plan.best) < B
    assert np.isfinite(np.asarray(plan.xs)).all()
    for k in ("geom", "terrain", "diff", "friction"):
        assert np.isfinite(np.asarray(terrain[k])).all()


def test_pipeline_half_serving_mode(setup):
    """half=True (bf16 camera trunk) runs the same jitted program shape-for-
    shape, returns f32 outputs, and plans a valid path (accuracy bounds are
    gated in test_encoder.py::test_half_inference_variables)."""
    mf, inputs, ds, dcfg = setup
    mf_h = MonoForce(dphys_cfg=mf.dphys_cfg, lss_cfg=mf.lss_cfg,
                     params=mf.params, half=True)
    terrain, plan = mf_h.run(*inputs, key=jax.random.PRNGKey(0))
    assert plan.xs.shape == (dcfg.n_sim_trajs, dcfg.n_sim_steps, 3)
    assert np.isfinite(np.asarray(plan.xs)).all()
    for k in ("geom", "terrain", "diff", "friction"):
        assert terrain[k].dtype == jnp.float32
        assert np.isfinite(np.asarray(terrain[k])).all()


def test_pipeline_custom_state0_and_controls(setup):
    mf, inputs, ds, dcfg = setup
    n = dcfg.n_sim_steps
    controls = jnp.tile(jnp.asarray([[0.5, 0.1]]), (4, n, 1))
    s0 = RigidState(jnp.zeros(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3))
    terrain, plan = mf.run(*inputs, controls=controls, state0=s0)
    assert plan.xs.shape[0] == 4


def test_vis_helpers(tmp_path, setup):
    mf, inputs, ds, dcfg = setup
    terrain, plan = mf.run(*inputs, key=jax.random.PRNGKey(1))
    from monoforce_tpu.vis import plot_terrain_with_trajs, plot_rollout_3d
    p1 = plot_terrain_with_trajs(np.asarray(terrain["terrain"])[0, 0],
                                 plan.xs, plan.costs, dcfg.d_max,
                                 best=int(plan.best),
                                 path=str(tmp_path / "a.png"))
    assert os.path.getsize(p1) > 1000
    p2 = plot_rollout_3d(np.asarray(terrain["terrain"])[0, 0],
                         np.asarray(plan.xs[int(plan.best)]), dcfg.d_max,
                         path=str(tmp_path / "b.png"))
    assert os.path.getsize(p2) > 1000


def test_evaluator(tmp_path, setup):
    mf, inputs, ds, dcfg = setup
    from monoforce_tpu.physics.engine import RobotModel
    from monoforce_tpu.training.evaluator import Evaluator
    from monoforce_tpu.utils import NumpyLoader

    # evaluator runs physics at 0.4m, so rebuild the dataset's dphys grid
    dcfg4 = PhysicsConfig(robot="tradr", grid_res=0.4, traj_sim_time=1.0)
    ev = Evaluator(mf.model, RobotModel.from_config(dcfg4), pool_k=4,
                   out_dir=str(tmp_path))
    loader = NumpyLoader(ds, batch_size=2)
    means = ev.run(mf.params, loader, save_figures=True,
                   d_max=float(dcfg.d_max))
    for k in ("hm_geom", "hm_terrain", "traj_xyz", "traj_rot"):
        assert k in means and np.isfinite(means[k])
    assert os.path.exists(tmp_path / "losses.csv")
    # per-batch 3x4 diagnostic panel (reference eval.py:159-265)
    assert os.path.getsize(tmp_path / "batch_0000.png") > 1000


def test_rollout_animation(tmp_path, setup):
    """GIF animation parity for DPhysics.visualize (dphysics.py:607-669),
    rendered headless."""
    from monoforce_tpu.physics.engine import RigidState, RobotModel, rollout
    from monoforce_tpu.vis import animate_rollout

    dcfg = PhysicsConfig(robot="tradr")
    robot = RobotModel.from_config(dcfg)
    rng = np.random.default_rng(0)
    z = jnp.asarray(0.2 * rng.normal(size=(128, 128)).astype(np.float32))
    ctr = jnp.tile(jnp.asarray([[0.7, 0.2]]), (1, 60, 1))
    states, forces, _ = rollout(robot, z[None], ctr, return_forces=True)
    one = RigidState(*(np.asarray(a)[0] for a in states))
    gif = animate_rollout(z, one, robot_points=np.asarray(robot.points),
                          forces=np.asarray(forces[0])[0],
                          d_max=float(dcfg.d_max), stride=15,
                          path=str(tmp_path / "rollout.gif"))
    assert os.path.getsize(gif) > 5000
