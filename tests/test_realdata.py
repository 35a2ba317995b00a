"""Head-to-head REAL-DATA parity vs the reference, on the reference's own
committed data sample.

``/root/reference/monoforce/config/data_sample/{tradr,marv}`` is the only
real sensor data in this environment: real 1920x1200 camera PNGs, a real
ouster lidar cloud (.npz, structured dtype), real ``lidar_poses.csv`` and
real calibration YAMLs.  The reference's own demo consumes exactly these
files (``monoforce_demos/nodes/monoforce_demo:155-167`` drives ROUGH on the
sample dir; ``monoforce/scripts/run.sh`` feeds the marv images to run.py) —
so these tests prove the data layer on the REAL on-disk formats, not just
the synthetic fixture.

Samples are copied to tmp before loading: both dataset loaders write caches
(``images/resized``, ``terrain/geom``) and /root/reference is read-only.
The reference loader runs with FUNCTIONAL torchvision stand-ins
(tests/ref_loader.py) so its actual resize/normalize pipeline executes.
"""

import os
import shutil

import numpy as np
import pytest

from tests.ref_loader import load_reference_rough

REF_ROOT = "/root/reference/monoforce"
SAMPLE_DIR = os.path.join(REF_ROOT, "config", "data_sample")
LSS_YAML = os.path.join(REF_ROOT, "config", "lss_cfg.yaml")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE_DIR), reason="reference data sample not found")


@pytest.fixture(scope="module")
def ref():
    torch, ref_cfg_mod, ref_rough, ref_utils = load_reference_rough()
    return {"torch": torch, "cfg": ref_cfg_mod, "rough": ref_rough,
            "utils": ref_utils}


@pytest.fixture(scope="module")
def sample_copies(tmp_path_factory):
    """Two independent copies per robot (ours/theirs write identical cache
    files; separate trees keep the head-to-head honest)."""
    root = tmp_path_factory.mktemp("data_sample")
    out = {}
    for robot in ("tradr", "marv"):
        for side in ("ours", "ref"):
            dst = root / f"{robot}_{side}"
            shutil.copytree(os.path.join(SAMPLE_DIR, robot), dst)
            out[(robot, side)] = str(dst)
    return out


def _our_ds(path, robot):
    from monoforce_tpu.config import PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.utils.io import read_yaml

    return ROUGH(path, lss_cfg=read_yaml(LSS_YAML),
                 dphys_cfg=PhysicsConfig(robot=robot))


def _ref_ds(ref, path, robot):
    lss_cfg = ref["utils"].read_yaml(LSS_YAML)
    dphys_cfg = ref["cfg"].DPhysConfig(robot=robot)
    return ref["rough"].ROUGH(path, lss_cfg=lss_cfg, dphys_cfg=dphys_cfg,
                              is_train=False)


# ------------------------------------------------------------- calibration
@pytest.mark.parametrize("robot", ["tradr", "marv"])
def test_load_calib_parity(ref, robot):
    """Our load_calib reads the REAL calibration dirs identically to the
    reference's (reference utils.py:98-121).  Read-only access."""
    from monoforce_tpu.utils.io import load_calib

    calib_path = os.path.join(SAMPLE_DIR, robot, "calibration")
    ours = load_calib(calib_path)
    theirs = ref["utils"].load_calib(calib_path=calib_path)
    assert ours is not None and theirs is not None
    cams = [k for k in theirs if k.startswith("camera_")]
    assert len(cams) >= 3
    for cam in cams:
        K_o = np.asarray(ours[cam]["camera_matrix"]["data"], np.float64)
        K_t = np.asarray(theirs[cam]["camera_matrix"]["data"], np.float64)
        np.testing.assert_array_equal(K_o, K_t)
    for key, val in theirs["transformations"].items():
        np.testing.assert_array_equal(
            np.asarray(ours["transformations"][key]["data"], np.float64),
            np.asarray(val["data"], np.float64))
    assert ours["clearance"] == pytest.approx(theirs["clearance"])


# ------------------------------------------------------------ poses / traj
@pytest.mark.parametrize("robot", ["tradr", "marv"])
def test_poses_and_traj_parity(ref, sample_copies, robot):
    """Pose CSV parsing, gravity-aligned initial pose, and the future-pose
    trajectory (reference rough.py:124-157,213-259) on the REAL
    lidar_poses.csv."""
    ours = _our_ds(sample_copies[(robot, "ours")], robot)
    theirs = _ref_ds(ref, sample_copies[(robot, "ref")], robot)
    assert len(ours) == len(theirs) == 1
    assert ours.ids == list(theirs.ids)

    np.testing.assert_allclose(ours.poses_ts, np.asarray(theirs.poses_ts),
                               rtol=0, atol=0)
    np.testing.assert_allclose(ours.poses, np.asarray(theirs.poses),
                               rtol=0, atol=1e-6)

    G_o = ours.get_initial_pose_on_heightmap(0)
    G_t = np.asarray(theirs.get_initial_pose_on_heightmap(0))
    np.testing.assert_allclose(G_o, G_t, atol=1e-6)

    tr_o = ours.get_traj(0)
    tr_t = theirs.get_traj(0)
    np.testing.assert_allclose(tr_o["stamps"], np.asarray(tr_t["stamps"]),
                               atol=1e-5)
    np.testing.assert_allclose(tr_o["poses"], np.asarray(tr_t["poses"]),
                               atol=1e-5)


# ------------------------------------------------------------------ clouds
@pytest.mark.parametrize("robot", ["tradr", "marv"])
def test_cloud_parity(ref, sample_copies, robot):
    """The REAL structured ouster cloud: dtype handling, sensor->base_link
    transform, gravity alignment (reference rough.py:307-317)."""
    ours = _our_ds(sample_copies[(robot, "ours")], robot)
    theirs = _ref_ds(ref, sample_copies[(robot, "ref")], robot)

    raw = ours.get_raw_cloud(0)
    assert raw.dtype.names is not None and "x" in raw.dtype.names
    pts_o = ours.get_cloud(0)

    from monoforce.utils import position as ref_position
    pts_t = ref_position(theirs.get_cloud(0))
    assert pts_o.shape == pts_t.shape == (raw.shape[0], 3)
    np.testing.assert_allclose(pts_o, pts_t, atol=1e-4)


@pytest.mark.parametrize("robot", ["tradr", "marv"])
def test_geom_heightmap_parity(ref, sample_copies, robot):
    """Max-z rasterization of the REAL cloud (reference
    cloudproc.py:88-148 via rough.py:319-341), including the mask channel
    and the reference's trailing ``.T`` quirk."""
    ours = _our_ds(sample_copies[(robot, "ours")], robot)
    theirs = _ref_ds(ref, sample_copies[(robot, "ref")], robot)

    hm_o = np.asarray(ours.get_geom_height_map(0))
    hm_t = np.asarray(theirs.get_geom_height_map(0))
    assert hm_o.shape == hm_t.shape == (2, 128, 128)
    np.testing.assert_array_equal(hm_o[1], hm_t[1])          # mask
    np.testing.assert_allclose(hm_o[0], hm_t[0], atol=1e-5)  # heights
    assert hm_t[1].sum() > 100  # the real cloud actually covers the grid


# ------------------------------------------------------------------ images
def test_images_data_parity_marv(ref, sample_copies):
    """The full image branch on the REAL marv PNGs: shorter-side-512 cached
    resize, val augmentation, homography bookkeeping, ImageNet
    normalization, gravity-aligned extrinsics (reference rough.py:442-514).
    marv is the sample with all four cameras on disk — the reference's own
    run.sh demo input."""
    ours = _our_ds(sample_copies[("marv", "ours")], "marv")
    theirs = _ref_ds(ref, sample_copies[("marv", "ref")], "marv")
    assert ours.camera_names == list(theirs.camera_names)

    out_o = ours.get_images_data(0)
    out_t = [np.asarray(t) for t in theirs.get_images_data(0)]
    names = ["imgs", "rots", "trans", "intrins", "post_rots", "post_trans"]
    for name, a, b in zip(names, out_o, out_t):
        assert a.shape == b.shape, name
        atol = 1e-5 if name == "imgs" else 1e-6
        np.testing.assert_allclose(a, b, atol=atol, err_msg=name)
    # the resize cache landed on disk like the reference's
    assert os.path.isdir(os.path.join(sample_copies[("marv", "ours")],
                                      "images", "resized"))


def test_images_data_readonly_fallback(ref, sample_copies, monkeypatch):
    """Our loader must still serve images when the dataset directory is not
    writable (the reference crashes there; documented divergence).  The
    unwritable directory is simulated by failing ``os.makedirs`` — the test
    runs as root, where chmod 0o555 would not actually deny the write."""
    path = sample_copies[("marv", "ours")]
    ours = _our_ds(path, "marv")
    resized = os.path.join(path, "images", "resized")
    if os.path.isdir(resized):
        shutil.rmtree(resized)

    def _deny(*a, **k):
        raise PermissionError("read-only dataset dir (simulated)")

    monkeypatch.setattr(os, "makedirs", _deny)
    out = ours.get_images_data(0)
    assert np.isfinite(out[0]).all()
    assert not os.path.isdir(resized)


# ------------------------------------------------------------ end-to-end
def test_real_overfit_converges(sample_copies):
    """Training convergence on the REAL marv sensor frame (the modest CI
    gate behind the docs/convergence/real artifact, scripts/overfit_demo.py
    --real): a fresh-init model overfitting the reference's committed
    data_sample for a handful of steps must drop the total loss >2x.
    Tiny encoder dims keep the CPU step tractable; the committed artifact
    runs the full reference lss_cfg geometry on the TPU.  (Reference
    intent: train.py:187-226 — the loss decreases.)

    phys_weight=0 here: on a SINGLE real frame the BPTT physics term
    measurably destabilizes overfitting (measured 0.16 -> 22.9 by step 20
    at lr=3e-4, pw=0.1 — a dynamics divergence of the rollout on the
    partially-trained terrain; the reference trains it at batch 24 over
    many frames).  Physics-term convergence is gated on the consistent
    synthetic fixture instead (test_trainer.py::test_overfit_converges,
    pw=1, 141x artifact in docs/convergence)."""
    import jax
    import jax.numpy as jnp

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.training import Trainer
    from monoforce_tpu.utils import NumpyLoader
    from monoforce_tpu.utils.io import read_yaml

    lss_dict = read_yaml(LSS_YAML)
    lss_dict["data_aug_conf"]["final_dim"] = (32, 64)
    lss_dict["grid_conf"]["dbound"] = [0.6, 3.0, 0.2]
    dcfg = PhysicsConfig(robot="marv", traj_sim_time=1.0)
    ds = ROUGH(sample_copies[("marv", "ours")], lss_cfg=lss_dict,
               dphys_cfg=dcfg)
    loader = NumpyLoader(ds, batch_size=1)
    lss_cfg = LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
                        grid_conf=lss_dict["grid_conf"],
                        soft_classes=lss_dict["soft_classes"])
    import tempfile
    trainer = Trainer(dphys_cfg=dcfg, lss_cfg=lss_cfg, lr=1e-3,
                      phys_weight=0.0,
                      log_dir=tempfile.mkdtemp(prefix="real_overfit_"))
    batch = tuple(jnp.asarray(b) for b in next(iter(loader)))
    trainer.init_state(batch)

    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(12):
        rng, sub = jax.random.split(rng)
        trainer.state, aux = trainer.train_step(trainer.state, batch, sub)
        losses.append(float(aux["total"]))
    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0] / 2.0, (losses[0], losses[-1])


def test_real_staged_phys_stable(sample_copies):
    """The reference's STAGED production recipe on the REAL marv frame (the
    modest CI gate behind docs/convergence/real/marv_staged/): heightmap-only
    warm-up plays the role of the pretrained val.pth init the reference
    loads before physics training (train.sh:13-17), then the physics term is
    enabled from that init at the production lr 1e-4 (train.sh:11,
    train.py:28).  Gates the behavior the unstaged negative result lacks
    (docs/convergence/README.md: phys-from-scratch on one real frame
    measurably diverges, 0.16 -> 22.9 by step 20): from a warm init at the
    production lr, the physics term trains WITHOUT destabilizing — every
    loss stays finite, the total never spikes, and the phys term does not
    grow.  Tiny encoder dims keep the CPU steps tractable; the committed
    artifact runs the full reference lss_cfg geometry on the TPU."""
    import jax
    import jax.numpy as jnp

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.training import Trainer
    from monoforce_tpu.utils import NumpyLoader
    from monoforce_tpu.utils.io import read_yaml

    lss_dict = read_yaml(LSS_YAML)
    lss_dict["data_aug_conf"]["final_dim"] = (32, 64)
    lss_dict["grid_conf"]["dbound"] = [0.6, 3.0, 0.2]
    # grid_res 0.4: the production recipe trains physics on the POOLED
    # 0.4 m grid (train.py:38,96-99), never at the raw 0.1 m encoder grid
    dcfg = PhysicsConfig(robot="marv", grid_res=0.4, traj_sim_time=1.0)
    ds = ROUGH(sample_copies[("marv", "ours")], lss_cfg=lss_dict,
               dphys_cfg=dcfg)
    loader = NumpyLoader(ds, batch_size=1)
    lss_cfg = LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
                        grid_conf=lss_dict["grid_conf"],
                        soft_classes=lss_dict["soft_classes"])
    import tempfile

    # stage 1: heightmap-only warm-up (the pretrained-encoder surrogate)
    warm = Trainer(dphys_cfg=dcfg, lss_cfg=lss_cfg, lr=1e-3, phys_weight=0.0,
                   log_dir=tempfile.mkdtemp(prefix="real_staged_warm_"))
    batch = tuple(jnp.asarray(b) for b in next(iter(loader)))
    warm.init_state(batch)
    rng = jax.random.PRNGKey(0)
    w_tot = []
    for _ in range(10):
        rng, sub = jax.random.split(rng)
        warm.state, aux = warm.train_step(warm.state, batch, sub)
        w_tot.append(float(aux["total"]))
    assert w_tot[-1] < w_tot[0] / 2.0, w_tot

    # stage 2: physics enabled from the warm init at the production lr
    phys = Trainer(dphys_cfg=dcfg, lss_cfg=lss_cfg, lr=1e-4, phys_weight=1.0,
                   log_dir=tempfile.mkdtemp(prefix="real_staged_phys_"))
    phys.init_state(batch)
    phys.state = phys.state.replace(params=warm.state.params,
                                    batch_stats=warm.state.batch_stats)
    p_tot, p_phys = [], []
    for _ in range(10):
        rng, sub = jax.random.split(rng)
        phys.state, aux = phys.train_step(phys.state, batch, sub)
        p_tot.append(float(aux["total"]))
        p_phys.append(float(aux["phys"]))
    assert np.all(np.isfinite(p_tot)), p_tot
    # stability: no transient spike (the unstaged recipe blew up >100x here)
    assert max(p_tot) < 3.0 * p_tot[0], (p_tot,)
    # the phys term does not grow from its stage-entry value
    assert min(p_phys[-3:]) < 1.5 * p_phys[0], (p_phys,)


def test_pipeline_end_to_end_real_images(sample_copies):
    """MonoForce end-to-end on the REAL marv images + calibration (tiny
    encoder dims to keep the CPU forward tractable): images -> LSS terrain
    -> shooting -> best path, all finite."""
    import jax
    import jax.numpy as jnp

    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.datasets import ROUGH
    from monoforce_tpu.pipeline import MonoForce
    from monoforce_tpu.utils.io import read_yaml

    lss_dict = read_yaml(LSS_YAML)
    lss_dict["data_aug_conf"]["final_dim"] = (32, 64)
    lss_dict["grid_conf"]["dbound"] = [0.6, 3.0, 0.2]
    dcfg = PhysicsConfig(robot="marv", traj_sim_time=1.0)
    dcfg.n_sim_trajs = 8
    ds = ROUGH(sample_copies[("marv", "ours")], lss_cfg=lss_dict,
               dphys_cfg=dcfg)
    inputs = tuple(jnp.asarray(a)[None] for a in ds.get_images_data(0))

    lss = LSSConfig(data_aug_conf=lss_dict["data_aug_conf"],
                    grid_conf=lss_dict["grid_conf"])
    mf = MonoForce(dphys_cfg=dcfg, lss_cfg=lss)
    mf.init_params(inputs)
    terrain, plan = mf.run(*inputs, key=jax.random.PRNGKey(0))
    assert plan.xs.shape == (8, dcfg.n_sim_steps, 3)
    assert np.isfinite(np.asarray(plan.xs)).all()
    for k in ("geom", "terrain", "diff", "friction"):
        assert np.isfinite(np.asarray(terrain[k])).all()
