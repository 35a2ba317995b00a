"""Terrain-encoder tests: geometry, voxel pooling, layers, full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.models.terrain_encoder.geometry import (
    gen_dx_bx, create_frustum, get_geometry,
)
from monoforce_tpu.models.terrain_encoder.layers import upsample_align_corners
from monoforce_tpu.ops.voxel_pool import voxel_pool


TINY_GRID = {"xbound": (-2.0, 2.0, 0.1), "ybound": (-2.0, 2.0, 0.1),
             "zbound": (-3.2, 3.2, 6.4), "dbound": (0.6, 2.6, 0.5)}
TINY_AUG = {"final_dim": (64, 96)}


def test_gen_dx_bx_defaults():
    dx, bx, nx = gen_dx_bx((-6.4, 6.4, 0.1), (-6.4, 6.4, 0.1), (-3.2, 3.2, 6.4))
    np.testing.assert_allclose(dx, [0.1, 0.1, 6.4])
    np.testing.assert_allclose(bx, [-6.35, -6.35, 0.0], atol=1e-6)
    assert nx.tolist() == [128, 128, 1]


def test_frustum_matches_reference_shape():
    # torch.arange(0.6, 6.4, 0.1) has 59 elements (float accumulation), and
    # numpy matches — the lift has D=59 depth bins for the default config
    fr = create_frustum((256, 416), (0.6, 6.4, 0.1))
    assert fr.shape == (59, 16, 26, 3)
    assert float(fr[0, 0, 0, 2]) == pytest.approx(0.6)
    assert float(fr[0, 0, 0, 0]) == 0.0
    assert float(fr[0, 0, -1, 0]) == 415.0


def test_get_geometry_identity_calib():
    fr = create_frustum((64, 96), (1.0, 3.0, 1.0))
    B, N = 1, 1
    eye = jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3))
    zero = jnp.zeros((B, N, 3))
    pts = get_geometry(fr, eye, zero, eye, eye, zero)
    # with identity intrinsics/rotation: (u*d, v*d, d)
    u, v, d = np.asarray(fr[1, 2, 3])
    np.testing.assert_allclose(np.asarray(pts[0, 0, 1, 2, 3]),
                               [u * d, v * d, d], rtol=1e-5)
    # translation shifts everything
    pts_t = get_geometry(fr, eye, zero + 5.0, eye, eye, zero)
    np.testing.assert_allclose(np.asarray(pts_t), np.asarray(pts) + 5.0, rtol=1e-5)


def test_voxel_pool_matches_naive_scatter():
    rng = np.random.default_rng(0)
    B, N, D, h, w, C = 2, 1, 3, 2, 2, 4
    dx, bx, nx = gen_dx_bx((-1.0, 1.0, 0.5), (-1.0, 1.0, 0.5), (-1.0, 1.0, 2.0))
    geom = rng.uniform(-1.4, 1.4, (B, N, D, h, w, 3)).astype(np.float32)
    geom[..., 2] = 0.0
    feats = rng.normal(size=(B, N, D, h, w, C)).astype(np.float32)

    out = np.asarray(voxel_pool(jnp.asarray(geom), jnp.asarray(feats),
                                jnp.asarray(dx), jnp.asarray(bx), nx))
    assert out.shape == (B, 4, 4, C)

    # naive reference semantics (trunc cast + bounds filter + accumulate)
    expected = np.zeros((B, 4, 4, C), np.float32)
    gi = ((geom - (bx - dx / 2)) / dx).astype(np.int32)
    for b in range(B):
        g = gi[b].reshape(-1, 3)
        f = feats[b].reshape(-1, C)
        for (x, y, z), row in zip(g, f):
            if 0 <= x < 4 and 0 <= y < 4 and 0 <= z < 1:
                expected[b, x, y] += row
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_voxel_pool_gradients_flow():
    dx, bx, nx = gen_dx_bx((-1.0, 1.0, 0.5), (-1.0, 1.0, 0.5), (-1.0, 1.0, 2.0))
    geom = jnp.zeros((1, 1, 2, 2, 2, 3))
    feats = jnp.ones((1, 1, 2, 2, 2, 3))

    def loss(f):
        return voxel_pool(geom, f, jnp.asarray(dx), jnp.asarray(bx), nx).sum()

    g = jax.grad(loss)(feats)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # all in-bounds here


def test_upsample_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    for scale in (2, 4):
        ours = np.asarray(upsample_align_corners(jnp.asarray(x), scale))
        theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                               scale_factor=scale, mode="bilinear",
                               align_corners=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_lss():
    from monoforce_tpu.models import LiftSplatShoot
    model = LiftSplatShoot(TINY_GRID, TINY_AUG)
    B, N = 1, 2
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(B, N, 3, 64, 96)).astype(np.float32)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.zeros((B, N, 3)),
        jnp.broadcast_to(jnp.asarray([[50.0, 0, 48], [0, 50.0, 32], [0, 0, 1]]),
                         (B, N, 3, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.zeros((B, N, 3)),
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, args


def test_lss_forward_tiny(tiny_lss):
    model, params, args = tiny_lss
    out = model.apply(params, *args)
    assert set(out) == {"geom", "terrain", "diff", "friction"}
    for v in out.values():
        assert v.shape == (1, 1, 40, 40)
        assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(np.asarray(out["terrain"]),
                               np.asarray(out["geom"] - out["diff"]), atol=1e-6)
    # head ranges: geom in [-1, 1] (ScaledTanh), diff/friction >= 0 (ReLU)
    assert float(out["geom"].min()) >= -1.0 and float(out["geom"].max()) <= 1.0
    assert float(out["diff"].min()) >= 0.0
    assert float(out["friction"].min()) >= 0.0


def test_lss_train_mode_updates_batch_stats(tiny_lss):
    model, params, args = tiny_lss
    out, mutated = model.apply(params, *args, train=True,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert "batch_stats" in mutated
    # stats actually changed somewhere
    before = jax.tree.leaves(params["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_half_inference_variables(tiny_lss):
    """Serving-precision mode (bf16 camera trunk, f32 BEV + heads): outputs
    stay f32, heads keep their range constraints, and the quantization error
    vs the f32 path is bounded.  Params are noise-perturbed so the heads
    produce O(0.1-1) signals (a fresh init outputs ~1e-9, which would make
    the error gate vacuous)."""
    from monoforce_tpu.models.terrain_encoder.lss import (
        half_inference_variables)

    model, params, args = tiny_lss
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [a + 0.05 * jax.random.normal(k, a.shape, a.dtype)
              if a.dtype == jnp.float32 else a
              for a, k in zip(leaves, keys)]
    params_p = jax.tree.unflatten(treedef, leaves)

    ref = model.apply(params_p, *args)
    hv = half_inference_variables(params_p)
    # the cast touches ONLY the camencode subtree
    assert all(a.dtype == jnp.bfloat16
               for a in jax.tree.leaves(hv["params"]["camencode"]))
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(hv["params"]["bevencode"]))
    out = model.apply(hv, args[0].astype(jnp.bfloat16), *args[1:])

    for k, v in out.items():
        assert v.dtype == jnp.float32, k        # f32 BEV promotes back
        assert np.isfinite(np.asarray(v)).all(), k
    signal = float(np.abs(np.asarray(ref["terrain"])).mean())
    assert signal > 0.01, "perturbation failed to produce real outputs"
    for k, tol in (("terrain", 0.02), ("geom", 0.02), ("friction", 0.05)):
        rmse = float(np.sqrt(np.mean(
            (np.asarray(out[k]) - np.asarray(ref[k])) ** 2)))
        assert rmse < tol, (k, rmse)
    # head constraints survive the cast
    assert float(out["geom"].min()) >= -1.0 and float(out["geom"].max()) <= 1.0
    assert float(out["diff"].min()) >= 0.0
    assert float(out["friction"].min()) >= 0.0


def test_full_resolution_shapes_via_eval_shape():
    """Default config (256x416, 4 cams, 128x128 BEV) — shapes only, no FLOPs."""
    from monoforce_tpu.models import LiftSplatShoot
    from monoforce_tpu.config import LSSConfig
    lss_cfg = LSSConfig()
    model = LiftSplatShoot(lss_cfg.grid_conf, lss_cfg.data_aug_conf)
    B, N = 2, 4
    args = (
        jnp.zeros((B, N, 3, 256, 416)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.zeros((B, N, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.zeros((B, N, 3)),
    )
    model_vars = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    out = jax.eval_shape(
        lambda v, *a: model.apply(v, *a), model_vars, *args)
    for k in ("geom", "terrain", "diff", "friction"):
        assert out[k].shape == (B, 1, 128, 128)


def test_lss_resize_preset_online_contract():
    """The ONLINE encoder geometry (reference lss_cfg_resize.yaml +
    img_preproc.launch: raw frames pre-resized to 480x300): the named
    preset's val-mode augmentation maps a 480x300 frame to the (256, 416)
    model input, and the model traced at that geometry produces the same
    128x128 BEV heads as the offline config (the two reference configs
    share grid_conf)."""
    from PIL import Image

    from monoforce_tpu.config import LSSConfig
    from monoforce_tpu.datasets.augment import (
        img_transform, normalize_img, sample_augmentation,
    )
    from monoforce_tpu.models import LiftSplatShoot

    lss_cfg = LSSConfig.preset("resize")
    assert lss_cfg.data_aug_conf["H"] == 300
    assert lss_cfg.data_aug_conf["W"] == 480
    # val-mode aug on the pre-resized online frame
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (300, 480, 3),
                                          dtype=np.uint8))
    aug = sample_augmentation({"data_aug_conf": lss_cfg.data_aug_conf},
                              is_train=False)
    out, post_rot2, post_tran2 = img_transform(
        img, np.eye(2, dtype=np.float32), np.zeros(2, dtype=np.float32),
        *aug)
    arr = normalize_img(out)
    assert arr.shape == (3, 256, 416), arr.shape
    assert np.isfinite(np.asarray(post_rot2)).all()

    model = LiftSplatShoot(lss_cfg.grid_conf, lss_cfg.data_aug_conf)
    B, N = 1, 4
    args = (
        jnp.zeros((B, N, 3, 256, 416)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.zeros((B, N, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
        jnp.zeros((B, N, 3)),
    )
    model_vars = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    out = jax.eval_shape(lambda v, *a: model.apply(v, *a), model_vars, *args)
    for k in ("geom", "terrain", "diff", "friction"):
        assert out[k].shape == (B, 1, 128, 128)
