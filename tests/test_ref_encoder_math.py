"""Head-to-head parity: encoder math vs the REAL reference torch code.

Each test runs the reference implementation (imported from
/root/reference/monoforce/src via tests/ref_loader.py) and this repo's
counterpart on the same random inputs:

- img_transform post_rot/post_tran bookkeeping + pixels (utils.py:52-76)
  vs datasets/augment.py
- sample_augmentation val branch (utils.py:110-134) vs datasets/augment.py
- ego_to_cam / cam_to_ego / get_only_in_img_mask (utils.py:13-43)
  vs datasets/camera.py
- gen_dx_bx (utils.py:136-141) vs models/terrain_encoder/geometry.py
- create_frustum / get_geometry (lss.py:191-224) vs geometry.py
- voxel_pooling incl. QuickCumsum fwd AND grad (lss.py:238-280,
  utils.py:144-181) vs ops/voxel_pool.py
- LSSConfig.from_yaml on the actual reference lss_cfg.yaml
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from tests.ref_loader import load_reference, make_ref_lss_shell

from monoforce_tpu.config import LSSConfig
from monoforce_tpu.datasets import augment as my_aug
from monoforce_tpu.datasets import camera as my_cam
from monoforce_tpu.models.terrain_encoder import geometry as my_geom
from monoforce_tpu.ops.voxel_pool import voxel_pool

torch, ref_utils, ref_lss, ref_cfg_mod = load_reference()

REF_YAML = "/root/reference/monoforce/config/lss_cfg.yaml"

GRID_CONF = {
    "xbound": [-6.4, 6.4, 0.4],
    "ybound": [-6.4, 6.4, 0.4],
    "zbound": [-3.2, 3.2, 6.4],
    "dbound": [0.6, 6.4, 0.4],
}
AUG_CONF = {"H": 192, "W": 320, "final_dim": (128, 224),
            "bot_pct_lim": (0.0, 0.05), "resize_lim": (0.6, 0.8),
            "rot_lim": (-5.4, 5.4), "rand_flip": True}


def _rand_rots(rng, B, N):
    """Proper random rotation matrices via QR."""
    A = rng.normal(size=(B, N, 3, 3))
    q, r = np.linalg.qr(A)
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q.astype(np.float32)


# ---------------------------------------------------------------- img aug --

@pytest.mark.parametrize("flip,rotate", [(False, 0.0), (True, 4.2),
                                         (False, -5.0), (True, 0.0)])
def test_img_transform_matches_reference(flip, rotate):
    rng = np.random.default_rng(3)
    img_arr = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    resize, resize_dims, crop = 0.7, (90, 67), (5, 3, 69, 51)

    img_r, pr_r, pt_r = ref_utils.img_transform(
        Image.fromarray(img_arr), torch.eye(2), torch.zeros(2),
        resize, resize_dims, crop, flip, rotate)

    img_m, pr_m, pt_m = my_aug.img_transform(
        Image.fromarray(img_arr), np.eye(2, dtype=np.float32),
        np.zeros(2, dtype=np.float32), resize, resize_dims, crop, flip, rotate)

    np.testing.assert_allclose(pr_m, pr_r.numpy(), atol=1e-6)
    np.testing.assert_allclose(pt_m, pt_r.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_r))


def test_sample_augmentation_val_matches_reference():
    lss_cfg = {"data_aug_conf": {**AUG_CONF,
                                 "final_dim": list(AUG_CONF["final_dim"]),
                                 "bot_pct_lim": list(AUG_CONF["bot_pct_lim"])}}
    ref = ref_utils.sample_augmentation(lss_cfg, is_train=False)
    mine = my_aug.sample_augmentation(lss_cfg, is_train=False)
    assert mine[0] == ref[0]                      # resize
    assert tuple(mine[1]) == tuple(ref[1])        # resize_dims
    assert tuple(mine[2]) == tuple(ref[2])        # crop
    assert mine[3] == ref[3] and float(mine[4]) == float(ref[4])


# ----------------------------------------------------------- camera maths --

def test_ego_cam_roundtrip_matches_reference():
    rng = np.random.default_rng(0)
    pts = rng.normal(scale=3.0, size=(3, 64)).astype(np.float32)
    pts[2] += 5.0
    rot = _rand_rots(rng, 1, 1)[0, 0]
    trans = rng.normal(size=3).astype(np.float32)
    K = np.array([[260.0, 0, 112], [0, 260.0, 64], [0, 0, 1]], np.float32)

    ref = ref_utils.ego_to_cam(torch.as_tensor(pts), torch.as_tensor(rot),
                               torch.as_tensor(trans), torch.as_tensor(K))
    mine = my_cam.ego_to_cam(pts, rot, trans, K)
    np.testing.assert_allclose(mine, ref.numpy(), rtol=1e-4, atol=1e-4)

    ref_mask = ref_utils.get_only_in_img_mask(ref, 128, 224)
    my_mask = my_cam.in_image_mask(mine, 128, 224)
    np.testing.assert_array_equal(my_mask, ref_mask.numpy())

    cam_pts = rng.normal(scale=50.0, size=(3, 64)).astype(np.float32)
    cam_pts[2] = rng.uniform(0.5, 8.0, 64).astype(np.float32)
    ref_e = ref_utils.cam_to_ego(torch.as_tensor(cam_pts), torch.as_tensor(rot),
                                 torch.as_tensor(trans), torch.as_tensor(K))
    mine_e = my_cam.cam_to_ego(cam_pts, rot, trans, K)
    np.testing.assert_allclose(mine_e, ref_e.numpy(), rtol=1e-3, atol=1e-3)


# ----------------------------------------------------- frustum / geometry --

def test_gen_dx_bx_matches_reference():
    dx_r, bx_r, nx_r = ref_utils.gen_dx_bx(
        GRID_CONF["xbound"], GRID_CONF["ybound"], GRID_CONF["zbound"])
    dx_m, bx_m, nx_m = my_geom.gen_dx_bx(
        GRID_CONF["xbound"], GRID_CONF["ybound"], GRID_CONF["zbound"])
    np.testing.assert_allclose(dx_m, dx_r.numpy(), atol=1e-6)
    np.testing.assert_allclose(bx_m, bx_r.numpy(), atol=1e-6)
    np.testing.assert_array_equal(nx_m, nx_r.numpy())


def test_frustum_and_geometry_match_reference():
    shell = make_ref_lss_shell(ref_lss, torch, GRID_CONF, AUG_CONF)
    frustum_mine = my_geom.create_frustum(AUG_CONF["final_dim"],
                                          GRID_CONF["dbound"], downsample=16)
    np.testing.assert_allclose(np.asarray(frustum_mine),
                               shell.frustum.numpy(), atol=1e-5)

    rng = np.random.default_rng(1)
    B, N = 2, 3
    rots = _rand_rots(rng, B, N)
    trans = rng.normal(scale=0.5, size=(B, N, 3)).astype(np.float32)
    K = np.zeros((B, N, 3, 3), np.float32)
    K[..., 0, 0] = rng.uniform(200, 300, (B, N))
    K[..., 1, 1] = rng.uniform(200, 300, (B, N))
    K[..., 0, 2] = 112.0
    K[..., 1, 2] = 64.0
    K[..., 2, 2] = 1.0
    post_rots = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.7,
                                (B, N, 3, 3)).copy()
    post_rots[..., 2, 2] = 1.0
    post_trans = rng.normal(scale=2.0, size=(B, N, 3)).astype(np.float32)
    post_trans[..., 2] = 0.0

    geom_ref = shell.get_geometry(
        torch.as_tensor(rots), torch.as_tensor(trans), torch.as_tensor(K),
        torch.as_tensor(post_rots), torch.as_tensor(post_trans))
    geom_mine = my_geom.get_geometry(frustum_mine, rots, trans, K,
                                     post_rots, post_trans)
    np.testing.assert_allclose(np.asarray(geom_mine), geom_ref.numpy(),
                               rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ voxel pool --

def _pool_case(seed=7, B=2, N=2, D=5, fH=4, fW=6, C=3):
    rng = np.random.default_rng(seed)
    geom = rng.uniform(-7.5, 7.5, (B, N, D, fH, fW, 3)).astype(np.float32)
    geom[..., 2] = rng.uniform(-3.0, 3.0, (B, N, D, fH, fW))
    feats = rng.normal(size=(B, N, D, fH, fW, C)).astype(np.float32)
    return geom, feats


def _canon_ref(final_t, nx, C):
    """Reference (B, C*Z, X, Y) z-major -> canonical (B, X, Y, Z, C)."""
    B = final_t.shape[0]
    Z, X, Y = int(nx[2]), int(nx[0]), int(nx[1])
    arr = final_t.reshape(B, Z, C, X, Y)
    return np.transpose(arr, (0, 3, 4, 1, 2))


def _canon_mine(pooled, nx, C):
    """Mine (B, X, Y, C*Z) c-major -> canonical (B, X, Y, Z, C)."""
    B, X, Y = pooled.shape[:3]
    Z = int(nx[2])
    return np.transpose(pooled.reshape(B, X, Y, C, Z), (0, 1, 2, 4, 3))


@pytest.mark.parametrize("quickcumsum", [True, False])
def test_voxel_pooling_forward_matches_reference(quickcumsum):
    shell = make_ref_lss_shell(ref_lss, torch, GRID_CONF, AUG_CONF,
                               use_quickcumsum=quickcumsum)
    geom, feats = _pool_case()
    C = feats.shape[-1]
    with torch.no_grad():
        final = shell.voxel_pooling(torch.as_tensor(geom),
                                    torch.as_tensor(feats))
    dx, bx, nx = my_geom.gen_dx_bx(GRID_CONF["xbound"], GRID_CONF["ybound"],
                                   GRID_CONF["zbound"])
    mine = voxel_pool(jnp.asarray(geom), jnp.asarray(feats),
                      jnp.asarray(dx), jnp.asarray(bx), nx)
    np.testing.assert_allclose(_canon_mine(np.asarray(mine), nx, C),
                               _canon_ref(final.numpy(), nx, C),
                               rtol=1e-4, atol=1e-4)


def test_voxel_pooling_gradient_matches_reference():
    """d(sum(w * pooled))/d(feats): torch QuickCumsum autograd vs jax.grad."""
    shell = make_ref_lss_shell(ref_lss, torch, GRID_CONF, AUG_CONF,
                               use_quickcumsum=True)
    geom, feats = _pool_case(seed=11)
    C = feats.shape[-1]
    dx, bx, nx = my_geom.gen_dx_bx(GRID_CONF["xbound"], GRID_CONF["ybound"],
                                   GRID_CONF["zbound"])
    rng = np.random.default_rng(5)
    w_canon = rng.normal(size=(1, int(nx[0]), int(nx[1]), int(nx[2]), C)
                         ).astype(np.float32)

    feats_t = torch.as_tensor(feats).requires_grad_(True)
    final = shell.voxel_pooling(torch.as_tensor(geom), feats_t)
    w_ref = torch.as_tensor(
        np.ascontiguousarray(np.transpose(w_canon, (0, 3, 4, 1, 2)).reshape(
            1, int(nx[2]) * C, int(nx[0]), int(nx[1]))))
    (final * w_ref).sum().backward()
    grad_ref = feats_t.grad.numpy()

    def loss_fn(f):
        pooled = voxel_pool(jnp.asarray(geom), f, jnp.asarray(dx),
                            jnp.asarray(bx), nx)
        pooled_canon = pooled.reshape(
            pooled.shape[0], int(nx[0]), int(nx[1]), C, int(nx[2])
        ).transpose(0, 1, 2, 4, 3)
        return jnp.sum(pooled_canon * jnp.asarray(w_canon))

    grad_mine = np.asarray(jax.grad(loss_fn)(jnp.asarray(feats)))
    np.testing.assert_allclose(grad_mine, grad_ref, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ config yaml --

def test_lss_config_from_reference_yaml():
    import yaml
    cfg = LSSConfig.from_yaml(REF_YAML)
    with open(REF_YAML) as f:
        raw = yaml.safe_load(f)
    for k, v in raw["grid_conf"].items():
        assert tuple(cfg.grid_conf[k]) == tuple(v), k
    for k, v in raw["data_aug_conf"].items():
        got = cfg.data_aug_conf[k]
        if isinstance(v, list):
            assert tuple(got) == tuple(v), k
        else:
            assert got == v, k
    assert tuple(cfg.img_mean) == tuple(raw["img_mean"])
    assert tuple(cfg.img_std) == tuple(raw["img_std"])


# ----------------------------------------------- composite module parity --
# torch.nn replicas of the reference's composite blocks (efficientnet_pytorch
# MBConvBlock semantics incl. static-SAME padding, torchvision BasicBlock /
# BevEncode trunk semantics incl. symmetric stride-2 padding), weights ported
# through monoforce_tpu.models.terrain_encoder.torch_port, outputs compared
# head-to-head at fp32 — the composite-level link of the .pth port chain.

def _randomize_bn(mod, rng_seed):
    """Non-trivial BN affine + running stats so eval BN actually transforms."""
    g = torch.Generator().manual_seed(rng_seed)
    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.3, 0.3, generator=g)
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


class _TorchMBConv(torch.nn.Module):
    """efficientnet_pytorch MBConvBlock (model.py: expand -> static-SAME
    depthwise -> SE (squeeze on INPUT filters) -> project, swish, BN eps
    1e-3; identity skip when stride==1 and in==out; drop-connect is identity
    in eval).  Submodule names follow the checkpoint layout so torch_port's
    ``_mbconv`` ports the state_dict directly."""

    def __init__(self, in_ch, out_ch, k, stride, expand):
        super().__init__()
        tnn = torch.nn
        self.k, self.stride, self.expand = k, stride, expand
        self.in_ch, self.out_ch = in_ch, out_ch
        mid = in_ch * expand
        if expand != 1:
            self._expand_conv = tnn.Conv2d(in_ch, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3)
        self._depthwise_conv = tnn.Conv2d(mid, mid, k, stride=stride,
                                          groups=mid, bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        se_ch = max(1, int(in_ch * 0.25))
        self._se_reduce = tnn.Conv2d(mid, se_ch, 1)
        self._se_expand = tnn.Conv2d(se_ch, mid, 1)
        self._project_conv = tnn.Conv2d(mid, out_ch, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(out_ch, eps=1e-3)

    @staticmethod
    def _static_same_pad(x, k, s):
        """TF-style SAME (Conv2dStaticSamePadding): total pad splits with the
        EXTRA pixel on the right/bottom."""
        import math
        import torch.nn.functional as F
        ih, iw = x.shape[-2:]
        ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
        pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
        return F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])

    def forward(self, x):
        import torch.nn.functional as F
        sw = lambda t: t * torch.sigmoid(t)  # noqa: E731
        h = x
        if self.expand != 1:
            h = sw(self._bn0(self._expand_conv(h)))
        h = self._static_same_pad(h, self.k, self.stride)
        h = sw(self._bn1(self._depthwise_conv(h)))
        se = F.adaptive_avg_pool2d(h, 1)
        se = self._se_expand(sw(self._se_reduce(se)))
        h = torch.sigmoid(se) * h
        h = self._bn2(self._project_conv(h))
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + x
        return h


@pytest.mark.parametrize("in_ch,out_ch,k,stride,expand", [
    (16, 24, 3, 2, 6),   # stride-2: asymmetric static-SAME padding
    (24, 24, 5, 1, 6),   # identity skip + 5x5 depthwise
    (32, 16, 3, 1, 1),   # block-0 style: no expand conv
])
def test_mbconv_composite_matches_torch(in_ch, out_ch, k, stride, expand):
    from monoforce_tpu.models.terrain_encoder.efficientnet import MBConv
    from monoforce_tpu.models.terrain_encoder.torch_port import _mbconv

    torch.manual_seed(in_ch)
    blk = _TorchMBConv(in_ch, out_ch, k, stride, expand)
    _randomize_bn(blk, in_ch)
    blk.eval()
    sd = {f"blk.{n}": t for n, t in blk.state_dict().items()}
    p, s = _mbconv(sd, "blk", expand)

    x = np.random.default_rng(7).normal(
        size=(2, in_ch, 17, 23)).astype(np.float32)  # odd sizes stress SAME
    with torch.no_grad():
        y_t = blk(torch.from_numpy(x)).numpy()
    y_f = MBConv(out_ch, k, stride, expand).apply(
        {"params": p, "batch_stats": s},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-4)


class _TorchBasicBlock(torch.nn.Module):
    """torchvision.models.resnet.BasicBlock semantics: symmetric padding=1
    3x3 convs (also at stride 2), optional 1x1 downsample projection."""

    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        tnn = torch.nn
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(out_ch))

    def forward(self, x):
        import torch.nn.functional as F
        identity = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return F.relu(h + identity)


@pytest.mark.parametrize("in_ch,out_ch,stride", [
    (64, 64, 1),    # layer1-style identity block
    (64, 128, 2),   # layer2.0-style downsampling block
])
def test_basic_block_composite_matches_torch(in_ch, out_ch, stride):
    from monoforce_tpu.models.terrain_encoder.bev import BasicBlock
    from monoforce_tpu.models.terrain_encoder.torch_port import _basic_block

    torch.manual_seed(out_ch)
    blk = _TorchBasicBlock(in_ch, out_ch, stride)
    _randomize_bn(blk, out_ch)
    blk.eval()
    sd = {f"b.{n}": t for n, t in blk.state_dict().items()}
    p, s = _basic_block(sd, "b", downsample=blk.downsample is not None)

    x = np.random.default_rng(11).normal(
        size=(2, in_ch, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y_t = blk(torch.from_numpy(x)).numpy()
    y_f = BasicBlock(out_ch, stride=stride).apply(
        {"params": p, "batch_stats": s},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t,
                               rtol=1e-4, atol=1e-4)


class _TorchBevEncode(torch.nn.Module):
    """Full reference BevEncode (lss.py:101-165) rebuilt from plain torch.nn
    (torchvision is stubbed here): conv1 7x7/s2/p3, resnet18 layers 1-3 from
    _TorchBasicBlock, Up(scale=4) with align-corners bilinear + conv/BN/GELU
    pairs, and the three heads with ScaledTanh / ReLU finals.  Module names
    follow the reference state_dict layout for torch_port's ``_bevencode``."""

    def __init__(self, in_ch=64, out_ch=1):
        super().__init__()
        tnn = torch.nn
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.layer1 = tnn.Sequential(_TorchBasicBlock(64, 64, 1),
                                     _TorchBasicBlock(64, 64, 1))
        self.layer2 = tnn.Sequential(_TorchBasicBlock(64, 128, 2),
                                     _TorchBasicBlock(128, 128, 1))
        self.layer3 = tnn.Sequential(_TorchBasicBlock(128, 256, 2),
                                     _TorchBasicBlock(256, 256, 1))

        class _Up(tnn.Module):
            def __init__(self, cin, cout, scale):
                super().__init__()
                self.up = tnn.Upsample(scale_factor=scale, mode="bilinear",
                                       align_corners=True)
                self.conv = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(cout), tnn.GELU(),
                    tnn.Conv2d(cout, cout, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(cout), tnn.GELU())

            def forward(self, x1, x2):
                return self.conv(torch.cat([x2, self.up(x1)], dim=1))

        self.up1 = _Up(64 + 256, 256, 4)

        def head(final):
            return tnn.Sequential(
                tnn.Upsample(scale_factor=2, mode="bilinear",
                             align_corners=True),
                tnn.Conv2d(256, 128, 3, padding=1, bias=False),
                tnn.BatchNorm2d(128), tnn.GELU(),
                tnn.Conv2d(128, out_ch, 1), final)

        class _ScaledTanh(tnn.Module):
            def forward(self, x):
                return -1.0 + 2.0 * (torch.tanh(x) + 1) / 2

        self.up_geom = head(_ScaledTanh())
        self.up_diff = head(tnn.ReLU())
        self.up_friction = head(tnn.ReLU())

    def forward(self, x):
        import torch.nn.functional as F
        h = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(h)
        h = self.layer3(self.layer2(x1))
        h = self.up1(h, x1)
        geom = self.up_geom(h)
        diff = self.up_diff(h)
        return {"geom": geom, "terrain": geom - diff, "diff": diff,
                "friction": self.up_friction(h)}


def test_bevencode_composite_matches_torch():
    """End-to-end BevEncode: a full torchvision-semantics replica vs the flax
    module with weights ported by torch_port._bevencode — covers the
    symmetric stride-2 paddings, align-corners upsampling, exact GELU,
    ScaledTanh and terrain = geom - diff in one composite graph."""
    from monoforce_tpu.models.terrain_encoder.bev import BevEncode
    from monoforce_tpu.models.terrain_encoder.torch_port import _bevencode

    torch.manual_seed(42)
    ref = _TorchBevEncode(in_ch=64, out_ch=1)
    _randomize_bn(ref, 42)
    ref.eval()
    sd = {f"bevencode.{n}": t for n, t in ref.state_dict().items()}
    p, s = _bevencode(sd, "bevencode")

    x = np.random.default_rng(13).normal(
        size=(1, 64, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x))
    out_f = BevEncode(out_ch=1).apply(
        {"params": p, "batch_stats": s},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for key in ("geom", "diff", "terrain", "friction"):
        np.testing.assert_allclose(
            np.asarray(out_f[key]).transpose(0, 3, 1, 2),
            out_t[key].numpy(), rtol=1e-4, atol=1e-4, err_msg=key)
