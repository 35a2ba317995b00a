"""Import helpers for head-to-head tests against the REAL reference torch code.

The reference modules live at /root/reference/monoforce/src (read-only) and
import packages that are not installed here (torchdiffeq, open3d,
torchvision, efficientnet_pytorch).  None of those are on the math paths
under test, so minimal stubs are registered in ``sys.modules`` first.

The reference's mesh loader (dphys_config.py:8-35, open3d) is replaced with
this repo's procedural point clouds so both engines see identical inputs.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_SRC = "/root/reference/monoforce/src"


def _stub_torchvision():
    """Functional torchvision.transforms stand-ins (torchvision is not
    installed).  The reference's data path actually USES these —
    ``normalize_img``/``resize_img`` (terrain_encoder/utils.py:96-107) run
    inside ``ROUGH.get_images_data`` — so identity stubs would fake the
    head-to-head real-data parity tests.  Semantics match torchvision:
    ToTensor (uint8 HWC -> f32 CHW / 255), Normalize ((x - mean) / std,
    subclassable for the reference's NormalizeInverse), Resize (int size =
    match the SHORTER edge, other edge ``int(size * long / short)``
    truncated), ToPILImage (mul 255, byte() truncation)."""
    if "torchvision" in sys.modules:
        return
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")

    class Compose:
        def __init__(self, ts):
            self.ts = list(ts)

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, pic):
            arr = np.asarray(pic, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
            return t.to(torch.float32).div(255.0)

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.as_tensor(mean, dtype=torch.float32)
            self.std = torch.as_tensor(std, dtype=torch.float32)

        def __call__(self, t):
            return (t - self.mean[:, None, None]) / self.std[:, None, None]

    class ToPILImage:
        def __init__(self, *a, **k):
            pass

        def __call__(self, t):
            arr = t.detach().mul(255).to(torch.uint8).permute(1, 2, 0).numpy()
            return Image.fromarray(arr)

    class Resize:
        def __init__(self, size, interpolation=Image.BICUBIC, **k):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                short, long = (h, w) if h <= w else (w, h)
                if short == self.size:
                    return img
                new_long = int(self.size * long / short)
                nw, nh = ((new_long, self.size) if h <= w
                          else (self.size, new_long))
                return img.resize((nw, nh), self.interpolation)
            h, w = self.size
            return img.resize((w, h), self.interpolation)

    transforms = types.SimpleNamespace(
        Normalize=Normalize, Compose=Compose, ToTensor=ToTensor,
        ToPILImage=ToPILImage, Resize=Resize)
    tv.transforms = transforms
    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.resnet18 = None  # referenced by BevEncode, never built in tests
    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet = resnet_mod
    tv.models = models_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models_mod
    sys.modules["torchvision.models.resnet"] = resnet_mod


def _odeint_euler_shim(func, y0, t, rtol=None, atol=None, method="euler",
                       options=None):
    """Fixed-grid explicit-Euler stand-in for ``torchdiffeq.odeint`` (not
    installed here), matching its ``method='euler'`` semantics exactly: with
    no ``step_size`` option the solver steps on the ``t`` grid itself,
    ``y_{k+1} = y_k + (t_{k+1}-t_k) * f(t_k, y_k)`` (torchdiffeq
    ``FixedGridODESolver.integrate`` + ``Euler._step_func``), and the output
    row 0 is the initial state.  Tuple states are supported the way the
    reference uses them (``dphysics.py:505-513``): a tuple in, a tuple of
    time-stacked tensors out."""
    import torch

    assert method == "euler", f"shim only implements euler, got {method!r}"
    y = tuple(y0)
    ys = [y]
    for k in range(len(t) - 1):
        dt = t[k + 1] - t[k]
        dy = func(t[k], y)
        y = tuple(yi + dt * dyi for yi, dyi in zip(y, dy))
        ys.append(y)
    return tuple(torch.stack([ys[k][i] for k in range(len(t))], dim=0)
                 for i in range(len(y0)))


def _stub_misc():
    if "torchdiffeq" not in sys.modules:
        m = types.ModuleType("torchdiffeq")
        m.odeint = _odeint_euler_shim
        sys.modules["torchdiffeq"] = m
    if "open3d" not in sys.modules:
        m = types.ModuleType("open3d")
        m.io = types.SimpleNamespace(read_triangle_mesh=None)
        m.geometry = types.SimpleNamespace(PointCloud=None)
        sys.modules["open3d"] = m
    if "efficientnet_pytorch" not in sys.modules:
        m = types.ModuleType("efficientnet_pytorch")
        m.EfficientNet = None  # CamEncode is never built in these tests
        sys.modules["efficientnet_pytorch"] = m


def load_reference():
    """Returns (torch, ref_utils, ref_lss, ref_dphys_cfg_module)."""
    _stub_misc()
    _stub_torchvision()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import torch
    from monoforce_tpu import robots as tpu_robots
    from monoforce.models.traj_predictor import dphys_config as ref_cfg_mod

    def _points_from_repo(robot, voxel_size=0.1, return_mesh=False):
        pts = tpu_robots.robot_point_cloud(robot, voxel_size=voxel_size)
        return torch.as_tensor(np.asarray(pts), dtype=torch.float32)

    ref_cfg_mod.get_points_from_robot_mesh = _points_from_repo

    from monoforce.models.terrain_encoder import utils as ref_utils
    from monoforce.models.terrain_encoder import lss as ref_lss
    return torch, ref_utils, ref_lss, ref_cfg_mod


def make_ref_lss_shell(ref_lss, torch, grid_conf, data_aug_conf,
                       downsample=16, camC=64, use_quickcumsum=True):
    """A reference ``LiftSplatShoot`` with ONLY the geometry attributes set
    (no CamEncode/BevEncode modules), enough to call create_frustum /
    get_geometry / voxel_pooling (reference lss.py:191-280) head-to-head."""
    from monoforce.models.terrain_encoder.utils import gen_dx_bx
    shell = ref_lss.LiftSplatShoot.__new__(ref_lss.LiftSplatShoot)
    torch.nn.Module.__init__(shell)
    shell.grid_conf = grid_conf
    shell.data_aug_conf = data_aug_conf
    dx, bx, nx = gen_dx_bx(grid_conf["xbound"], grid_conf["ybound"],
                           grid_conf["zbound"])
    shell.dx = dx
    shell.bx = bx
    shell.nx = nx
    shell.downsample = downsample
    shell.camC = camC
    shell.frustum = shell.create_frustum()
    shell.D = shell.frustum.shape[0]
    shell.use_quickcumsum = use_quickcumsum
    return shell


def load_reference_dphysics():
    """Returns (torch, ref_dphys_cfg_module, ref_dphysics_module) with this
    repo's procedural point clouds injected in place of the open3d mesh
    loader — the single definition shared by the head-to-head tests and
    ``scripts/make_golden.py`` (golden generation and tests must import the
    reference identically or parity gates compare different robots)."""
    _stub_misc()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import torch
    from monoforce_tpu import robots as tpu_robots
    from monoforce.models.traj_predictor import dphys_config as ref_cfg_mod

    def _points_from_repo(robot, voxel_size=0.1, return_mesh=False):
        assert not return_mesh
        pts = tpu_robots.robot_point_cloud(robot, voxel_size=voxel_size)
        return torch.as_tensor(np.asarray(pts), dtype=torch.float32)

    ref_cfg_mod.get_points_from_robot_mesh = _points_from_repo

    # Import dphysics only AFTER the patch: ``DPhysics.__init__``'s default
    # ``dphys_cfg=DPhysConfig()`` is evaluated at class-definition time and
    # would otherwise hit the open3d loader.
    from monoforce.models.traj_predictor import dphysics as ref_dphys_mod
    return torch, ref_cfg_mod, ref_dphys_mod


def load_reference_rough():
    """Returns (torch, ref_cfg_mod, ref_rough, ref_utils_mod) with the REAL
    reference dataset module (datasets/rough.py) importable — used by the
    real-data head-to-head tests against the committed
    ``config/data_sample`` sequences.  The torchvision stand-ins registered
    here are FUNCTIONAL (see ``_stub_torchvision``), so the reference's
    actual resize/normalize pipeline runs."""
    _stub_misc()
    _stub_torchvision()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import torch
    from monoforce_tpu import robots as tpu_robots
    from monoforce.models.traj_predictor import dphys_config as ref_cfg_mod

    def _points_from_repo(robot, voxel_size=0.1, return_mesh=False):
        assert not return_mesh
        pts = tpu_robots.robot_point_cloud(robot, voxel_size=voxel_size)
        return torch.as_tensor(np.asarray(pts), dtype=torch.float32)

    ref_cfg_mod.get_points_from_robot_mesh = _points_from_repo

    from monoforce import utils as ref_utils_mod
    from monoforce.datasets import rough as ref_rough
    return torch, ref_cfg_mod, ref_rough, ref_utils_mod
