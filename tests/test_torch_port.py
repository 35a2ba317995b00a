"""Torch-checkpoint porting tests.

efficientnet_pytorch/torchvision are not installed here, so the round-trip
test drives the port with a synthetic state_dict whose keys follow the
reference checkpoint naming (validated against ``expected_torch_keys``) and
whose values come from a flax init — the ported tree must reproduce the
flax variables exactly.  Primitive-level conversions (conv/depthwise/BN) are
verified numerically against plain ``torch.nn`` modules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoforce_tpu.models.terrain_encoder.torch_port import (
    expected_torch_keys, port_bn, port_conv, state_dict_to_variables,
)


def test_conv_port_matches_torch():
    import torch
    import torch.nn as tnn
    import flax.linen as fnn

    x = np.random.default_rng(0).normal(size=(2, 3, 8, 8)).astype(np.float32)
    conv = tnn.Conv2d(3, 5, 3, padding=1, bias=True)
    with torch.no_grad():
        y_t = conv(torch.from_numpy(x)).numpy()

    kernel = port_conv(conv.weight)
    fconv = fnn.Conv(5, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(kernel),
                         "bias": jnp.asarray(conv.bias.detach().numpy())}}
    y_f = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t,
                               atol=1e-5)


def test_depthwise_conv_port_matches_torch():
    import torch
    import torch.nn as tnn
    import flax.linen as fnn

    C = 6
    x = np.random.default_rng(1).normal(size=(2, C, 8, 8)).astype(np.float32)
    conv = tnn.Conv2d(C, C, 5, padding=2, groups=C, bias=False)
    with torch.no_grad():
        y_t = conv(torch.from_numpy(x)).numpy()
    fconv = fnn.Conv(C, (5, 5), padding=2, feature_group_count=C,
                     use_bias=False)
    params = {"params": {"kernel": jnp.asarray(port_conv(conv.weight))}}
    y_f = fconv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t,
                               atol=1e-5)


def test_bn_port_matches_torch_eval():
    import torch
    import torch.nn as tnn
    import flax.linen as fnn

    C = 4
    bn = tnn.BatchNorm2d(C)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(C) + 0.5)
        bn.bias.copy_(torch.rand(C))
        bn.running_mean.copy_(torch.rand(C))
        bn.running_var.copy_(torch.rand(C) + 0.5)
    bn.eval()
    x = np.random.default_rng(2).normal(size=(2, C, 4, 4)).astype(np.float32)
    with torch.no_grad():
        y_t = bn(torch.from_numpy(x)).numpy()

    sd = {"bn.weight": bn.weight, "bn.bias": bn.bias,
          "bn.running_mean": bn.running_mean,
          "bn.running_var": bn.running_var}
    p, s = port_bn("bn", sd)
    fbn = fnn.BatchNorm(use_running_average=True, epsilon=1e-5)
    y_f = fbn.apply({"params": p, "batch_stats": s},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_f).transpose(0, 3, 1, 2), y_t,
                               atol=1e-5)


def test_expected_keys_cover_reference_naming():
    keys = expected_torch_keys()
    # B0 has 16 blocks; block 0 has no expand conv
    assert "camencode.trunk._blocks.0._expand_conv.weight" not in keys
    assert "camencode.trunk._blocks.1._expand_conv.weight" in keys
    assert "camencode.trunk._blocks.15._project_conv.weight" in keys
    assert "bevencode.layer2.0.downsample.0.weight" in keys
    assert "bevencode.layer1.0.downsample.0.weight" not in keys
    assert "bevencode.up_friction.4.bias" in keys
    assert len(keys) == len(set(keys))


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    from monoforce_tpu.models import LiftSplatShoot
    grid = {"xbound": (-1.6, 1.6, 0.1), "ybound": (-1.6, 1.6, 0.1),
            "zbound": (-3.2, 3.2, 6.4), "dbound": (0.6, 2.2, 0.4)}
    aug = {"final_dim": (32, 64)}
    model = LiftSplatShoot(grid, aug)
    B, N = 1, 1
    args = (jnp.zeros((B, N, 3, 32, 64)),
            jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)), jnp.zeros((B, N, 3)),
            jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)),
            jnp.broadcast_to(jnp.eye(3), (B, N, 3, 3)), jnp.zeros((B, N, 3)))
    variables = model.init(jax.random.PRNGKey(0), *args)
    return model, variables, args


def _flax_to_torch_sd(variables):
    """Inverse mapping (test-side) used to synthesize a reference-style
    state_dict from flax variables."""
    p = variables["params"]
    s = variables["batch_stats"]
    sd = {}

    def inv_conv(leaf):
        return np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)

    def put_conv(tkey, leaf):
        sd[tkey + ".weight"] = inv_conv(leaf)
        if "bias" in leaf:
            sd[tkey + ".bias"] = np.asarray(leaf["bias"])

    def put_bn(tkey, pp, ss):
        sd[tkey + ".weight"] = np.asarray(pp["scale"])
        sd[tkey + ".bias"] = np.asarray(pp["bias"])
        sd[tkey + ".running_mean"] = np.asarray(ss["mean"])
        sd[tkey + ".running_var"] = np.asarray(ss["var"])

    from monoforce_tpu.models.terrain_encoder.torch_port import _B0_STAGES

    eff_p = p["camencode"]["EfficientNetB0_0"]
    eff_s = s["camencode"]["EfficientNetB0_0"]
    put_conv("camencode.trunk._conv_stem", eff_p["Conv_0"])
    put_bn("camencode.trunk._bn0", eff_p["BatchNorm_0"], eff_s["BatchNorm_0"])
    idx = 0
    for (expand, *_rest, repeats) in [(st[0], st[1], st[2], st[3], st[4])
                                      for st in _B0_STAGES]:
        for _ in range(repeats):
            bp = eff_p[f"MBConv_{idx}"]
            bs = eff_s[f"MBConv_{idx}"]
            t = f"camencode.trunk._blocks.{idx}"
            ci = bi = 0
            if expand != 1:
                put_conv(t + "._expand_conv", bp[f"Conv_{ci}"]); ci += 1
                put_bn(t + "._bn0", bp[f"BatchNorm_{bi}"],
                       bs[f"BatchNorm_{bi}"]); bi += 1
            put_conv(t + "._depthwise_conv", bp[f"Conv_{ci}"]); ci += 1
            put_bn(t + "._bn1", bp[f"BatchNorm_{bi}"],
                   bs[f"BatchNorm_{bi}"]); bi += 1
            put_conv(t + "._se_reduce", bp[f"Conv_{ci}"]); ci += 1
            put_conv(t + "._se_expand", bp[f"Conv_{ci}"]); ci += 1
            put_conv(t + "._project_conv", bp[f"Conv_{ci}"]); ci += 1
            put_bn(t + "._bn2", bp[f"BatchNorm_{bi}"],
                   bs[f"BatchNorm_{bi}"]); bi += 1
            idx += 1

    def put_up(tkey, pp, ss):
        for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
            cba_p = pp[f"ConvBNAct_{i}"]
            cba_s = ss[f"ConvBNAct_{i}"]
            put_conv(f"{tkey}.conv.{ci}", cba_p["Conv_0"])
            put_bn(f"{tkey}.conv.{bi}", cba_p["BatchNorm_0"],
                   cba_s["BatchNorm_0"])

    put_up("camencode.up1", p["camencode"]["Up_0"], s["camencode"]["Up_0"])
    put_conv("camencode.depthnet", p["camencode"]["Conv_0"])

    bev_p, bev_s = p["bevencode"], s["bevencode"]
    put_conv("bevencode.conv1", bev_p["Conv_0"])
    put_bn("bevencode.bn1", bev_p["BatchNorm_0"], bev_s["BatchNorm_0"])
    block_i = 0
    for layer, ds_first in ((1, False), (2, True), (3, True)):
        for j in range(2):
            bp = bev_p[f"BasicBlock_{block_i}"]
            bs = bev_s[f"BasicBlock_{block_i}"]
            t = f"bevencode.layer{layer}.{j}"
            put_conv(t + ".conv1", bp["Conv_0"])
            put_bn(t + ".bn1", bp["BatchNorm_0"], bs["BatchNorm_0"])
            put_conv(t + ".conv2", bp["Conv_1"])
            put_bn(t + ".bn2", bp["BatchNorm_1"], bs["BatchNorm_1"])
            if ds_first and j == 0:
                put_conv(t + ".downsample.0", bp["Conv_2"])
                put_bn(t + ".downsample.1", bp["BatchNorm_2"],
                       bs["BatchNorm_2"])
            block_i += 1
    put_up("bevencode.up1", bev_p["Up_0"], bev_s["Up_0"])
    for i, name in enumerate(("up_geom", "up_diff", "up_friction")):
        hp, hs = bev_p[f"_Head_{i}"], bev_s[f"_Head_{i}"]
        put_conv(f"bevencode.{name}.1", hp["Conv_0"])
        put_bn(f"bevencode.{name}.2", hp["BatchNorm_0"], hs["BatchNorm_0"])
        put_conv(f"bevencode.{name}.4", hp["Conv_1"])
    return sd


def test_state_dict_roundtrip_reproduces_flax_tree(tiny_model_and_vars):
    model, variables, args = tiny_model_and_vars
    sd = _flax_to_torch_sd(variables)
    # the synthesized dict uses exactly the reference checkpoint key set
    assert set(sd.keys()) == set(expected_torch_keys())

    ported = state_dict_to_variables(sd)
    ref_p = jax.tree_util.tree_leaves_with_path(variables["params"])
    new_p = dict(jax.tree_util.tree_leaves_with_path(ported["params"]))
    assert len(ref_p) == len(new_p)
    for path, leaf in ref_p:
        np.testing.assert_allclose(np.asarray(new_p[path]),
                                   np.asarray(leaf), atol=0,
                                   err_msg=jax.tree_util.keystr(path))
    ref_s = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
    new_s = dict(jax.tree_util.tree_leaves_with_path(ported["batch_stats"]))
    for path, leaf in ref_s:
        np.testing.assert_allclose(np.asarray(new_s[path]),
                                   np.asarray(leaf), atol=0)

    # the ported tree must run through the model
    out = model.apply(ported, *args)
    assert np.isfinite(np.asarray(out["terrain"])).all()


def test_pth_checkpoint_through_pipeline(tiny_model_and_vars, tmp_path):
    """torch.save'd reference-style checkpoint -> MonoForce pipeline."""
    import torch
    from monoforce_tpu.config import LSSConfig, PhysicsConfig
    from monoforce_tpu.pipeline import MonoForce

    model, variables, args = tiny_model_and_vars
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in _flax_to_torch_sd(variables).items()}
    p = tmp_path / "lss.pth"
    torch.save(sd, str(p))

    dcfg = PhysicsConfig(robot="tradr", traj_sim_time=0.5)
    dcfg.d_max = 1.6
    dcfg.n_sim_trajs = 4
    lss = LSSConfig(
        data_aug_conf={"H": 64, "W": 128, "final_dim": (32, 64),
                       "resize_lim": (0.5, 0.55), "bot_pct_lim": (0.0, 0.0),
                       "rot_lim": (0.0, 0.0), "rand_flip": False},
        grid_conf={"xbound": (-1.6, 1.6, 0.1), "ybound": (-1.6, 1.6, 0.1),
                   "zbound": (-3.2, 3.2, 6.4), "dbound": (0.6, 2.2, 0.4)})
    mf = MonoForce(dphys_cfg=dcfg, lss_cfg=lss)
    mf.load_torch_checkpoint(str(p))
    terrain, plan = mf.run(*args, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(plan.costs)).all()
    # outputs equal the original flax variables' outputs (same weights)
    direct = model.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(terrain["terrain"]),
                               np.asarray(direct["terrain"]), atol=1e-6)
