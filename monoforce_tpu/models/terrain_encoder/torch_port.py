"""Port reference PyTorch LSS checkpoints into flax parameters.

The reference distributes trained ``LiftSplatShoot`` weights as torch
state_dicts (reference: lss.py:293-302 ``from_pretrained``; release zips per
docs/INSTALL.md).  This module maps those state_dicts — efficientnet_pytorch
B0 trunk + torchvision-style ResNet-18 BEV encoder + the custom heads — onto
:class:`monoforce_tpu.models.LiftSplatShoot`'s parameter tree.

Conventions converted:
- Conv2d weights  (O, I, kH, kW) -> (kH, kW, I, O); depthwise convs keep the
  same transpose (torch groups==C weights are (C, 1, kH, kW), flax
  ``feature_group_count=C`` kernels are (kH, kW, 1, C)),
- Linear (O, I) -> (I, O),
- BatchNorm weight/bias -> scale/bias params; running_mean/var ->
  batch_stats.

``state_dict_to_variables`` returns ``{"params": ..., "batch_stats": ...}``
ready for ``model.apply``.  Tensors may be torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["state_dict_to_variables", "port_conv", "port_bn",
           "expected_torch_keys"]

# EfficientNet-B0 stage table (must match efficientnet.B0_STAGES)
_B0_STAGES = ((1, 3, 1, 16, 1), (6, 3, 2, 24, 2), (6, 5, 2, 40, 2),
              (6, 3, 2, 80, 3), (6, 5, 1, 112, 3), (6, 5, 2, 192, 4),
              (6, 3, 1, 320, 1))


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def port_conv(weight) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)."""
    return _np(weight).transpose(2, 3, 1, 0)


def port_bn(prefix: str, sd) -> Tuple[Dict, Dict]:
    """(params, stats) for one BatchNorm from torch keys under ``prefix``."""
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def _conv(sd, key, bias=False):
    out = {"kernel": port_conv(sd[key + ".weight"])}
    if bias or (key + ".bias") in sd:
        if (key + ".bias") in sd:
            out["bias"] = _np(sd[key + ".bias"])
    return out


def _mbconv(sd, tprefix: str, expand: int):
    """One efficientnet_pytorch block -> one flax MBConv subtree."""
    p, s = {}, {}
    ci = bi = 0

    def add_conv(tkey, bias=False):
        nonlocal ci
        p[f"Conv_{ci}"] = _conv(sd, tkey, bias=bias)
        ci += 1

    def add_bn(tkey):
        nonlocal bi
        bp, bs = port_bn(tkey, sd)
        p[f"BatchNorm_{bi}"] = bp
        s[f"BatchNorm_{bi}"] = bs
        bi += 1

    if expand != 1:
        add_conv(tprefix + "._expand_conv")
        add_bn(tprefix + "._bn0")
    add_conv(tprefix + "._depthwise_conv")
    add_bn(tprefix + "._bn1")
    add_conv(tprefix + "._se_reduce", bias=True)
    add_conv(tprefix + "._se_expand", bias=True)
    add_conv(tprefix + "._project_conv")
    add_bn(tprefix + "._bn2")
    return p, s


def _efficientnet(sd, tprefix: str):
    p, s = {}, {}
    p["Conv_0"] = _conv(sd, tprefix + "._conv_stem")
    bp, bs = port_bn(tprefix + "._bn0", sd)
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    idx = 0
    for (expand, _k, _st, _ch, repeats) in _B0_STAGES:
        for _r in range(repeats):
            bp_, bs_ = _mbconv(sd, f"{tprefix}._blocks.{idx}", expand)
            p[f"MBConv_{idx}"], s[f"MBConv_{idx}"] = bp_, bs_
            idx += 1
    return p, s


def _convbnact(sd, conv_key, bn_key):
    p, s = {}, {}
    p["Conv_0"] = _conv(sd, conv_key)
    bp, bs = port_bn(bn_key, sd)
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    return p, s


def _up(sd, tprefix: str):
    """reference Up block: conv Sequential indices 0/1 (conv,bn) and 3/4."""
    p, s = {}, {}
    for i, (ck, bk) in enumerate(((f"{tprefix}.conv.0", f"{tprefix}.conv.1"),
                                  (f"{tprefix}.conv.3", f"{tprefix}.conv.4"))):
        pp, ss = _convbnact(sd, ck, bk)
        p[f"ConvBNAct_{i}"], s[f"ConvBNAct_{i}"] = pp, ss
    return p, s


def _basic_block(sd, tprefix: str, downsample: bool):
    p, s = {}, {}
    p["Conv_0"] = _conv(sd, tprefix + ".conv1")
    bp, bs = port_bn(tprefix + ".bn1", sd)
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    p["Conv_1"] = _conv(sd, tprefix + ".conv2")
    bp, bs = port_bn(tprefix + ".bn2", sd)
    p["BatchNorm_1"], s["BatchNorm_1"] = bp, bs
    if downsample:
        p["Conv_2"] = _conv(sd, tprefix + ".downsample.0")
        bp, bs = port_bn(tprefix + ".downsample.1", sd)
        p["BatchNorm_2"], s["BatchNorm_2"] = bp, bs
    return p, s


def _head(sd, tprefix: str):
    """reference head Sequential: 1=conv3x3, 2=bn, 4=conv1x1 (+bias)."""
    p, s = {}, {}
    p["Conv_0"] = _conv(sd, tprefix + ".1")
    bp, bs = port_bn(tprefix + ".2", sd)
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    p["Conv_1"] = _conv(sd, tprefix + ".4", bias=True)
    return p, s


def _bevencode(sd, tprefix: str):
    p, s = {}, {}
    p["Conv_0"] = _conv(sd, tprefix + ".conv1")
    bp, bs = port_bn(tprefix + ".bn1", sd)
    p["BatchNorm_0"], s["BatchNorm_0"] = bp, bs
    # layers 1-3, two blocks each; first block of layers 2/3 downsamples
    block_i = 0
    for layer, downsample_first in ((1, False), (2, True), (3, True)):
        for j in range(2):
            ds = downsample_first and j == 0
            bp_, bs_ = _basic_block(sd, f"{tprefix}.layer{layer}.{j}", ds)
            p[f"BasicBlock_{block_i}"], s[f"BasicBlock_{block_i}"] = bp_, bs_
            block_i += 1
    pp, ss = _up(sd, tprefix + ".up1")
    p["Up_0"], s["Up_0"] = pp, ss
    for i, name in enumerate(("up_geom", "up_diff", "up_friction")):
        pp, ss = _head(sd, f"{tprefix}.{name}")
        p[f"_Head_{i}"], s[f"_Head_{i}"] = pp, ss
    return p, s


def state_dict_to_variables(sd) -> Dict:
    """Full reference LSS state_dict -> flax variables for LiftSplatShoot."""
    sd = {k: v for k, v in sd.items()}
    cam_p, cam_s = {}, {}
    ep, es = _efficientnet(sd, "camencode.trunk")
    cam_p["EfficientNetB0_0"], cam_s["EfficientNetB0_0"] = ep, es
    up_p, up_s = _up(sd, "camencode.up1")
    cam_p["Up_0"], cam_s["Up_0"] = up_p, up_s
    cam_p["Conv_0"] = _conv(sd, "camencode.depthnet", bias=True)
    bev_p, bev_s = _bevencode(sd, "bevencode")
    params = {"camencode": cam_p, "bevencode": bev_p}
    stats = {"camencode": cam_s, "bevencode": bev_s}
    return {"params": params, "batch_stats": stats}


def expected_torch_keys():
    """The torch key set a reference B0 LSS checkpoint contains (for
    validation/debugging of partially mismatched checkpoints)."""
    keys = ["camencode.trunk._conv_stem.weight"]
    for stem in ("camencode.trunk._bn0",):
        keys += [f"{stem}.{s}" for s in
                 ("weight", "bias", "running_mean", "running_var")]
    idx = 0
    for (expand, _k, _st, _ch, repeats) in _B0_STAGES:
        for _r in range(repeats):
            b = f"camencode.trunk._blocks.{idx}"
            if expand != 1:
                keys.append(f"{b}._expand_conv.weight")
                keys += [f"{b}._bn0.{s}" for s in
                         ("weight", "bias", "running_mean", "running_var")]
            keys.append(f"{b}._depthwise_conv.weight")
            keys += [f"{b}._bn1.{s}" for s in
                     ("weight", "bias", "running_mean", "running_var")]
            keys += [f"{b}._se_reduce.weight", f"{b}._se_reduce.bias",
                     f"{b}._se_expand.weight", f"{b}._se_expand.bias",
                     f"{b}._project_conv.weight"]
            keys += [f"{b}._bn2.{s}" for s in
                     ("weight", "bias", "running_mean", "running_var")]
            idx += 1
    for up in ("camencode.up1",):
        for ci, bi in ((0, 1), (3, 4)):
            keys.append(f"{up}.conv.{ci}.weight")
            keys += [f"{up}.conv.{bi}.{s}" for s in
                     ("weight", "bias", "running_mean", "running_var")]
    keys += ["camencode.depthnet.weight", "camencode.depthnet.bias"]
    keys += ["bevencode.conv1.weight"]
    keys += [f"bevencode.bn1.{s}" for s in
             ("weight", "bias", "running_mean", "running_var")]
    for layer, ds_first in ((1, False), (2, True), (3, True)):
        for j in range(2):
            b = f"bevencode.layer{layer}.{j}"
            for c, bn in (("conv1", "bn1"), ("conv2", "bn2")):
                keys.append(f"{b}.{c}.weight")
                keys += [f"{b}.{bn}.{s}" for s in
                         ("weight", "bias", "running_mean", "running_var")]
            if ds_first and j == 0:
                keys.append(f"{b}.downsample.0.weight")
                keys += [f"{b}.downsample.1.{s}" for s in
                         ("weight", "bias", "running_mean", "running_var")]
    for ci, bi in ((0, 1), (3, 4)):
        keys.append(f"bevencode.up1.conv.{ci}.weight")
        keys += [f"bevencode.up1.conv.{bi}.{s}" for s in
                 ("weight", "bias", "running_mean", "running_var")]
    for head in ("up_geom", "up_diff", "up_friction"):
        keys.append(f"bevencode.{head}.1.weight")
        keys += [f"bevencode.{head}.2.{s}" for s in
                 ("weight", "bias", "running_mean", "running_var")]
        keys += [f"bevencode.{head}.4.weight", f"bevencode.{head}.4.bias"]
    return keys
