"""Test-only mini-mmcv so the vendored reference mmseg modules import.

The reference text-focused-Transformers tree vendors only its *modified*
mmseg files (SURVEY.md §1B); mmcv itself is not installed in this image.
To use the reference `cascade_mit.py` / `segformer_head.py` as parity
oracles (exactly like the sys.path shims the other port-parity tests
use), this module installs a faithful, minimal mmcv surface into
sys.modules and loads the vendored files under a fake `mmseg` package.

Everything numeric delegates to torch built-ins (nn.Conv2d,
nn.MultiheadAttention, nn.LayerNorm, nn.BatchNorm2d, F.interpolate), so
the oracle's math is torch's, not ours. State-dict key layouts match
real mmcv (`attn.attn.in_proj_weight`, `convs.0.conv.weight`, ...), so
the same porters apply to real released checkpoints.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REF_SEG = "/root/reference/text-focused-Transformers"


# ---------------------------------------------------------------- mmcv bits

class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg
        self._is_init = False

    def init_weights(self):
        self._is_init = True


class ModuleList(nn.ModuleList):
    def __init__(self, modules=None, init_cfg=None):
        super().__init__(modules)
        self.init_cfg = init_cfg


class Sequential(nn.Sequential):
    def __init__(self, *args, init_cfg=None):
        super().__init__(*args)
        self.init_cfg = init_cfg


def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def build_norm_layer(cfg, num_features):
    cfg = dict(cfg)
    kind = cfg.pop("type")
    eps = cfg.pop("eps", 1e-5)
    cfg.pop("requires_grad", None)
    if kind == "LN":
        return "ln", nn.LayerNorm(num_features, eps=eps)
    if kind in ("BN", "BN2d", "SyncBN"):
        return "bn", nn.BatchNorm2d(num_features, eps=eps)
    raise ValueError(f"norm type {kind}")


def build_activation_layer(cfg):
    kind = dict(cfg)["type"]
    return {"GELU": nn.GELU, "ReLU": nn.ReLU, "Sigmoid": nn.Sigmoid}[kind]()


def build_conv_layer(cfg, *args, **kwargs):
    assert cfg is None or dict(cfg).get("type", "Conv2d") == "Conv2d"
    return nn.Conv2d(*args, **kwargs)


class DropPath(nn.Module):
    """timm-style stochastic depth (identity in eval mode)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


def build_dropout(cfg):
    if cfg is None:
        return nn.Identity()
    cfg = dict(cfg)
    kind = cfg.pop("type")
    if kind == "DropPath":
        return DropPath(cfg.get("drop_prob", 0.0))
    if kind == "Dropout":
        return nn.Dropout(cfg.get("drop_prob", 0.0))
    raise ValueError(kind)


class MultiheadAttention(BaseModule):
    """mmcv.cnn.bricks.transformer.MultiheadAttention surface: wraps
    torch nn.MultiheadAttention; subclasses override forward."""

    def __init__(self, embed_dims, num_heads, attn_drop=0.0, proj_drop=0.0,
                 dropout_layer=dict(type="Dropout", drop_prob=0.0),
                 init_cfg=None, batch_first=False, **kwargs):
        super().__init__(init_cfg)
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.batch_first = batch_first
        self.attn = nn.MultiheadAttention(embed_dims, num_heads, attn_drop,
                                          **kwargs)
        self.proj_drop = nn.Dropout(proj_drop)
        self.dropout_layer = (build_dropout(dropout_layer)
                              if dropout_layer else nn.Identity())


class ConvModule(nn.Module):
    """conv -> norm -> act; bias='auto' disables conv bias under a norm."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type="ReLU"), **kwargs):
        super().__init__()
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size, stride,
                              padding, dilation, groups, bias=bias)
        if self.with_norm:
            name, norm = build_norm_layer(norm_cfg, out_channels)
            self.add_module(name, norm)
            self._norm_name = name
        if self.with_activation:
            self.activate = build_activation_layer(act_cfg)

    def forward(self, x):
        x = self.conv(x)
        if self.with_norm:
            x = getattr(self, self._norm_name)(x)
        if self.with_activation:
            x = self.activate(x)
        return x


def _no_init(*args, **kwargs):
    pass


def _identity_decorator(*dargs, **dkwargs):
    def wrap(fn):
        return fn
    if len(dargs) == 1 and callable(dargs[0]) and not dkwargs:
        return dargs[0]
    return wrap


def resize(input, size=None, scale_factor=None, mode="nearest",
           align_corners=None, warning=True):
    return F.interpolate(input, size, scale_factor, mode, align_corners)


class _Registry:
    def register_module(self, *args, **kwargs):
        def wrap(cls):
            return cls
        if args and callable(args[0]):
            return args[0]
        return wrap


class _DummyLoss(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.loss_name = cfg.get("loss_name", "loss_ce")


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _scale_size(size, factor):
    w, h = size
    return int(w * factor + 0.5), int(h * factor + 0.5)


def rescale_size(old_size, scale, return_scale=False):
    """mmcv.image.geometric.rescale_size semantics: tuple scale bounds the
    long/short edges, aspect ratio preserved."""
    w, h = old_size
    if isinstance(scale, (float, int)):
        scale_factor = scale
    else:
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w),
                           max_short_edge / min(h, w))
    new_size = _scale_size((w, h), scale_factor)
    return (new_size, scale_factor) if return_scale else new_size


def imresize(img, size, return_scale=False, interpolation="bilinear"):
    import numpy as np
    from PIL import Image

    resample = (Image.NEAREST if interpolation == "nearest"
                else Image.BILINEAR)
    out = np.asarray(Image.fromarray(img).resize(size, resample))
    if not return_scale:
        return out
    h, w = img.shape[:2]
    return out, size[0] / w, size[1] / h


def imrescale(img, scale, return_scale=False, interpolation="bilinear"):
    h, w = img.shape[:2]
    new_size, factor = rescale_size((w, h), scale, return_scale=True)
    out = imresize(img, new_size, interpolation=interpolation)
    return (out, factor) if return_scale else out


def impad(img, *, shape=None, padding=None, pad_val=0, padding_mode="constant"):
    import numpy as np

    if shape is not None:
        ph = max(shape[0] - img.shape[0], 0)
        pw = max(shape[1] - img.shape[1], 0)
        padding = (0, 0, pw, ph)
    left, top, right, bottom = padding
    pads = ((top, bottom), (left, right)) + ((0, 0),) * (img.ndim - 2)
    return np.pad(img, pads, constant_values=pad_val)


def impad_to_multiple(img, divisor, pad_val=0):
    import math
    h = int(math.ceil(img.shape[0] / divisor)) * divisor
    w = int(math.ceil(img.shape[1] / divisor)) * divisor
    return impad(img, shape=(h, w), pad_val=pad_val)


def bgr2hsv(img):
    import cv2
    return cv2.cvtColor(img, cv2.COLOR_BGR2HSV)


def hsv2bgr(img):
    import cv2
    return cv2.cvtColor(img, cv2.COLOR_HSV2BGR)


def is_tuple_of(seq, expected_type):
    return isinstance(seq, tuple) and all(
        isinstance(s, expected_type) for s in seq)


def is_list_of(seq, expected_type):
    return isinstance(seq, list) and all(
        isinstance(s, expected_type) for s in seq)


def _load_file(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


_installed = {}


def install():
    """Install the fake mmcv/mmseg packages; returns a namespace of the
    loaded reference modules. Idempotent."""
    if _installed:
        return _installed["ns"]

    def digit_version(v):
        return tuple(int(x) for x in v.split(".")[:3])

    _module("mmcv", __version__="1.5.0")
    _module("mmcv.utils", to_2tuple=to_2tuple)
    _module(
        "mmcv.cnn", Conv2d=nn.Conv2d, build_activation_layer=
        build_activation_layer, build_norm_layer=build_norm_layer,
        build_conv_layer=build_conv_layer, ConvModule=ConvModule)
    _module("mmcv.cnn.bricks")
    _module("mmcv.cnn.bricks.drop", build_dropout=build_dropout,
            DropPath=DropPath)
    _module("mmcv.cnn.bricks.transformer",
            MultiheadAttention=MultiheadAttention)
    _module("mmcv.cnn.utils")
    _module("mmcv.cnn.utils.weight_init", constant_init=_no_init,
            normal_init=_no_init, trunc_normal_init=_no_init,
            kaiming_init=_no_init)
    _module("mmcv.runner", BaseModule=BaseModule, ModuleList=ModuleList,
            Sequential=Sequential, auto_fp16=_identity_decorator,
            force_fp32=_identity_decorator, load_checkpoint=_no_init)
    _module("mmcv.runner.base_module", BaseModule=BaseModule,
            ModuleList=ModuleList, Sequential=Sequential)

    _module("mmseg", digit_version=digit_version,
            mmcv_version=digit_version("1.5.0"))
    _module("mmseg.ops", resize=resize, Upsample=nn.Upsample)
    _module("mmseg.core", build_pixel_sampler=lambda *a, **k: None)
    _module("mmseg.models")
    _module("mmseg.models.builder", BACKBONES=_Registry(), HEADS=_Registry(),
            LOSSES=_Registry(), build_loss=lambda cfg: _DummyLoss(cfg))
    _module("mmseg.models.backbones")
    _module("mmseg.models.decode_heads")

    shape = _load_file("mmseg.models.utils.shape_convert",
                       f"{REF_SEG}/mmseg/models/utils/shape_convert.py")
    embed = _load_file("mmseg.models.utils.embed",
                       f"{REF_SEG}/mmseg/models/utils/embed.py")
    _module("mmseg.models.utils", PatchEmbed=embed.PatchEmbed,
            nchw_to_nlc=shape.nchw_to_nlc, nlc_to_nchw=shape.nlc_to_nchw)

    cascade = _load_file(
        "mmseg.models.backbones.cascade_mit",
        f"{REF_SEG}/mmseg/models/backbones/cascade_mit.py")

    _module("mmseg.models.losses", accuracy=lambda *a, **k: torch.tensor(0.0))
    decode_head = _load_file(
        "mmseg.models.decode_heads.decode_head",
        f"{REF_SEG}/mmseg/models/decode_heads/decode_head.py")
    segformer_head = _load_file(
        "mmseg.models.decode_heads.segformer_head",
        f"{REF_SEG}/mmseg/models/decode_heads/segformer_head.py")

    ns = types.SimpleNamespace(cascade_mit=cascade,
                               decode_head=decode_head,
                               segformer_head=segformer_head)
    _installed["ns"] = ns
    return ns


def load_transforms():
    """Load the VENDORED reference data pipeline
    (mmseg/datasets/pipelines/transforms.py) against the shim — the parity
    oracle for fudanocr_tpu.data.seg_pipeline geometry (Resize keep_ratio,
    Pad pad_val/seg_pad_val). Idempotent."""
    if "transforms" in _installed:
        return _installed["transforms"]
    install()
    mmcv_mod = sys.modules["mmcv"]
    for name, fn in (("imresize", imresize), ("imrescale", imrescale),
                     ("impad", impad),
                     ("impad_to_multiple", impad_to_multiple),
                     ("bgr2hsv", bgr2hsv), ("hsv2bgr", hsv2bgr),
                     ("is_list_of", is_list_of)):
        setattr(mmcv_mod, name, fn)
    utils = sys.modules["mmcv.utils"]
    utils.deprecated_api_warning = _identity_decorator
    utils.is_tuple_of = is_tuple_of
    _module("mmseg.datasets")
    _module("mmseg.datasets.builder", PIPELINES=_Registry())
    _module("mmseg.datasets.pipelines")
    transforms = _load_file(
        "mmseg.datasets.pipelines.transforms",
        f"{REF_SEG}/mmseg/datasets/pipelines/transforms.py")
    _installed["transforms"] = transforms
    return transforms
