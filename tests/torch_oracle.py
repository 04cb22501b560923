"""Load the reference PyTorch V-FloodNet modules as a numerical ORACLE.

The reference code (`/root/reference`) is imported and *executed* — never
copied — so its random-initialised networks can serve as ground truth for
the converter + JAX graph (VERDICT round-1 item 1). Two of its dependencies
are absent in this environment and are stubbed here with plain-torch
equivalents of the public APIs:

- ``torchvision``: only ``models.resnet50`` is exercised by the reference
  encoders (video_module/model/AFB_URR.py:39-47,69-77). A standard
  torch ResNet-50 (Bottleneck, stride on the 3x3 conv, torchvision state
  dict naming: conv1/bn1/layerX.N.{conv,bn}{1..3}/downsample.{0,1}) is
  provided; only the attributes the reference touches (conv1, bn1, relu,
  maxpool, layer1-3) need to exist.
- ``torch_scatter.scatter_mean``: plain-torch scatter_add / count
  implementation (used at FeatureBank.py:78,92).

Everything here is torch-only and CPU-only; importing this module must not
initialise a JAX backend.
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn

REFERENCE = "/root/reference"


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet50(nn.Module):
    """torchvision-layout ResNet-50 trunk (stages the reference uses)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, stride=1)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        # torchvision tail — so Sequential(children[:-2]) keeps layer4
        # (METRO's torchvision-arch backbone slice)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, 1000)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(_Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)


def _resnet50(pretrained=False, **kwargs):
    assert not pretrained, "no pretrained weights in this environment"
    return _ResNet50()


def _scatter_mean(src, index, dim=-1, out=None, dim_size=None):
    """torch_scatter.scatter_mean: mean-reduce src into groups given by
    index; positions receiving nothing keep ``out``'s value."""
    if out is None:
        size = list(src.shape)
        size[dim] = dim_size if dim_size is not None else int(index.max()) + 1
        out = torch.zeros(size, dtype=src.dtype, device=src.device)
    sums = torch.zeros_like(out).scatter_add_(dim, index, src)
    cnt = torch.zeros_like(out).scatter_add_(dim, index,
                                             torch.ones_like(src))
    out.copy_(torch.where(cnt > 0, sums / cnt.clamp(min=1), out))
    return out


def _install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.resnet50 = _resnet50
        tv_tf = types.ModuleType("torchvision.transforms")
        tv_tf_f = types.ModuleType("torchvision.transforms.functional")
        tv_tf.functional = tv_tf_f
        tv.models = tv_models
        tv.transforms = tv_tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv_tf
        sys.modules["torchvision.transforms.functional"] = tv_tf_f
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_mean = _scatter_mean
        sys.modules["torch_scatter"] = ts


def variables_to_state_dict(variables, model: nn.Module, convert_fn):
    """INVERSE of a torch->flax converter, recovered generically by tagging:
    lets a checkpoint trained in this framework run in the reference oracle
    (trained-weight e2e parity without released weights).

    Two tagged conversions discover the mapping without knowing the
    converter's internals: (1) per-tensor constant tags locate each torch
    tensor's block inside the converted tree; (2) per-tensor arange tags
    (exact in f32 — the largest AFB-URR tensor is ~2.4M < 2^24 elements)
    recover the within-block element permutation. Works for any converter
    that moves/transposes/concatenates whole tensors without mixing values.
    """
    import numpy as np

    sd = model.state_dict()
    keys = list(sd.keys())

    def flatten(node, path, out):
        if isinstance(node, dict):
            for kk, vv in node.items():
                flatten(vv, path + (kk,), out)
        else:
            out[path] = np.asarray(node)

    tag_const = {k: np.full(tuple(v.shape), float(i + 1), np.float32)
                 for i, (k, v) in enumerate(sd.items())}
    tag_order = {k: (np.arange(v.numel(), dtype=np.float32) + 1.0)
                 .reshape(tuple(v.shape)) for k, v in sd.items()}
    const_tree, order_tree, val_tree = {}, {}, {}
    flatten(convert_fn(tag_const), (), const_tree)
    flatten(convert_fn(tag_order), (), order_tree)
    flatten(variables, (), val_tree)

    new_sd = {}
    for i, k in enumerate(keys):
        t = float(i + 1)
        found = False
        for path, cleaf in const_tree.items():
            hit = cleaf == t
            if not hit.any():
                continue
            idx = np.nonzero(hit)
            sl = tuple(slice(int(a.min()), int(a.max()) + 1) for a in idx)
            assert bool(hit[sl].all()), f"{k}: non-contiguous block"
            order = order_tree[path][sl].ravel()
            n = sd[k].numel()
            assert order.shape[0] == n and \
                np.array_equal(np.sort(order), np.arange(1, n + 1)), \
                f"{k}: converter mixed values, tag inverse invalid"
            vals = np.asarray(val_tree[path][sl], np.float32).ravel()
            new_flat = np.empty(n, np.float32)
            new_flat[(order - 1.0).astype(np.int64)] = vals
            new_sd[k] = torch.from_numpy(
                new_flat.reshape(tuple(sd[k].shape))).to(sd[k].dtype)
            found = True
            break
        if not found:                    # untouched by the converter
            new_sd[k] = sd[k]            # (e.g. num_batches_tracked)
    return new_sd


def load_reference():
    """Import and return (AFB_URR module, FeatureBank module) from the
    reference tree, with dependency stubs installed."""
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import importlib
    # package __init__ re-exports shadow the submodule attributes; go
    # through sys.modules for the actual module objects
    importlib.import_module("video_module.model.AFB_URR")
    importlib.import_module("video_module.model.FeatureBank")
    return (sys.modules["video_module.model.AFB_URR"],
            sys.modules["video_module.model.FeatureBank"])
