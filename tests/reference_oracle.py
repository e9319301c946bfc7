"""Test-only loader for the reference torch implementation (the parity oracle).

Stubs the reference's unavailable third-party deps (torchvision, timm,
kornia, ema_pytorch, accelerate, imageio) with minimal shims so its model
definitions import on CPU.  Used ONLY by parity tests, guarded on
/root/reference being mounted; never shipped as part of the framework.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "DGM"))


def _stub(name, **attrs):
    # Prefer the REAL package when it is importable (imageio, accelerate
    # are baked into this image): registering a fake — or overwriting real
    # attributes like imageio.mimsave — would corrupt the package for every
    # later test in the process (the stub leaks via sys.modules).
    try:
        import importlib

        mod = importlib.import_module(name)
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
        return mod
    except ImportError:
        pass
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def install_stubs():
    import torch
    import torch.nn as nn

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tv = _stub("torchvision")
    tv.transforms = _stub("torchvision.transforms", Compose=lambda *a, **k: None, ToTensor=object)
    tv.utils = _stub("torchvision.utils")
    _stub("timm")
    _stub("timm.models")
    _stub("timm.models.layers", DropPath=DropPath, to_2tuple=to_2tuple, trunc_normal_=trunc_normal_)
    _stub("kornia")
    _stub("kornia.geometry", warp_perspective=None)
    _stub("kornia.geometry.linalg", transform_points=None)
    _stub("ema_pytorch", EMA=object)

    class _A:
        pass

    _stub("accelerate", Accelerator=_A, DistributedDataParallelKwargs=_A, InitProcessGroupKwargs=_A)
    _stub("accelerate.utils", DistributedDataParallelKwargs=_A)
    _stub("imageio", get_writer=None, mimsave=None)
    ddp = _stub("denoising_diffusion_pytorch")
    ddp.version = _stub("denoising_diffusion_pytorch.version", __version__="0")

    for p in (os.path.join(REFERENCE_ROOT, "DGM"), os.path.join(REFERENCE_ROOT, "HEM"), REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)


def make_reference_unet(num_classes=5, dim=64, dim_mults=(1, 2, 4, 8), channels=6):
    install_stubs()
    from denoising_diffusion_models.classifier_free_guidance import Unet

    return Unet(dim=dim, dim_mults=dim_mults, channels=channels, num_classes=num_classes)


def make_reference_baseshomo(crop_size=(320, 576)):
    install_stubs()

    class P:
        pass

    params = P()
    params.crop_size = list(crop_size)
    from HEM.model import net as refnet

    return refnet.Net(params)


def make_reference_osnet(crop_size=(320, 576)):
    install_stubs()
    import json

    class P:
        pass

    params = P()
    with open(os.path.join(REFERENCE_ROOT, "HEM/experiments/params.json")) as f:
        for k, v in json.load(f).items():
            setattr(params, k, v)
    params.crop_size = list(crop_size)
    from HEM.model import net as refnet

    return refnet.Ms_Transformer(params=params)
