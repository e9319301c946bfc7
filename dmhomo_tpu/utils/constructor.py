"""Checkpoint-reconstructable model factories.

Parity target: `model_constructor` / `NetConstructor`
(HEM/utils_operations/model_constructor.py:5-66) — a decorator that records
how a network was built (factory name, module, args) so a checkpoint can
rebuild the exact architecture without out-of-band config.  The reference
ships it as part of its (unused) PDCNet loader path; we provide the same
capability JAX-style: flax modules are frozen dataclasses, so instead of
mutating the returned object we wrap it in a (module, constructor) record
and the constructor serializes to plain JSON next to an orbax checkpoint.

Usage:
    @model_constructor
    def build_estimator(crop_size=(320, 576)):
        return HomographyEstimator(EstimatorConfig(crop_size=crop_size))

    net = build_estimator(crop_size=(160, 288))
    net.constructor.save(ckpt_dir)        # writes constructor.json
    net2 = NetConstructor.load(ckpt_dir).get()   # identical architecture
"""

from __future__ import annotations

import dataclasses
import functools
import importlib
import json
import os
from typing import Any


@dataclasses.dataclass
class NetConstructor:
    """Record of a network factory call: re-imports the factory module and
    replays the call (reference NetConstructor.get, model_constructor.py:60-66).
    Args must be JSON-serializable (shipped factories take shapes/flags only).
    """

    fun_name: str
    fun_module: str
    args: tuple
    kwds: dict

    def get(self):
        net_module = importlib.import_module(self.fun_module)
        net_fun = getattr(net_module, self.fun_name)
        # the module attribute is the decorated factory, so the rebuilt net
        # carries a fresh .constructor too (ref model_constructor.py:60-66)
        return net_fun(*self.args, **self.kwds)

    def save(self, directory: str, name: str = "constructor.json") -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, name)
        with open(path, "w") as f:
            json.dump(
                {"fun_name": self.fun_name, "fun_module": self.fun_module,
                 "args": list(self.args), "kwds": self.kwds},
                f, indent=2,
            )
        return path

    @classmethod
    def load(cls, directory: str, name: str = "constructor.json") -> "NetConstructor":
        with open(os.path.join(directory, name)) as f:
            d = json.load(f)
        return cls(d["fun_name"], d["fun_module"], tuple(d["args"]), d["kwds"])


@dataclasses.dataclass
class ConstructedNet:
    """(module, constructor) pair; proxies attribute access to the module so
    call sites can treat it as the network itself (the reference attaches
    `.constructor` directly; flax modules are frozen, hence the wrapper)."""

    module: Any
    constructor: NetConstructor

    def __getattr__(self, item):
        return getattr(self.module, item)


def model_constructor(f):
    """Decorator: the wrapped factory's return value carries a `constructor`
    field that can rebuild the network (model_constructor.py:5-25).  Tuple
    returns attach to the first element, like the reference."""

    @functools.wraps(f)
    def f_wrapper(*args, **kwds):
        net_constr = NetConstructor(f.__name__, f.__module__, args, kwds)
        output = f(*args, **kwds)
        if isinstance(output, (tuple, list)):
            wrapped = type(output)(
                [ConstructedNet(output[0], net_constr), *output[1:]]
            )
            return wrapped
        return ConstructedNet(output, net_constr)

    return f_wrapper
