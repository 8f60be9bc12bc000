"""Lazy config system: executable-Python configs + ``LazyCall`` recipes +
dotted-path overrides + recursive instantiation.

TPU-native equivalent of the reference's detectron2-style system
(omni/config/lazy.py:19-353, instantiate.py:35-136, registry.py) with the
omegaconf dependency removed — recipes are plain dicts with a ``_target_``
key, which also makes them JSON-serializable into model configs (the
reference serializes plugin recipes into the HF config the same way,
configuration_dreamllm.py:36-61).

Semantics preserved:
  * configs are Python files that define a ``config`` object (LazyConfig.load
    :173-204) — full python expressiveness, no YAML sublanguage;
  * ``LazyCall(fn)(**kw)`` freezes a call without executing it (:19-60);
  * CLI overrides use dotted paths ``a.b.c=value`` with literal parsing
    (hydra-grammar subset covering what the reference's scripts use);
  * ``instantiate`` recursively builds ``_target_`` recipes (:35-136);
    ``deep_instantiate`` also descends plain mappings.
"""

from __future__ import annotations

import ast
import importlib
import pydoc
from typing import Any, Callable


TARGET_KEY = "_target_"


def locate(name: str) -> Any:
    """Resolve a dotted name to an object (reference registry.py locate)."""
    obj = pydoc.locate(name)
    if obj is None:
        # pydoc.locate can fail on nested attributes; walk manually
        parts = name.split(".")
        for i in range(len(parts) - 1, 0, -1):
            try:
                mod = importlib.import_module(".".join(parts[:i]))
            except ImportError:
                continue
            obj = mod
            try:
                for attr in parts[i:]:
                    obj = getattr(obj, attr)
                return obj
            except AttributeError:
                continue
        raise ImportError(f"cannot locate {name!r}")
    return obj


def _target_to_string(t: Callable) -> str:
    module = getattr(t, "__module__", None)
    qualname = getattr(t, "__qualname__", None) or getattr(t, "__name__", None)
    if not module or not qualname:
        raise ValueError(f"cannot serialize target {t!r}")
    return f"{module}.{qualname}"


class LazyCall:
    """``LazyCall(fn)(a=1)`` → ``{"_target_": "mod.fn", "a": 1}``."""

    def __init__(self, target: Callable | str):
        if not (callable(target) or isinstance(target, str)):
            raise TypeError(f"LazyCall target must be callable or str, got {target!r}")
        self.target = target

    def __call__(self, **kwargs) -> dict:
        t = self.target if isinstance(self.target, str) else _target_to_string(self.target)
        return {TARGET_KEY: t, **kwargs}


def instantiate(cfg: Any) -> Any:
    """Recursively build ``_target_`` recipes (reference instantiate.py:35)."""
    if isinstance(cfg, dict):
        if TARGET_KEY in cfg:
            kwargs = {k: instantiate(v) for k, v in cfg.items() if k != TARGET_KEY}
            target = cfg[TARGET_KEY]
            fn = locate(target) if isinstance(target, str) else target
            return fn(**kwargs)
        return {k: instantiate(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(v) for v in cfg)
    return cfg


# descending plain mappings is instantiate's default here; the reference's
# deep_instantiate distinction (instantiate.py:86) collapses away
deep_instantiate = instantiate


def _parse_value(s: str) -> Any:
    # hydra-grammar spellings first: a truthy string 'false' silently turns
    # boolean flags ON
    low = s.lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "none"):
        return None
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        return s  # bare string


def _set_dotted(cfg: Any, path: str, value: Any, *, create: bool = False):
    keys = path.split(".")
    cur = cfg
    for k in keys[:-1]:
        if isinstance(cur, dict):
            if k not in cur:
                if not create:
                    raise KeyError(f"override path {path!r}: missing key {k!r}")
                cur[k] = {}
            cur = cur[k]
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(k)]
        else:
            cur = getattr(cur, k)
    last = keys[-1]
    if isinstance(cur, dict):
        if last not in cur and not create:
            raise KeyError(f"override path {path!r}: missing key {last!r}")
        cur[last] = value
    elif isinstance(cur, list):
        cur[int(last)] = value
    else:
        setattr(cur, last, value)


def _get_dotted(cfg: Any, path: str) -> Any:
    cur = cfg
    for k in path.split("."):
        if isinstance(cur, dict):
            cur = cur[k]
        elif isinstance(cur, (list, tuple)):
            cur = cur[int(k)]
        else:
            cur = getattr(cur, k)
    return cur


class LazyConfig:
    """Load / override / save executable-Python configs."""

    @staticmethod
    def load(path: str) -> Any:
        """Execute ``path`` and return its ``config`` attribute
        (reference lazy.py:173-204)."""
        import os
        import types

        with open(path) as f:
            code = f.read()
        module = types.ModuleType("_lazy_config_")
        module.__file__ = os.path.abspath(path)
        exec(compile(code, path, "exec"), module.__dict__)
        if not hasattr(module, "config"):
            raise ValueError(f"config file {path} must define a `config` object")
        return module.config

    @staticmethod
    def apply_overrides(cfg: Any, overrides: list[str], *, allow_new: bool = False) -> Any:
        """``["a.b=3", "c='x'", "+new.key=1"]`` → mutated cfg (hydra-grammar
        subset: assignment and +new-key; reference lazy.py:218-240)."""
        for ov in overrides:
            if "=" not in ov:
                raise ValueError(f"override {ov!r} must be key=value")
            key, _, raw = ov.partition("=")
            key = key.strip()
            create = allow_new
            if key.startswith("+"):
                key = key[1:]
                create = True
            _set_dotted(cfg, key, _parse_value(raw.strip()), create=create)
        return cfg

    @staticmethod
    def get(cfg: Any, path: str, default: Any = None) -> Any:
        try:
            return _get_dotted(cfg, path)
        except (KeyError, AttributeError, IndexError):
            return default

    @staticmethod
    def to_py(cfg: Any, prefix: str = "config") -> str:
        """Serialize back to runnable Python (provenance snapshot, reference
        lazy.py:242-353)."""
        import pprint

        return f"{prefix} = {pprint.pformat(cfg, width=100, sort_dicts=False)}\n"

    @staticmethod
    def save(cfg: Any, path: str):
        with open(path, "w") as f:
            f.write(LazyConfig.to_py(cfg))
