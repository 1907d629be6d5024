"""Hydra-style YAML config system (no hydra dependency).

Keeps the user surface of the reference (conf/ groups, ``+experiment=X``
overlays, ``a.b=v`` dotted overrides, ``${...}`` interpolation,
``_target_`` component specs — reference conf/default.yaml,
src/core/utils.py:92-233) with two deliberate changes:

* instantiation is REGISTRY-based: a ``_target_`` resolves through
  :data:`REGISTRY` (plus an alias table mapping the reference's torch
  target strings onto our components), or a dotted path inside the
  ``vsrlab_tpu`` package — never arbitrary import-by-string;
* the missing ``conf/train/data`` group of the reference (SURVEY.md §5
  Config row) is defined concretely in this repo's ``conf/`` tree.
"""

from __future__ import annotations

import copy
import importlib
import os
import re
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import yaml


class Config(dict):
    """dict with attribute access and deep merge/get/set by dotted path."""

    def __getattr__(self, key):
        try:
            v = self[key]
        except KeyError as e:
            raise AttributeError(key) from e
        return v

    def __setattr__(self, key, value):
        self[key] = value

    @staticmethod
    def _wrap(value):
        if isinstance(value, dict) and not isinstance(value, Config):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    @classmethod
    def from_dict(cls, d: Optional[dict]) -> "Config":
        return cls._wrap(d or {})

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, dict):
                nxt = Config()
                node[part] = nxt
            node = nxt
        node[parts[-1]] = Config._wrap(value)

    def merge(self, other: dict) -> "Config":
        """Deep-merge ``other`` into self (other wins). Lists replace."""
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), dict):
                self[k].merge(v)
            else:
                self[k] = Config._wrap(v)
        return self

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, Config) else v)
            for k, v in self.items()
        }


_INTERP = re.compile(r"\$\{([^}]+)\}")


def _resolve_interpolations(root: Config) -> None:
    """Resolve ``${a.b.c}`` and ``${oc.env:VAR[,default]}`` in-place."""

    def resolve_value(v, depth=0):
        if depth > 10:
            raise ValueError("interpolation cycle")
        if isinstance(v, str):
            m = _INTERP.fullmatch(v.strip())
            if m:  # full-string interpolation keeps the referent's type
                return resolve_ref(m.group(1), depth)
            return _INTERP.sub(
                lambda mm: str(resolve_ref(mm.group(1), depth)), v
            )
        return v

    def resolve_ref(expr: str, depth: int):
        expr = expr.strip()
        if expr.startswith("oc.env:"):
            rest = expr[len("oc.env:"):]
            name, _, default = rest.partition(",")
            val = os.environ.get(name.strip())
            if val is None:
                if default:
                    return yaml.safe_load(default)
                return ""
            return val
        ref = root.get_path(expr)
        return resolve_value(ref, depth + 1)

    def walk(node):
        if isinstance(node, dict):
            for k in list(node.keys()):
                node[k] = walk(node[k])
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        return resolve_value(node)

    walk(root)


def _load_yaml(path: Path) -> tuple[Config, bool]:
    """Load one YAML file; returns (config, is_global_package)."""
    text = path.read_text()
    is_global = bool(re.search(r"^#\s*@package\s+_global_", text, re.M))
    data = yaml.safe_load(text) or {}
    return Config.from_dict(data), is_global


def _apply_defaults(cfg: Config, cfg_dir: Path, group_prefix: str = ""):
    """Process a hydra-style ``defaults`` list: each ``{group: option}``
    loads ``<dir>/<group>/<option>.yaml`` into ``cfg[group]`` (recursively
    processing that file's own defaults). ``_self_``-style entries and
    ``override /path: option`` entries are handled."""
    defaults = cfg.pop("defaults", None)
    if not defaults:
        return []
    overrides = []
    for entry in defaults:
        if isinstance(entry, str):
            continue  # _self_ etc.
        ((key, option),) = entry.items()
        if option is None:
            continue
        key = str(key)
        if key.startswith("override "):
            overrides.append((key[len("override "):].lstrip("/").replace("/", "."), option))
            continue
        group_path = cfg_dir / key.replace(".", "/")
        f = group_path / f"{option}.yaml"
        if not f.exists():
            raise FileNotFoundError(f"config group file not found: {f}")
        sub, is_global = _load_yaml(f)
        sub_overrides = _apply_defaults(sub, group_path)
        overrides.extend(sub_overrides)
        if is_global:
            cfg.merge(sub)
        else:
            existing = cfg.get_path(key.replace("/", "."))
            if isinstance(existing, Config):
                existing.merge(sub)
            else:
                cfg.set_path(key.replace("/", "."), sub)
    return overrides


def load_config(
    config_dir: Union[str, Path, None] = None,
    name: str = "default",
    overrides: Sequence[str] = (),
) -> Config:
    """Compose a config: root file + defaults groups + experiment overlay
    + dotted CLI overrides + interpolation.

    Override syntax (the reference's user surface):
      * ``+experiment=basic`` — merge ``conf/experiment/basic.yaml`` at
        root (``@package _global_`` semantics);
      * ``train.data.batch_size=4`` — dotted set (value YAML-parsed).
    """
    if config_dir is None:
        config_dir = Path(__file__).resolve().parents[2] / "conf"
    config_dir = Path(config_dir)

    cfg, _ = _load_yaml(config_dir / f"{name}.yaml")
    group_overrides = _apply_defaults(cfg, config_dir)

    # experiment overlays first (they may carry their own group overrides)
    dotted: List[str] = []
    for ov in overrides:
        if ov.startswith("+experiment="):
            exp = ov.split("=", 1)[1]
            sub, _ = _load_yaml(config_dir / "experiment" / f"{exp}.yaml")
            exp_overrides = _apply_defaults(sub, config_dir)
            for path, option in exp_overrides:
                f = config_dir / path.replace(".", "/") / f"{option}.yaml"
                loaded, _ = _load_yaml(f)
                _apply_defaults(loaded, f.parent)
                cfg.set_path(path, loaded)
            cfg.merge(sub)
            cfg.set_path("experiment", exp)
        else:
            dotted.append(ov)

    for path, option in group_overrides:
        f = config_dir / path.replace(".", "/") / f"{option}.yaml"
        loaded, _ = _load_yaml(f)
        # process the group file's own defaults list (sub-groups like
        # conf/train/gan.yaml's `defaults: [data: default, ...]`) — the
        # experiment path above already does; without this the raw
        # `defaults` key leaks into the config and sub-groups stay unloaded
        _apply_defaults(loaded, f.parent)
        cfg.set_path(path, loaded)

    for ov in dotted:
        if "=" not in ov:
            raise ValueError(f"bad override (expected key=value): {ov}")
        key, _, val = ov.partition("=")
        cfg.set_path(key.lstrip("+"), yaml.safe_load(val))

    _resolve_interpolations(cfg)
    return cfg


# ---------------------------------------------------------------------------
# Registry-based instantiation
# ---------------------------------------------------------------------------

REGISTRY: Dict[str, Callable] = {}

# reference `_target_` strings accepted for config compatibility
ALIASES = {
    "vsrlab.vsr.models.RealBasicVSR.realbasicvsr.RealBasicVSR": "RealBasicVSR",
    "vsrlab.vsr.models.RealBasicVSR.modules.basicvsr.BasicVSR": "BasicVSR",
    "vsrlab.vsr.models.VRT.vrt.VRT": "VRT",
    "vsrlab.vsr.models.VRT.vrt.TinyVRT": "TinyVRT",
    "vsrlab.vsr.models.VRT.modules.spynet.SpyNet": "SpyNet",
    "torch.optim.Adam": "adam",
    "torch.optim.AdamW": "adamw",
    "torch.optim.lr_scheduler.CosineAnnealingLR": "cosine",
}


def register(name: str, fn: Callable = None):
    """Register a component under ``name`` (decorator or direct call)."""
    if fn is None:
        def deco(f):
            REGISTRY[name] = f
            return f
        return deco
    REGISTRY[name] = fn
    return fn


def resolve_target(target: str) -> Callable:
    if target in REGISTRY:
        return REGISTRY[target]
    if target in ALIASES and ALIASES[target] in REGISTRY:
        return REGISTRY[ALIASES[target]]
    if target.startswith("vsrlab_tpu."):
        module, _, attr = target.rpartition(".")
        return getattr(importlib.import_module(module), attr)
    raise KeyError(
        f"unknown _target_ {target!r}: register it or use a vsrlab_tpu path"
    )


def instantiate(cfg: Union[Config, dict], /, **kwargs):
    """Build the component described by ``cfg['_target_']`` with the
    remaining keys (and ``kwargs``) as constructor arguments."""
    if cfg is None:
        return None
    cfg = dict(cfg)
    target = cfg.pop("_target_")
    fn = resolve_target(target)
    args = {k: v for k, v in cfg.items() if not k.startswith("_")}
    args.update(kwargs)
    return fn(**args)
