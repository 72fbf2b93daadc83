"""Config system mirroring the reference's Hydra semantics without Hydra
(not installed here): grouped defaults (model/datamodule/trainer/callbacks),
YAML config trees, and CLI dot-overrides.

Reference behavior reproduced (configs/config.yaml:1-25, README.md:106-126):
  * ``model=magnet_gnn`` swaps the whole model group config;
  * ``model.params.lr=1e-4`` overrides a leaf (YAML-parsed scalars);
  * ``seed=21`` overrides root keys.
"""
from __future__ import annotations

import copy
import os
from typing import Any

import yaml

DEFAULTS_DIR = os.path.join(os.path.dirname(__file__), "defaults")
GROUPS = ("model", "datamodule", "trainer", "callbacks")


class ConfigNode(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj

    def to_dict(self):
        return {
            k: v.to_dict() if isinstance(v, ConfigNode) else v
            for k, v in self.items()
        }


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _group_path(config_dir: str, group: str, name: str) -> str:
    return os.path.join(config_dir, group, f"{name}.yaml")


def _set_by_dots(cfg: dict, dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def _parse_value(raw: str) -> Any:
    val = yaml.safe_load(raw)
    # YAML 1.1 doesn't recognize '1e-4' as float; do it ourselves
    if isinstance(val, str):
        try:
            return int(val)
        except ValueError:
            pass
        try:
            return float(val)
        except ValueError:
            pass
    return val


def load_config(
    overrides: list[str] | None = None,
    config_dir: str | None = None,
    config_name: str = "config.yaml",
) -> ConfigNode:
    """Compose the root config + group defaults + CLI overrides."""
    config_dir = config_dir or DEFAULTS_DIR
    root = _load_yaml(os.path.join(config_dir, config_name))
    defaults = root.pop("defaults", {})
    overrides = list(overrides or [])

    # group selection overrides (e.g. model=magnet_gnn) first
    selections = dict(defaults)
    rest = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, raw = ov.split("=", 1)
        if key in GROUPS:
            selections[key] = raw
        else:
            rest.append((key, raw))

    cfg = dict(root)
    for group in GROUPS:
        name = selections.get(group)
        if name is None:
            continue
        path = _group_path(config_dir, group, str(name))
        cfg[group] = _load_yaml(path)

    for key, raw in rest:
        _set_by_dots(cfg, key, _parse_value(raw))

    return ConfigNode.wrap(cfg)


def save_config(cfg: ConfigNode, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)
