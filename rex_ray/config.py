"""Layered pipeline configuration (reference semantics:
rex/utils/config.py:51-120 — ``-d`` defaults, repeated ``-c`` yaml
files, ``-a`` dotlist overrides; LATER layers override earlier ones).

Plain pyyaml + recursive dict merge (omegaconf is not in this
environment); dotlist values are yaml-parsed so ``-a min_score=0.5``
yields a float and ``-a tiers=[0.9,0.99]`` a list.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, Optional

import yaml


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    cur = cfg
    for k in keys[:-1]:
        nxt = cur.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[k] = nxt
        cur = nxt
    cur[keys[-1]] = value


def load_config(
    config_files: Optional[List[str]] = None,
    overrides: Optional[List[str]] = None,
    defaults: Optional[Dict] = None,
) -> Dict[str, Any]:
    """defaults <- yaml files (in order) <- ``key=value`` dotlist."""
    cfg: Dict[str, Any] = copy.deepcopy(defaults or {})
    for path in config_files or ():
        with open(path) as f:
            layer = yaml.safe_load(f) or {}
        if not isinstance(layer, dict):
            raise ValueError(f"config file {path} must map keys to values")
        cfg = _deep_merge(cfg, layer)
    for item in overrides or ():
        if "=" not in item:
            raise ValueError(f"override '{item}' is not key=value")
        key, raw = item.split("=", 1)
        _set_dotted(cfg, key.strip(), yaml.safe_load(raw))
    return cfg
