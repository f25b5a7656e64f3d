"""Unified config system: dataclasses + YAML with ``extends`` and dotted CLI
overrides.

Replaces the reference's dual system (OmegaConf YAML at tgs/utils/config.py
+ JSON hand-config at config.py:80-121) with one mechanism (SURVEY.md §7.1):
dataclass-typed experiment configs, YAML files that may inherit via
``extends:``, and ``key.sub=value`` command-line overrides. A config+git-SHA
snapshot is written per run for reproducibility (config.py:96-121 parity).
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
from typing import Any, Dict, List, Optional, Tuple, get_origin, get_args

import yaml

from guassianhand_tpu.models.one_shot import OneShotConfig
from guassianhand_tpu.ops.rasterize import RasterizeConfig
from guassianhand_tpu.render.renderer import EditConfig, RendererConfig
from guassianhand_tpu.train.fit import FitConfig
from guassianhand_tpu.train.losses import LossWeights


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"          # "synthetic" | "interhand"
    data_root: str = "./processed_dataset"
    annot_path: str = "./InterHand2.6M/annotations"
    mano_models_path: Optional[str] = None
    mano_uv_path: Optional[str] = None
    height: int = 256
    width: int = 256
    edge_subdivide: int = 2             # subdivision levels (ref uses 2, +1 hd)
    pose_sequence: Optional[str] = None
    mask_sa: bool = True
    render_mask: bool = True
    color_jitter: bool = False          # one_shot.json "color_jitter"
    use_native_loader: bool = True
    # edit-mode dataset knobs (one_shot_avatar.json image_path/mask_path)
    edit: bool = False
    image_path: Optional[str] = None
    mask_path: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    expname: str = "one_shot"
    out_dir: str = "./EXPERIMENTS"
    seed: int = 0
    data: DataConfig = DataConfig()
    model: OneShotConfig = OneShotConfig()
    fit: FitConfig = FitConfig()
    edit: EditConfig = EditConfig()
    vgg_weights: Optional[str] = None
    lpips_weights: Optional[str] = None  # evaluator.py:16 lpips-alex ckpt
    pretrained: Optional[str] = None
    resume: bool = True


def _from_dict(cls, d: Dict[str, Any]):
    """Recursively build (possibly nested) dataclasses from plain dicts."""
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key '{k}' for {cls.__name__}")
        ftype = fields[k].type
        if isinstance(ftype, str):  # postponed annotations
            ftype = eval(ftype, globals())  # noqa: S307 - config module scope
        origin = get_origin(ftype)
        if origin is not None and type(None) in get_args(ftype):
            inner = [a for a in get_args(ftype) if a is not type(None)]
            ftype = inner[0] if inner else ftype
        if dataclasses.is_dataclass(ftype) and isinstance(v, dict):
            kwargs[k] = _from_dict(ftype, v)
        elif (origin in (tuple, Tuple) or ftype is tuple) and isinstance(v, list):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml_with_extends(path: str) -> Dict:
    with open(path) as f:
        d = yaml.safe_load(f) or {}
    ext = d.pop("extends", None)
    if ext:
        base = _load_yaml_with_extends(os.path.join(os.path.dirname(path), ext))
        d = _deep_merge(base, d)
    return d


def _parse_value(s: str) -> Any:
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return s


def apply_overrides(d: Dict, overrides: List[str]) -> Dict:
    """Apply 'a.b.c=value' dotted overrides."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override '{item}' is not key=value")
        key, val = item.split("=", 1)
        parts = key.split(".")
        cur = d
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _parse_value(val)
    return d


def load_config(path: Optional[str] = None,
                overrides: Optional[List[str]] = None) -> ExperimentConfig:
    d = _load_yaml_with_extends(path) if path else {}
    if overrides:
        d = apply_overrides(d, overrides)
    return _from_dict(ExperimentConfig, d)


def save_config_snapshot(cfg: ExperimentConfig, run_dir: str) -> str:
    """Dump merged config + git SHA for reproducibility."""
    os.makedirs(run_dir, exist_ok=True)
    snap = dataclasses.asdict(cfg)
    try:
        snap["git_head"] = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], text=True,
            stderr=subprocess.DEVNULL).strip()
    except Exception:
        snap["git_head"] = None
    path = os.path.join(run_dir, "config_snapshot.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(snap, f)
    return path
