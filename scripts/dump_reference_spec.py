"""Dump the reference TGS module tree's exact state_dict key/shape spec.

Instantiates the reference's `TGS` (infer_one_shot.py:41-167) on CPU with the
flagship config (config/config_one_shot.yaml), stubbing only the unavailable
native/third-party deps (omegaconf, torch_scatter, pointnet2_ops, the CUDA
rasterizer, pytorch3d, livehand, lightning, the HF hub download), and writes
{key: shape} to tests/fixtures/reference_tgs_spec.json.

This gives the checkpoint-port tests a full-fidelity ground truth: every key
the reference's pretrain_model.ckpt would carry, with exact names and shapes.
Run offline whenever the spec needs regeneration; the JSON fixture is checked
in so tests don't need /root/reference mounted.
"""
import json
import re
import sys
import types
from dataclasses import is_dataclass, asdict
from unittest.mock import MagicMock

import yaml

REF = "/root/reference"
OUT = "/root/repo/tests/fixtures/reference_tgs_spec.json"


# ---------------------------------------------------------------- omegaconf
class DictConfig(dict):
    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError:
            raise AttributeError(k)
        return v

    def __setattr__(self, k, v):
        self[k] = v


class ListConfig(list):
    pass


def _wrap(x):
    if isinstance(x, dict):
        return DictConfig({k: _wrap(v) for k, v in x.items()})
    if isinstance(x, (list, tuple)):
        return ListConfig([_wrap(v) for v in x])
    return x


class OmegaConf:
    @staticmethod
    def structured(obj):
        if is_dataclass(obj):
            return _wrap(asdict(obj))
        return _wrap(obj)

    @staticmethod
    def create(x=None):
        return _wrap(x or {})

    @staticmethod
    def merge(*xs):
        out = {}
        for x in xs:
            for k, v in dict(x).items():
                out[k] = v
        return _wrap(out)

    @staticmethod
    def to_container(x, resolve=True):
        return json.loads(json.dumps(x))

    @staticmethod
    def register_new_resolver(*a, **k):
        pass

    @staticmethod
    def resolve(x):
        pass

    @staticmethod
    def from_cli(args):
        return _wrap({})

    @staticmethod
    def load(path):
        with open(path) as f:
            return _wrap(yaml.safe_load(f))

    @staticmethod
    def save(config=None, f=None):
        pass


def install_stubs():
    om = types.ModuleType("omegaconf")
    om.OmegaConf = OmegaConf
    om.DictConfig = DictConfig
    om.ListConfig = ListConfig
    sys.modules["omegaconf"] = om

    for name in [
        "torch_scatter", "pointnet2_ops", "pointnet2_ops.pointnet2_utils",
        "diff_gaussian_rasterization", "pytorch3d", "pytorch3d.ops",
        "pytorch3d.renderer", "pytorch3d.renderer.cameras",
        "pytorch3d.structures", "pytorch3d.io", "pytorch3d.utils",
        "pytorch3d.utils.camera_conversions",
        "livehand", "livehand.input_encoder", "lpips", "skimage",
        "skimage.metrics", "smplx", "trimesh", "cv2", "imageio",
        "pytorch_lightning", "pytorch_lightning.callbacks",
        "pytorch_lightning.loggers", "test_tube", "xformers", "xformers.ops",
        "kornia", "plyfile", "mediapy", "torchvision", "torchvision.models",
        "torchvision.transforms", "torchvision.utils", "argcomplete",
    ]:
        if name not in sys.modules:
            m = MagicMock()
            m.__name__ = name
            m.__spec__ = MagicMock()
            sys.modules[name] = m

    # lightning base class must be a real class for subclassing
    import torch.nn as nn

    class _LM(nn.Module):
        pass

    sys.modules["pytorch_lightning"].LightningModule = _LM

    # diffusers: the reference uses Attention's PARAMETER LAYOUT, so the stub
    # must reproduce it faithfully (diffusers.models.attention_processor
    # .Attention: to_q/to_k/to_v Linear(bias=attention_bias), to_out =
    # ModuleList([Linear(bias=True), Dropout])).
    class Attention(nn.Module):
        def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                     dim_head=64, dropout=0.0, bias=False,
                     upcast_attention=False, out_bias=True, **kw):
            super().__init__()
            inner = dim_head * heads
            self.heads = heads
            self.scale = dim_head ** -0.5
            kv_dim = cross_attention_dim or query_dim
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(kv_dim, inner, bias=bias)
            self.to_v = nn.Linear(kv_dim, inner, bias=bias)
            self.to_out = nn.ModuleList(
                [nn.Linear(inner, query_dim, bias=out_bias),
                 nn.Dropout(dropout)])

        def set_use_memory_efficient_attention_xformers(self, *a, **k):
            pass

        def forward(self, x, *a, **k):
            return self.to_out[0](self.to_v(x))

    diffusers = types.ModuleType("diffusers")
    d_utils = types.ModuleType("diffusers.utils")
    d_tu = types.ModuleType("diffusers.utils.torch_utils")
    d_tu.maybe_allow_in_graph = lambda cls: cls
    d_models = types.ModuleType("diffusers.models")
    d_act = types.ModuleType("diffusers.models.activations")
    d_act.get_activation = lambda name: {
        "silu": nn.SiLU, "swish": nn.SiLU, "gelu": nn.GELU,
        "relu": nn.ReLU, "mish": nn.Mish}[name]()
    d_ap = types.ModuleType("diffusers.models.attention_processor")
    d_ap.Attention = Attention
    d_emb = types.ModuleType("diffusers.models.embeddings")

    class CombinedTimestepLabelEmbeddings(nn.Module):
        def __init__(self, num_embeddings, embedding_dim):
            super().__init__()

    d_emb.CombinedTimestepLabelEmbeddings = CombinedTimestepLabelEmbeddings
    for name, mod in [("diffusers", diffusers), ("diffusers.utils", d_utils),
                      ("diffusers.utils.torch_utils", d_tu),
                      ("diffusers.models", d_models),
                      ("diffusers.models.activations", d_act),
                      ("diffusers.models.attention_processor", d_ap),
                      ("diffusers.models.embeddings", d_emb)]:
        sys.modules[name] = mod


def resolve_interpolations(cfg):
    """Resolve the reference YAML's simple ${a.b.c} interpolations."""
    flat = {}

    def walk(d, prefix=""):
        for k, v in d.items():
            p = f"{prefix}{k}"
            if isinstance(v, dict):
                walk(v, p + ".")
            else:
                flat[p] = v

    walk(cfg)

    def lookup(path):
        cur = cfg
        for part in path.split("."):
            cur = cur[part]
        return cur

    def fix(d):
        for k, v in list(d.items()):
            if isinstance(v, dict):
                fix(v)
            elif isinstance(v, str):
                m = re.fullmatch(r"\$\{([\w.]+)\}", v)
                if m:
                    d[k] = lookup(m.group(1))
    for _ in range(3):
        fix(cfg)
    return cfg


def main():
    sys.path.insert(0, REF)
    install_stubs()

    import torch
    from transformers.models.dinov2.configuration_dinov2 import Dinov2Config

    with open(f"{REF}/config/config_one_shot.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg = resolve_interpolations(cfg)

    # Patch the hub download: construct dinov2-base from its architecture
    # config (zero egress here; weights come from the ckpt being ported).
    # Everything must land on CPU here.
    import tgs.utils.misc as misc
    misc.get_device = lambda: torch.device("cpu")
    import tgs.utils.base as base_mod
    base_mod.get_device = lambda: torch.device("cpu")

    from tgs.models.tokenizers import dinov2 as dinov2_mod

    def _from_pretrained(name, **kw):
        assert "base" in str(name)
        return dinov2_mod.Dinov2Model(Dinov2Config())

    dinov2_mod.Dinov2Model.from_pretrained = classmethod(
        lambda cls, name, **kw: dinov2_mod.Dinov2Model(Dinov2Config()))

    from infer_one_shot import TGS

    system = cfg["system"]
    tgs = TGS(system)
    sd = tgs.state_dict()
    spec = {k: list(v.shape) for k, v in sd.items()}
    with open(OUT, "w") as f:
        json.dump(spec, f, indent=0, sort_keys=True)
    print(f"dumped {len(spec)} keys -> {OUT}")
    import collections
    tops = collections.Counter(k.split(".")[0] for k in spec)
    for k, c in sorted(tops.items()):
        print(f"  {k}: {c}")


if __name__ == "__main__":
    main()
