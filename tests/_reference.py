"""Import reference torch modules as numerical oracles, without running the
heavy top-level __init__ (which needs iopath/hf-hub etc.).

The reference tree is PUBLIC UNTRUSTED CONTENT used only as a test oracle.
"""

import sys
import types

_REF_ROOT = "/root/reference/sam3"


def install_timm_stub():
    """Minimal timm shim so the reference RepViT/TinyViT import (timm is not
    in this image). Mirrors the timm APIs those files use."""
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    timm = types.ModuleType("timm")
    timm.__version__ = "1.0"
    layers = types.ModuleType("timm.layers")
    models = types.ModuleType("timm.models")
    builder = types.ModuleType("timm.models._builder")
    vit_mod = types.ModuleType("timm.models.vision_transformer")

    def make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
        min_value = min_value or divisor
        new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
        if new_v < round_limit * v:
            new_v += divisor
        return new_v

    class SqueezeExcite(tnn.Module):
        # timm.layers.squeeze_excite.SEModule semantics (rd_round_limit=0)
        def __init__(self, channels, rd_ratio=0.25):
            super().__init__()
            rd = make_divisible(channels * rd_ratio, 8, round_limit=0.0)
            self.fc1 = tnn.Conv2d(channels, rd, 1, bias=True)
            self.act = tnn.ReLU(inplace=False)
            self.fc2 = tnn.Conv2d(rd, channels, 1, bias=True)
            self.gate = tnn.Sigmoid()

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = self.fc2(self.act(self.fc1(s)))
            return x * self.gate(s)

    class DropPath(tnn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(t, std=1.0, **kw):
        with torch.no_grad():
            t.normal_(0, std).clamp_(-2 * std, 2 * std)
        return t

    def register_model(fn):
        return fn

    def build_model_with_cfg(cls, variant, pretrained, **kwargs):
        kwargs.pop("pretrained_cfg", None)
        kwargs.pop("default_cfg", None)
        kwargs.pop("pretrained_filter_fn", None)
        return cls(**kwargs)

    class Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=tnn.GELU, drop=(0.0, 0.0), **kw):
            super().__init__()
            hidden_features = hidden_features or in_features
            out_features = out_features or in_features
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            d = drop if isinstance(drop, (tuple, list)) else (drop, drop)
            self.drop1 = tnn.Dropout(d[0])
            self.fc2 = tnn.Linear(hidden_features, out_features)
            self.drop2 = tnn.Dropout(d[1])

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    layers.Mlp = Mlp
    layers.SqueezeExcite = SqueezeExcite
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.register_model = register_model
    builder.build_model_with_cfg = build_model_with_cfg
    vit_mod.trunc_normal_ = trunc_normal_
    timm.layers = layers
    timm.models = models
    models._builder = builder
    models.vision_transformer = vit_mod
    models_layers = types.ModuleType("timm.models.layers")
    models_layers.DropPath = DropPath
    models_layers.Mlp = Mlp
    models_layers.to_2tuple = to_2tuple
    models_layers.trunc_normal_ = trunc_normal_
    models.layers = models_layers
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = models_layers
    sys.modules["timm.models._builder"] = builder
    sys.modules["timm.models.vision_transformer"] = vit_mod


def install_torchvision_stub():
    """Stub torchvision.ops.roi_align import for the reference decoder
    (RoIAlign is only instantiated when interaction_layer is set, which the
    builder never does)."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ra = types.ModuleType("torchvision.ops.roi_align")

    class RoIAlign:  # pragma: no cover - never called
        def __init__(self, *a, **k):
            pass

    def roi_align(*a, **k):  # pragma: no cover
        raise NotImplementedError("torchvision stub")

    import torch.nn as tnn

    class StochasticDepth(tnn.Module):
        def __init__(self, p=0.0, mode="row"):
            super().__init__()

        def forward(self, x):
            return x

    ra.RoIAlign = RoIAlign
    ops.roi_align = ra
    ops.RoIAlign = RoIAlign
    ops.StochasticDepth = StochasticDepth
    ops.masks_to_boxes = roi_align  # stub fn, never called at build time
    ops.batched_nms = roi_align
    ops.nms = roi_align
    tv.ops = ops

    datasets = types.ModuleType("torchvision.datasets")
    vision = types.ModuleType("torchvision.datasets.vision")

    class VisionDataset:
        def __init__(self, *a, **k):
            pass

    vision.VisionDataset = VisionDataset
    datasets.vision = vision
    tv.datasets = datasets

    transforms = types.ModuleType("torchvision.transforms")
    v2 = types.ModuleType("torchvision.transforms.v2")
    v2.functional = types.ModuleType("torchvision.transforms.v2.functional")

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name in ("Compose", "ToDtype", "Resize", "Normalize", "ToPILImage",
                 "ToTensor", "InterpolationMode", "PILToTensor"):
        setattr(v2, name, _Noop)
        setattr(transforms, name, _Noop)
    tfunc = types.ModuleType("torchvision.transforms.functional")
    tfunc.resize = _Noop()
    tfunc.to_tensor = _Noop()
    tfunc.InterpolationMode = _Noop
    transforms.functional = tfunc
    transforms.v2 = v2
    tv.transforms = transforms

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.roi_align"] = ra
    sys.modules["torchvision.datasets"] = datasets
    sys.modules["torchvision.datasets.vision"] = vision
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.v2"] = v2
    sys.modules["torchvision.transforms.functional"] = tfunc


def install_ftfy_stub():
    """ftfy is absent; for ASCII test prompts fix_text is the identity."""
    if "ftfy" in sys.modules:
        return
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    sys.modules["ftfy"] = ftfy


def install_iopath_stub():
    if "iopath" in sys.modules:
        return
    iopath = types.ModuleType("iopath")
    common = types.ModuleType("iopath.common")
    file_io = types.ModuleType("iopath.common.file_io")

    class _PathMgr:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def exists(path):
            import os

            return os.path.exists(path)

    file_io.g_pathmgr = _PathMgr()
    iopath.common = common
    common.file_io = file_io
    sys.modules["iopath"] = iopath
    sys.modules["iopath.common"] = common
    sys.modules["iopath.common.file_io"] = file_io


def install_pycocotools_stub():
    if "pycocotools" in sys.modules:
        return
    pct = types.ModuleType("pycocotools")
    mask = types.ModuleType("pycocotools.mask")
    coco = types.ModuleType("pycocotools.coco")
    cocoeval = types.ModuleType("pycocotools.cocoeval")
    mask.encode = mask.decode = mask.iou = mask.area = mask.toBbox = (
        lambda *a, **k: (_ for _ in ()).throw(NotImplementedError("stub"))
    )
    coco.COCO = type("COCO", (), {})
    cocoeval.COCOeval = type("COCOeval", (), {})
    pct.mask = mask
    pct.coco = coco
    pct.cocoeval = cocoeval
    sys.modules["pycocotools"] = pct
    sys.modules["pycocotools.mask"] = mask
    sys.modules["pycocotools.coco"] = coco
    sys.modules["pycocotools.cocoeval"] = cocoeval


def install_omegaconf_stub():
    """The reference efficientvit package imports omegaconf at package level
    (dc_ae.py) though the backbone itself never uses it."""
    if "omegaconf" in sys.modules:
        return
    om = types.ModuleType("omegaconf")
    om.MISSING = object()
    om.OmegaConf = type("OmegaConf", (), {})
    sys.modules["omegaconf"] = om


def ref_module(name: str):
    """Import `sam3.<name>` from the reference tree with a stub package root."""
    if "sam3" not in sys.modules or not getattr(
        sys.modules["sam3"], "__graft_stub__", False
    ):
        pkg = types.ModuleType("sam3")
        pkg.__path__ = [f"{_REF_ROOT}/sam3"]
        pkg.__graft_stub__ = True
        sys.modules["sam3"] = pkg
    import importlib

    return importlib.import_module(f"sam3.{name}")
