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

    def roi_align(input, boxes, output_size, spatial_scale=1.0,
                  sampling_ratio=-1, aligned=False):
        """Functional torchvision.ops.roi_align oracle in plain torch
        (paper semantics; adaptive ratio = ceil(bin) when sampling_ratio<=0).
        boxes: list of per-image (Ki, 4) xyxy tensors, or (K, 5) with batch
        index in column 0."""
        import torch as _t

        if isinstance(boxes, (list, tuple)):
            rois = []
            for bi, bx in enumerate(boxes):
                if len(bx):
                    idx = _t.full((len(bx), 1), float(bi), dtype=bx.dtype)
                    rois.append(_t.cat([idx, bx], dim=1))
            rois = (_t.cat(rois, 0) if rois
                    else _t.zeros(0, 5, dtype=input.dtype))
        else:
            rois = boxes
        out_h, out_w = ((output_size, output_size)
                        if isinstance(output_size, int) else output_size)
        n, c, h, w = input.shape
        r = rois.shape[0]
        out = _t.zeros(r, c, out_h, out_w, dtype=input.dtype)
        off = 0.5 if aligned else 0.0
        for ri in range(r):
            img = input[int(rois[ri, 0])]
            x1, y1, x2, y2 = (rois[ri, 1:] * spatial_scale - off).tolist()
            rw, rh = x2 - x1, y2 - y1
            if not aligned:
                rw, rh = max(rw, 1.0), max(rh, 1.0)
            bw, bh = rw / out_w, rh / out_h
            ry = sampling_ratio if sampling_ratio > 0 else max(
                int(-(-rh // out_h)), 1)
            rx = sampling_ratio if sampling_ratio > 0 else max(
                int(-(-rw // out_w)), 1)
            # sample grid (out_h*ry, out_w*rx), bilinear, zero outside [-1, H]
            sy = _t.tensor(
                [y1 + (oy + (k + 0.5) / ry) * bh
                 for oy in range(out_h) for k in range(ry)])
            sx = _t.tensor(
                [x1 + (ox + (k + 0.5) / rx) * bw
                 for ox in range(out_w) for k in range(rx)])
            vy = (sy >= -1.0) & (sy <= h)
            vx = (sx >= -1.0) & (sx <= w)
            syc = sy.clamp(0.0, h - 1)
            sxc = sx.clamp(0.0, w - 1)
            y0 = syc.floor().long()
            x0 = sxc.floor().long()
            y1i = (y0 + 1).clamp(max=h - 1)
            x1i = (x0 + 1).clamp(max=w - 1)
            ly = (syc - y0).to(input.dtype)
            lx = (sxc - x0).to(input.dtype)
            v = (img[:, y0][:, :, x0] * ((1 - ly)[:, None] * (1 - lx)[None, :])
                 + img[:, y0][:, :, x1i] * ((1 - ly)[:, None] * lx[None, :])
                 + img[:, y1i][:, :, x0] * (ly[:, None] * (1 - lx)[None, :])
                 + img[:, y1i][:, :, x1i] * (ly[:, None] * lx[None, :]))
            v = v * (vy[:, None] & vx[None, :]).to(input.dtype)
            v = v.view(c, out_h, ry, out_w, rx)
            out[ri] = v.sum(dim=(2, 4)) / (ry * rx)
        return out

    import torch.nn as tnn

    class StochasticDepth(tnn.Module):
        def __init__(self, p=0.0, mode="row"):
            super().__init__()

        def forward(self, x):
            return x

    ra.RoIAlign = RoIAlign
    ra.roi_align = roi_align
    # attribute access torchvision.ops.roi_align(...) must be the function
    # (as in real torchvision); `from torchvision.ops.roi_align import
    # RoIAlign` still resolves via sys.modules.
    ops.roi_align = roi_align
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

    # SAM2Transforms (model/utils/sam1_utils.py:16) scripts
    # nn.Sequential(Resize, Normalize), so these must be real scriptable
    # nn.Modules (they are never actually forwarded in tests - prompts are
    # transformed by pure-torch transform_coords).
    import torch as _torch

    class _Resize(tnn.Module):
        def __init__(self, size, **kw):
            super().__init__()
            self.size = [int(size), int(size)] if isinstance(size, int) else [
                int(s) for s in size
            ]

        def forward(self, x):
            return _torch.nn.functional.interpolate(
                x.unsqueeze(0), size=self.size, mode="bilinear",
                align_corners=False, antialias=True,
            ).squeeze(0)

    class _Normalize(tnn.Module):
        def __init__(self, mean, std, **kw):
            super().__init__()
            self.mean = _torch.tensor(mean).view(-1, 1, 1)
            self.std = _torch.tensor(std).view(-1, 1, 1)

        def forward(self, x):
            return (x - self.mean) / self.std

    class _ToTensor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            import numpy as _np

            arr = _np.asarray(x)
            t = _torch.from_numpy(arr.copy())
            if t.ndim == 3:
                t = t.permute(2, 0, 1)
            if t.dtype == _torch.uint8:
                t = t.float() / 255.0
            return t

    transforms.Resize = _Resize
    transforms.Normalize = _Normalize
    transforms.ToTensor = _ToTensor
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


def install_torchmetrics_stub():
    """torchmetrics is absent; the reference losses only use binary
    f1_score as a diagnostic metric (never in the core loss)."""
    if "torchmetrics" in sys.modules:
        return
    import torch

    tm = types.ModuleType("torchmetrics")
    functional = types.ModuleType("torchmetrics.functional")

    def f1_score(preds, target, task="binary", threshold=0.5):
        p = (preds >= threshold).long()
        t = target.long()
        tp = ((p == 1) & (t == 1)).sum().float()
        fp = ((p == 1) & (t == 0)).sum().float()
        fn = ((p == 0) & (t == 1)).sum().float()
        denom = 2 * tp + fp + fn
        return torch.where(denom > 0, 2 * tp / denom, torch.tensor(0.0))

    functional.f1_score = f1_score
    tm.functional = functional
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.functional"] = functional


def install_triton_focal_stub():
    """Replace sam3.train.loss.sigmoid_focal_loss (Triton kernels) with the
    equivalent plain-torch math (the reference's own triton=False fallback,
    loss_fns.py:157-170)."""
    name = "sam3.train.loss.sigmoid_focal_loss"
    if name in sys.modules:
        return
    import torch
    import torch.nn.functional as F

    mod = types.ModuleType(name)

    def triton_sigmoid_focal_loss(inputs, targets, alpha, gamma):
        prob = inputs.sigmoid()
        ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
        p_t = prob * targets + (1 - prob) * (1 - targets)
        loss = ce * ((1 - p_t) ** gamma)
        if alpha >= 0:
            loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
        return loss

    def triton_sigmoid_focal_loss_reduce(inputs, targets, alpha, gamma):
        return triton_sigmoid_focal_loss(inputs, targets, alpha, gamma).sum()

    mod.triton_sigmoid_focal_loss = triton_sigmoid_focal_loss
    mod.triton_sigmoid_focal_loss_reduce = triton_sigmoid_focal_loss_reduce
    sys.modules[name] = mod


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
