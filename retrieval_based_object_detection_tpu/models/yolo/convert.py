"""Official YOLOv8 checkpoint → JAX pytree conversion.

The reference's labeling stage loads ``model/yolov8s.pt``
(11_dataset_labeling.py:10, 96-99) — an ultralytics training container:
a torch pickle whose ``"model"`` entry is a full ``DetectionModel``
MODULE OBJECT, so a plain ``torch.load`` needs the ultralytics package
installed just to unpickle it. This converter does not: a stub
unpickler materialises any unresolvable ``ultralytics.*`` class as an
inert state-holder, then the module graph is walked (``_modules`` /
``_parameters`` / ``_buffers``) to reconstruct the flat
``model.{i}.…`` state dict. Plain ``state_dict()`` saves and
``{"model": state_dict}`` containers load too.

Mapping is 1:1 with models/yolo/model.py's param tree (its layer list
mirrors the torch module numbering): convs move OIHW → HWIO; BN keeps
γ/β/mean/var; the DFL projection conv rides along. Config (variant
width/depth, class count, reg_max) is INFERRED from weight shapes, so
any v8 detect variant (n/s/m/l/x, custom nc) converts without being
told which it is.
"""

from __future__ import annotations

import io
import pickle
from pathlib import Path
from typing import Mapping

import numpy as np

from retrieval_based_object_detection_tpu.models.yolo.model import (
    SPEC,
    VARIANTS,
    YoloConfig,
)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


# ----------------------------------------------------- container loading
class _Stub:
    """Inert stand-in for an unimportable (ultralytics) class: accepts
    any pickled state, exposes it as attributes."""

    def __init__(self, *a, **kw):  # some classes pickle with ctor args
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return type(name, (_Stub,), {"__module__": module})


class _StubPickleModule:
    """pickle_module shim for torch.load: resolve what imports, stub the
    rest (the ultralytics model/trainer classes in official .pt files)."""

    Unpickler = _StubUnpickler

    @staticmethod
    def load(f, **kw):
        return _StubUnpickler(f, **kw).load()

    @staticmethod
    def loads(data, **kw):
        return _StubUnpickler(io.BytesIO(data), **kw).load()


def _walk_module(obj, prefix: str, out: dict) -> None:
    d = getattr(obj, "__dict__", None)
    if not isinstance(d, dict):
        return
    for k, v in (d.get("_parameters") or {}).items():
        if v is not None:
            out[prefix + k] = v
    for k, v in (d.get("_buffers") or {}).items():
        if v is not None:
            out[prefix + k] = v
    for k, v in (d.get("_modules") or {}).items():
        if v is not None:
            _walk_module(v, f"{prefix}{k}.", out)


def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Torch checkpoint → flat ``model.{i}.…`` → ndarray state dict.
    Accepts the official ultralytics container (module object under
    "model"), ``{"model": state_dict}``, or a bare state_dict."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False,
                     pickle_module=_StubPickleModule)
    if isinstance(obj, Mapping) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, Mapping):          # plain state_dict
        sd = dict(obj)
    else:                                 # (stubbed) module object
        sd = {}
        _walk_module(obj, "", sd)
        if not sd:
            raise ValueError(
                f"{path}: unpickled container has no module state — not "
                "an ultralytics detection checkpoint?")
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        out[k] = _np(v)
    if not any(k.startswith("model.0.conv") for k in out):
        raise ValueError(
            f"{path}: no 'model.0.conv.*' keys — expected the YOLOv8 "
            f"detect layout (got e.g. {sorted(out)[:3]})")
    return out


# -------------------------------------------------------------- conversion
def _conv_p(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = sd[f"{prefix}.conv.weight"]           # OIHW
    return {"w": np.transpose(w, (2, 3, 1, 0)),
            "bn": {"gamma": sd[f"{prefix}.bn.weight"],
                   "beta": sd[f"{prefix}.bn.bias"],
                   "mean": sd[f"{prefix}.bn.running_mean"],
                   "var": sd[f"{prefix}.bn.running_var"]}}


def _plain_conv_p(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]
    return {"w": np.transpose(w, (2, 3, 1, 0)),
            "b": sd[f"{prefix}.bias"]}


def _c2f_p(sd, i: int) -> dict:
    n = 0
    while f"model.{i}.m.{n}.cv1.conv.weight" in sd:
        n += 1
    return {
        "cv1": _conv_p(sd, f"model.{i}.cv1"),
        "cv2": _conv_p(sd, f"model.{i}.cv2"),
        "m": [{"cv1": _conv_p(sd, f"model.{i}.m.{j}.cv1"),
               "cv2": _conv_p(sd, f"model.{i}.m.{j}.cv2")}
              for j in range(n)],
    }


def infer_config(sd: Mapping[str, np.ndarray]) -> YoloConfig:
    """Variant geometry from weight shapes alone."""
    det = len(SPEC) - 1
    nc = sd[f"model.{det}.cv3.0.2.weight"].shape[0]
    reg4 = sd[f"model.{det}.cv2.0.2.weight"].shape[0]
    stem = sd["model.0.conv.weight"].shape[0]        # ch(64) = 64·w
    width = stem / 64.0
    # Depth from the first backbone C2f's bottleneck count: n(3).
    n2 = 0
    while f"model.2.m.{n2}.cv1.conv.weight" in sd:
        n2 += 1
    depth = n2 / 3.0
    # max_channels from the P5 conv: ch(1024) = min(1024, mc)·w.
    p5 = sd["model.7.conv.weight"].shape[0]
    mc = int(round(p5 / width))
    for cfg in VARIANTS.values():
        if (abs(cfg.width_mult - width) < 1e-6
                and cfg.n(3) == n2 and cfg.max_channels == mc):
            return YoloConfig(cfg.depth_mult, cfg.width_mult, mc,
                              num_classes=nc, reg_max=reg4 // 4)
    return YoloConfig(depth, width, mc, num_classes=nc,
                      reg_max=reg4 // 4)


def convert_state_dict(sd: Mapping[str, np.ndarray]
                       ) -> tuple[list, YoloConfig]:
    config = infer_config(sd)
    params: list = []
    for i, spec in enumerate(SPEC):
        kind = spec[0]
        if kind == "conv":
            params.append(_conv_p(sd, f"model.{i}"))
        elif kind == "c2f":
            params.append(_c2f_p(sd, i))
        elif kind == "sppf":
            params.append({"cv1": _conv_p(sd, f"model.{i}.cv1"),
                           "cv2": _conv_p(sd, f"model.{i}.cv2")})
        elif kind in ("upsample", "concat"):
            params.append({})
        elif kind == "detect":
            det = {"cv2": [], "cv3": [],
                   "dfl": sd[f"model.{i}.dfl.conv.weight"].reshape(
                       1, 1, config.reg_max, 1)}
            for s in range(3):
                det["cv2"].append([
                    _conv_p(sd, f"model.{i}.cv2.{s}.0"),
                    _conv_p(sd, f"model.{i}.cv2.{s}.1"),
                    _plain_conv_p(sd, f"model.{i}.cv2.{s}.2"),
                ])
                det["cv3"].append([
                    _conv_p(sd, f"model.{i}.cv3.{s}.0"),
                    _conv_p(sd, f"model.{i}.cv3.{s}.1"),
                    _plain_conv_p(sd, f"model.{i}.cv3.{s}.2"),
                ])
            params.append(det)
    return params, config


def load_torch_checkpoint(path: str | Path) -> tuple[list, YoloConfig]:
    """Official ``yolov8*.pt`` (or a state_dict save) → (params, config)."""
    return convert_state_dict(load_state_dict(path))
