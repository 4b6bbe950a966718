"""YOLOv8 family: graph parity vs torch, official-container conversion,
detector contract (VERDICT r4 next #3 — the labeling slot's official-
weight import path).

The torch reference here is an independent NCHW implementation of the
ultralytics v8 detect blocks (Conv=conv+BN(eps 1e-3)+SiLU, Bottleneck,
C2f, SPPF, decoupled DFL head), module-named so its ``state_dict()``
matches the official checkpoint layout exactly — the same weights must
produce the same raw heads and decoded boxes through the JAX graph.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from retrieval_based_object_detection_tpu.models.yolo import (  # noqa: E402
    VARIANTS,
    YoloDetector,
    init_params,
    predict,
)
from retrieval_based_object_detection_tpu.models.yolo import (  # noqa: E402
    model as Y,
)
from retrieval_based_object_detection_tpu.models.yolo.convert import (  # noqa: E402,E501
    convert_state_dict,
    infer_config,
    load_state_dict,
    load_torch_checkpoint,
)


# ------------------------------------------------- torch reference blocks
class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return nn.functional.silu(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut):
        super().__init__()
        self.cv1 = TConv(c, c, 3)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC2f(nn.Module):
    def __init__(self, c1, c2, n, shortcut):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1, 2 * self.c, 1)
        self.cv2 = TConv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            TBottleneck(self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        for m in self.m:
            y.append(m(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TSPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = TConv(c1, c_, 1)
        self.cv2 = TConv(c_ * 4, c2, 1)
        self.mp = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(self.mp(y[-1]))
        return self.cv2(torch.cat(y, 1))


class TDFL(nn.Module):
    """Ultralytics wraps the DFL projection conv (key dfl.conv.weight)."""

    def __init__(self, reg_max):
        super().__init__()
        self.conv = nn.Conv2d(reg_max, 1, 1, bias=False)
        with torch.no_grad():
            self.conv.weight.copy_(
                torch.arange(reg_max, dtype=torch.float32).view(
                    1, reg_max, 1, 1))


class TDetect(nn.Module):
    """Raw heads only (box DFL logits ++ class logits per scale)."""

    def __init__(self, nc, reg_max, chs):
        super().__init__()
        c2 = max(16, chs[0] // 4, reg_max * 4)
        c3 = max(chs[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(c, c2, 3), TConv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for c in chs)
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(c, c3, 3), TConv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for c in chs)
        self.dfl = TDFL(reg_max)

    def forward(self, feats):
        return [torch.cat((self.cv2[i](f), self.cv3[i](f)), 1)
                for i, f in enumerate(feats)]


class TYolo(nn.Module):
    """SPEC-composed torch model with ultralytics module numbering."""

    def __init__(self, cfg):
        super().__init__()
        layers, ch, c_prev = [], [], 3
        for spec in Y.SPEC:
            kind = spec[0]
            if kind == "conv":
                c_out = cfg.ch(spec[1])
                layers.append(TConv(c_prev, c_out, spec[2], spec[3]))
                c_prev = c_out
            elif kind == "c2f":
                c_out = cfg.ch(spec[1])
                layers.append(TC2f(c_prev, c_out, cfg.n(spec[2]), spec[3]))
                c_prev = c_out
            elif kind == "sppf":
                c_out = cfg.ch(spec[1])
                layers.append(TSPPF(c_prev, c_out, spec[2]))
                c_prev = c_out
            elif kind == "upsample":
                layers.append(nn.Upsample(scale_factor=2, mode="nearest"))
            elif kind == "concat":
                layers.append(nn.Identity())
                c_prev = c_prev + ch[spec[1]]
            elif kind == "detect":
                layers.append(TDetect(cfg.num_classes, cfg.reg_max,
                                      [ch[i] for i in spec[1]]))
            ch.append(c_prev)
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        saved = {}
        needed = {4, 6, 9, 12} | set(Y.SPEC[-1][1])
        for i, spec in enumerate(Y.SPEC):
            kind = spec[0]
            if kind == "concat":
                x = torch.cat([x, saved[spec[1]]], 1)
            elif kind == "detect":
                return self.model[i]([saved[s] for s in spec[1]])
            else:
                x = self.model[i](x)
            if i in needed:
                saved[i] = x


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                if m.out_channels == m.weight.shape[0]:
                    m.weight.normal_(0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.uniform_(0.6, 1.4, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.2, generator=g)
                m.running_var.uniform_(0.6, 1.4, generator=g)
    # DFL projection must stay 0..reg_max-1 (randomized above).
    det = model.model[-1]
    with torch.no_grad():
        det.dfl.conv.weight.copy_(torch.arange(
            det.dfl.conv.weight.shape[1], dtype=torch.float32).view(
                1, -1, 1, 1))
    return model


TINY = Y.YoloConfig(depth_mult=0.33, width_mult=0.25, max_channels=1024,
                    num_classes=7)


@pytest.fixture(scope="module")
def torch_and_jax():
    tm = _randomize(TYolo(TINY)).eval()
    params, config = convert_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    return tm, params, config


def test_convert_infers_config(torch_and_jax):
    _, _, config = torch_and_jax
    assert config.num_classes == 7
    assert config.reg_max == 16
    assert abs(config.width_mult - 0.25) < 1e-6
    assert config.n(3) == TINY.n(3)


def test_raw_head_parity_torch_vs_jax(torch_and_jax):
    tm, params, config = torch_and_jax
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        theads = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    import jax.numpy as jnp

    jheads = Y.forward_features(params, jnp.asarray(x), config)
    assert len(theads) == len(jheads) == 3
    for th, jh in zip(theads, jheads):
        t = th.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(jh), t, atol=2e-4,
                                   rtol=1e-3)


def test_decoded_boxes_match_independent_numpy_decode(torch_and_jax):
    tm, params, config = torch_and_jax
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    import jax.numpy as jnp

    boxes, cls = predict(params, jnp.asarray(x), config)
    with torch.no_grad():
        theads = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    # Independent decode of the TORCH heads.
    exp_boxes, exp_cls = [], []
    for th, stride in zip(theads, config.strides):
        t = th.permute(0, 2, 3, 1).numpy()
        B, H, W, _ = t.shape
        raw = t[..., :64].reshape(B, H * W, 4, 16)
        p = np.exp(raw - raw.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        dist = (p * np.arange(16)).sum(-1)
        cy, cx = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                             indexing="ij")
        cx, cy = cx.reshape(-1), cy.reshape(-1)
        exp_boxes.append(np.stack([
            (cx - dist[..., 0]) * stride, (cy - dist[..., 1]) * stride,
            (cx + dist[..., 2]) * stride, (cy + dist[..., 3]) * stride,
        ], -1))
        exp_cls.append(1 / (1 + np.exp(-t[..., 64:].reshape(B, H * W, -1))))
    np.testing.assert_allclose(np.asarray(boxes),
                               np.concatenate(exp_boxes, 1), atol=1e-2)
    np.testing.assert_allclose(np.asarray(cls),
                               np.concatenate(exp_cls, 1), atol=1e-4)


def test_init_params_shapes_match_torch_state_dict(torch_and_jax):
    """init_params (the random-weight twin) produces the converted
    tree's exact shapes — so shape regressions in either side surface."""
    tm, params, config = torch_and_jax
    import jax

    ours = init_params(TINY, seed=0)
    la, lb = jax.tree_util.tree_leaves(ours), jax.tree_util.tree_leaves(
        params)
    assert len(la) == len(lb)
    assert [a.shape for a in la] == [b.shape for b in lb]


# -------------------------------------------- official container loading
def test_load_official_style_container_without_ultralytics(tmp_path):
    """The official yolov8s.pt pickles the ultralytics DetectionModel
    OBJECT. Recreate that container shape with throwaway module classes,
    unregister them, and load: the stub unpickler must recover the full
    state dict with no ultralytics import."""
    mod = types.ModuleType("ultralytics_fake_tasks")
    exec("import torch.nn as nn\n"
         "class DetectionModel(nn.Module):\n    pass\n", mod.__dict__)
    DetectionModel = mod.DetectionModel
    sys.modules["ultralytics_fake_tasks"] = mod
    try:
        dm = DetectionModel()
        dm.model = _randomize(TYolo(TINY)).model  # real layout underneath
        ckpt = {"model": dm, "epoch": -1,
                "train_args": {"imgsz": 640}}
        torch.save(ckpt, tmp_path / "yolov8_tiny.pt")
    finally:
        del sys.modules["ultralytics_fake_tasks"]

    sd = load_state_dict(tmp_path / "yolov8_tiny.pt")
    assert "model.0.conv.weight" in sd
    assert "model.22.dfl.conv.weight" in sd
    assert not any(k.endswith("num_batches_tracked") for k in sd)
    params, config = convert_state_dict(sd)
    assert config.num_classes == 7
    # And it runs.
    import jax.numpy as jnp

    boxes, cls = predict(
        params, jnp.zeros((1, 64, 64, 3), jnp.float32), config)
    assert np.isfinite(np.asarray(boxes)).all()


def test_load_plain_state_dict_checkpoint(tmp_path):
    tm = _randomize(TYolo(TINY))
    torch.save(tm.state_dict(), tmp_path / "sd.pt")
    params, config = load_torch_checkpoint(tmp_path / "sd.pt")
    assert config.num_classes == 7
    torch.save({"model": tm.state_dict()}, tmp_path / "wrapped.pt")
    params2, _ = load_torch_checkpoint(tmp_path / "wrapped.pt")
    np.testing.assert_array_equal(params[0]["w"], params2[0]["w"])


def test_load_rejects_non_yolo_checkpoint(tmp_path):
    torch.save({"foo": torch.zeros(3)}, tmp_path / "junk.pt")
    with pytest.raises(ValueError, match="model.0.conv"):
        load_state_dict(tmp_path / "junk.pt")


def test_infer_config_recognises_official_variants():
    for name, cfg in VARIANTS.items():
        sd = {
            "model.0.conv.weight": np.zeros((cfg.ch(64), 3, 3, 3)),
            "model.7.conv.weight": np.zeros(
                (cfg.ch(1024), cfg.ch(512), 3, 3)),
            "model.22.cv3.0.2.weight": np.zeros((80, 1, 1, 1)),
            "model.22.cv2.0.2.weight": np.zeros((64, 1, 1, 1)),
            **{f"model.2.m.{j}.cv1.conv.weight": np.zeros(1)
               for j in range(cfg.n(3))},
        }
        got = infer_config(sd)
        assert abs(got.width_mult - cfg.width_mult) < 1e-6, name
        assert got.n(6) == cfg.n(6), name
        assert got.max_channels == cfg.max_channels, name


# ----------------------------------------------------- detector contract
def test_nms_suppresses_and_class_offsets():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = Y.nms(boxes, scores, iou_threshold=0.45)
    assert list(keep) == [0, 2]
    # Same boxes, different classes: per-class NMS keeps both.
    probs = np.zeros((1, 3, 2), np.float32)
    probs[0, 0, 0] = 0.9
    probs[0, 1, 1] = 0.8
    probs[0, 2, 0] = 0.7
    out = Y.postprocess(boxes[None], probs, conf_threshold=0.25)
    assert out[0]["boxes"].shape[0] == 3  # overlap survives across classes


def test_yolo_detector_contract(tmp_path):
    det = YoloDetector(init_params(TINY, seed=0), TINY, image_size=64,
                       conf_threshold=0.0, max_det=4)
    imgs = (np.random.default_rng(0).uniform(size=(2, 64, 64, 3)) * 255
            ).astype(np.uint8)
    boxes, scores = det(imgs)
    assert boxes.shape == (2, 4, 4) and scores.shape == (2, 4)
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # conf-sorted
    with pytest.raises(ValueError, match="divisible by 32"):
        det(np.zeros((1, 65, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="divisible by 32"):
        YoloDetector(init_params(TINY, 0), TINY, image_size=100)


def test_cli_label_with_yolo_checkpoint(tmp_path):
    """`rbod label --detector yolo --detector-checkpoint <pt>` drives the
    download→convert→load→label chain on an official-format container —
    the reference's exact flow with its own asset (11:10, 96-99)."""
    from PIL import Image

    from retrieval_based_object_detection_tpu.cli.main import main

    tm = _randomize(TYolo(TINY)).eval()
    torch.save(tm.state_dict(), tmp_path / "yolov8_tiny.pt")
    d = tmp_path / "data" / "original_images" / "thing"
    d.mkdir(parents=True)
    img = (np.random.default_rng(0).uniform(size=(96, 96, 3)) * 255
           ).astype(np.uint8)
    Image.fromarray(img).save(d / "a.jpg")
    rc = main(["label", "--root", str(tmp_path / "data"),
               "--type", "original", "--detector", "yolo",
               "--detector-checkpoint", str(tmp_path / "yolov8_tiny.pt"),
               "--det-size", "64", "--conf", "0.0",
               "--max-objects", "2"])
    assert rc == 0
    label = (d / "a.txt").read_text().strip().splitlines()
    assert 1 <= len(label) <= 2
    vals = [float(v) for v in label[0].split()[1:]]
    assert all(0 <= v <= 1 for v in vals)


def test_cli_label_yolo_offline_is_actionable(tmp_path, monkeypatch):
    """No checkpoint + no network → exit 2 with the remedy message, not a
    stack trace (mirrors the CLIP/SAM offline behaviour)."""
    import io
    from contextlib import redirect_stderr

    from retrieval_based_object_detection_tpu.cli.main import main
    from retrieval_based_object_detection_tpu.utils import download as dl

    def _fail(url, dest, **kw):
        raise dl.DownloadError("offline test")

    monkeypatch.setattr(dl, "fetch_with_cache", _fail)
    d = tmp_path / "data" / "original_images" / "thing"
    d.mkdir(parents=True)
    monkeypatch.chdir(tmp_path)  # keep the model/ cache dir in tmp
    buf = io.StringIO()
    with redirect_stderr(buf):
        rc = main(["label", "--root", str(tmp_path / "data"),
                   "--type", "original", "--detector", "yolo"])
    assert rc == 2
    assert "model/yolov8s.pt" in buf.getvalue()
