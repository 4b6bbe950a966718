"""Label review + quarantine/restore (the 12_*/13_* stages), UI-agnostic.

The reference implements human-in-the-loop QA as a cv2 keyboard app
(12_labeling_check.py): numbered boxes drawn on the image, digit keys pick
the correct box (label rewritten to that single box, 12:260-275), ``r``
re-detects with YOLO top-4 (12:143-164), ``m`` quarantines the image to
``dataset_manual/<class>/`` deleting its label (12:167-187), ``n``/``b``
navigate, and a resume file persists the last-reviewed image
(``saved_labeling_check_progress.txt``, 12:62, 199-206) which is deleted on
completion (12:322-323). 13_restore_manual_labeled.py moves image+label
pairs back, skipping images lacking a label (13:44-61).

Here the session logic is a library (drive it from a TUI, a web UI, or a
test); rendering returns arrays instead of opening windows.
"""

from __future__ import annotations

import dataclasses
import shutil
from pathlib import Path
from typing import Callable

import numpy as np

from retrieval_based_object_detection_tpu.pipelines.crop import (
    parse_yolo_label,
    yolo_to_xyxy,
)
from retrieval_based_object_detection_tpu.pipelines.labeling import (
    letterbox,
    yolo_lines,
)
from retrieval_based_object_detection_tpu.utils import tree

PROGRESS_FILE = "saved_labeling_check_progress.txt"


@dataclasses.dataclass
class ReviewConfig:
    root_dir: str = "dataset_jpeg"
    img_type: str = "original"
    classes: list[str] | None = None
    manual_dir: str = "dataset_manual"
    progress_file: str = PROGRESS_FILE
    redetect_top_k: int = 4  # 12:143-164 uses YOLO top-4
    suffixes: tuple[str, ...] = (".jpg", ".jpeg", ".png")


class ReviewSession:
    """Stateful review pass over every labeled image in scope."""

    def __init__(self, cfg: ReviewConfig,
                 detector: Callable | None = None):
        self.cfg = cfg
        self._detector = detector
        self.items: list[Path] = [
            e.path for e in tree.walk(cfg.root_dir, cfg.img_type,
                                      cfg.classes, cfg.suffixes)
            if e.path.with_suffix(".txt").exists()
        ]
        self.pos = 0
        self._resume()

    # ------------------------------------------------------------ state
    @property
    def current(self) -> Path | None:
        if 0 <= self.pos < len(self.items):
            return self.items[self.pos]
        return None

    @property
    def done(self) -> bool:
        return self.pos >= len(self.items)

    def _progress_path(self) -> Path:
        return Path(self.cfg.progress_file)

    def _resume(self) -> None:
        """Jump to the saved position if the file exists (12:199-206)."""
        p = self._progress_path()
        if p.exists():
            saved = p.read_text().strip()
            for i, item in enumerate(self.items):
                if str(item) == saved:
                    self.pos = i
                    break

    def _save_progress(self) -> None:
        if self.current is not None:
            self._progress_path().write_text(str(self.current))

    def _finish_if_done(self) -> None:
        """Delete the resume file once the pass completes (12:322-323)."""
        if self.done and self._progress_path().exists():
            self._progress_path().unlink()

    # ------------------------------------------------------------ data
    def boxes(self) -> list[tuple[int, int, int, int]]:
        """Current image's label boxes in pixel xyxy."""
        img = self.current
        if img is None:
            return []
        from PIL import Image

        with Image.open(img) as im:
            w, h = im.size
        return [yolo_to_xyxy(b, w, h)
                for b in parse_yolo_label(img.with_suffix(".txt"))]

    def render(self) -> np.ndarray:
        """Image with numbered boxes burned in (12:104-138) as an RGB
        array — UI-agnostic replacement for the cv2 window."""
        from PIL import Image, ImageDraw

        img = self.current
        assert img is not None
        with Image.open(img) as im:
            canvas = im.convert("RGB").copy()
        draw = ImageDraw.Draw(canvas)
        for i, (x1, y1, x2, y2) in enumerate(self.boxes()):
            draw.rectangle([x1, y1, x2, y2], outline=(255, 40, 40), width=3)
            draw.text((x1 + 4, max(0, y1 + 4)), str(i), fill=(255, 40, 40))
        return np.asarray(canvas)

    # ------------------------------------------------------------ actions
    def select_box(self, index: int) -> bool:
        """Keep only box ``index``: rewrite the label to that single line
        (12:260-275), then advance."""
        img = self.current
        if img is None:
            return False
        from PIL import Image

        boxes = self.boxes()
        if not (0 <= index < len(boxes)):
            return False
        with Image.open(img) as im:
            w, h = im.size
        label = parse_yolo_label(img.with_suffix(".txt"))[index]
        cls_id = label[0]
        img.with_suffix(".txt").write_text(
            yolo_lines(cls_id, np.asarray([boxes[index]], np.float64), w, h))
        self.next()
        return True

    def redetect(self) -> list[tuple[int, int, int, int]]:
        """Fresh detector proposals (top-K by confidence, 12:143-164) —
        returned as candidates; caller picks one via replace_label."""
        img = self.current
        if img is None or self._detector is None:
            return []
        from PIL import Image

        with Image.open(img) as im:
            arr = np.asarray(im.convert("RGB"))
        canvas, scale = letterbox(arr, 256)
        boxes, scores = self._detector(canvas[None])
        order = np.argsort(-scores[0])[: self.cfg.redetect_top_k]
        out = []
        for j in order:
            if scores[0][j] <= 0:
                continue
            b = np.clip(boxes[0][j] / scale, 0,
                        [arr.shape[1], arr.shape[0]] * 2)
            out.append(tuple(int(v) for v in b))
        return out

    def replace_label(self, box_xyxy: tuple[int, int, int, int],
                      class_id: int | None = None) -> None:
        """Overwrite the label with one box (post-redetect pick)."""
        img = self.current
        assert img is not None
        from PIL import Image

        with Image.open(img) as im:
            w, h = im.size
        if class_id is None:
            existing = parse_yolo_label(img.with_suffix(".txt"))
            class_id = existing[0][0] if existing else 0
        img.with_suffix(".txt").write_text(
            yolo_lines(class_id, np.asarray([box_xyxy], np.float64), w, h))

    def move_to_manual(self) -> Path | None:
        """Quarantine: delete the label, move the image to
        ``dataset_manual/<class>/`` (12:167-187), advance."""
        img = self.current
        if img is None:
            return None
        cls = img.parent.name
        dst_dir = Path(self.cfg.manual_dir) / cls
        dst_dir.mkdir(parents=True, exist_ok=True)
        label = img.with_suffix(".txt")
        if label.exists():
            label.unlink()
        dst = dst_dir / img.name
        shutil.move(str(img), dst)
        del self.items[self.pos]
        self._save_progress()
        self._finish_if_done()
        return dst

    def next(self) -> None:
        self.pos += 1
        self._save_progress()
        self._finish_if_done()

    def prev(self) -> None:
        self.pos = max(0, self.pos - 1)
        self._save_progress()


# ------------------------------------------------------------ restore (13)
@dataclasses.dataclass
class RestoreResult:
    n_restored: int
    n_skipped_no_label: int


def restore_manual_labeled(
    manual_dir: str = "dataset_manual",
    dst_root: str = "dataset_jpeg",
    img_type: str = "original",
) -> RestoreResult:
    """Move image+label pairs back from quarantine; images lacking a label
    stay put (13_restore_manual_labeled.py:44-61)."""
    n_restored = n_skipped = 0
    manual = Path(manual_dir)
    if not manual.is_dir():
        return RestoreResult(0, 0)
    for cls_dir in sorted(p for p in manual.iterdir() if p.is_dir()):
        dst_dir = tree.type_dir(dst_root, img_type) / cls_dir.name
        dst_dir.mkdir(parents=True, exist_ok=True)
        for img in sorted(cls_dir.iterdir()):
            if img.suffix.lower() not in (".jpg", ".jpeg", ".png"):
                continue
            label = img.with_suffix(".txt")
            if not label.exists():
                n_skipped += 1
                continue
            shutil.move(str(img), dst_dir / img.name)
            shutil.move(str(label), dst_dir / label.name)
            n_restored += 1
    return RestoreResult(n_restored=n_restored, n_skipped_no_label=n_skipped)
