"""SAM checkpoint auto-download with local cache.

Mirrors the reference's fetch-on-demand behaviour
(22_segment_image_auto.py:24-38, 22_segment_image_manual.py:33-43): the
official checkpoints are pulled from dl.fbaipublicfiles.com into a local
``model/`` directory and reused on subsequent runs. Downloads stream to a
``.part`` file and rename on completion, so an interrupted fetch never
leaves a truncated checkpoint behind; offline environments get a clear
actionable error instead of a stack trace.
"""

from __future__ import annotations

import sys
import urllib.error
import urllib.request
from pathlib import Path

# Official checkpoint URLs (22_segment_image_auto.py:24-31).
SAM_CHECKPOINT_URLS: dict[str, str] = {
    "vit_b": "https://dl.fbaipublicfiles.com/segment_anything/"
             "sam_vit_b_01ec64.pth",
    "vit_l": "https://dl.fbaipublicfiles.com/segment_anything/"
             "sam_vit_l_0b3195.pth",
    "vit_h": "https://dl.fbaipublicfiles.com/segment_anything/"
             "sam_vit_h_4b8939.pth",
}

DEFAULT_CACHE_DIR = "model"  # the reference's checkpoint dir (22a:33)


class CheckpointUnavailable(RuntimeError):
    """Raised when the checkpoint is absent and cannot be downloaded."""


def checkpoint_path(variant: str = "vit_b",
                    cache_dir: str | Path = DEFAULT_CACHE_DIR) -> Path:
    url = SAM_CHECKPOINT_URLS[variant]
    return Path(cache_dir) / url.rsplit("/", 1)[1]


def ensure_checkpoint(variant: str = "vit_b",
                      cache_dir: str | Path = DEFAULT_CACHE_DIR,
                      quiet: bool = False) -> Path:
    """Return the local path of the SAM checkpoint, downloading it into
    ``cache_dir`` if missing (22a:33-38). Raises CheckpointUnavailable
    with a remedy message when offline."""
    if variant not in SAM_CHECKPOINT_URLS:
        raise KeyError(
            f"unknown SAM variant {variant!r}; "
            f"expected one of {sorted(SAM_CHECKPOINT_URLS)}")
    dest = checkpoint_path(variant, cache_dir)
    if dest.exists():
        return dest
    url = SAM_CHECKPOINT_URLS[variant]
    dest.parent.mkdir(parents=True, exist_ok=True)
    part = dest.with_suffix(dest.suffix + ".part")
    if not quiet:
        print(f"[rbod] downloading SAM {variant} checkpoint from {url} "
              f"-> {dest}", file=sys.stderr)
    try:
        with urllib.request.urlopen(url, timeout=30) as resp, \
                open(part, "wb") as f:
            total = int(resp.headers.get("Content-Length") or 0)
            done = 0
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                done += len(chunk)
                if not quiet and total:
                    pct = 100 * done / total
                    print(f"\r[rbod]   {done >> 20} MiB / {total >> 20} MiB"
                          f" ({pct:.0f}%)", end="", file=sys.stderr)
        if not quiet:
            print(file=sys.stderr)
        part.rename(dest)
        return dest
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        part.unlink(missing_ok=True)
        raise CheckpointUnavailable(
            f"SAM {variant} checkpoint is not cached at {dest} and the "
            f"download from {url} failed ({e}). Either place the official "
            f".pth there manually, pass --sam-checkpoint <path>, or run "
            f"once with network access."
        ) from e
