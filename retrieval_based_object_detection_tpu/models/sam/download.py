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

from pathlib import Path

from retrieval_based_object_detection_tpu.utils.download import (
    DownloadError,
    fetch_with_cache,
)

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
    url = SAM_CHECKPOINT_URLS[variant]
    # The official release URLs carry no digest to pin (unlike CLIP's,
    # whose sha256 is embedded in the URL path).
    try:
        return fetch_with_cache(url, dest, quiet=quiet,
                                label=f"SAM {variant} checkpoint")
    except DownloadError as e:
        raise CheckpointUnavailable(
            f"SAM {variant} checkpoint is not cached at {dest} and the "
            f"download from {url} failed ({e}). Either place the official "
            f".pth there manually, pass --sam-checkpoint <path>, or run "
            f"once with network access."
        ) from e
