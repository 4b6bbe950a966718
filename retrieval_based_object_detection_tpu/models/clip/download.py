"""CLIP checkpoint auto-download with local cache.

Mirrors ``clip.load("ViT-B/32")``'s fetch-on-demand behaviour
(31_clip_embedding_and_save_vector.py:23-27): the official OpenAI
released checkpoints are pulled from openaipublic.azureedge.net into a
local ``model/`` directory, SHA256-verified against the hash embedded in
the release URL, and reused on subsequent runs. Offline environments get
an actionable error. Converted to JAX params by
``models.clip.convert.load_torch_checkpoint`` (TorchScript archives
handled).
"""

from __future__ import annotations

from pathlib import Path

from retrieval_based_object_detection_tpu.utils.download import (
    DownloadError,
    fetch_with_cache,
)

# Official release URLs — the sha256 is the first path component, as in
# openai/CLIP's clip/clip.py _MODELS table. ViT-B/32 is the one the
# reference uses (31:26); the B/16 and L/14 entries were transcribed
# offline — if one 404s, copy the URL from openai/CLIP's _MODELS table
# (the SHA check below protects integrity either way).
CLIP_CHECKPOINT_URLS: dict[str, str] = {
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/"
                "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58"
                "eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/"
                "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61"
                "988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/"
                "b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1"
                "737a03836/ViT-L-14.pt",
}

DEFAULT_CACHE_DIR = "model"


class CheckpointUnavailable(RuntimeError):
    """Raised when the checkpoint is absent and cannot be downloaded."""


def checkpoint_path(variant: str = "ViT-B/32",
                    cache_dir: str | Path = DEFAULT_CACHE_DIR) -> Path:
    url = CLIP_CHECKPOINT_URLS[variant]
    return Path(cache_dir) / url.rsplit("/", 1)[1]


def ensure_checkpoint(variant: str = "ViT-B/32",
                      cache_dir: str | Path = DEFAULT_CACHE_DIR,
                      quiet: bool = False) -> Path:
    """Return the local path of the official CLIP checkpoint, downloading
    and SHA256-verifying it if missing."""
    if variant not in CLIP_CHECKPOINT_URLS:
        raise KeyError(f"unknown CLIP variant {variant!r}; "
                       f"expected one of {sorted(CLIP_CHECKPOINT_URLS)}")
    dest = checkpoint_path(variant, cache_dir)
    url = CLIP_CHECKPOINT_URLS[variant]
    try:
        # The sha256 is the URL's second-to-last path component (the
        # openai/CLIP release convention) — verified before caching.
        return fetch_with_cache(url, dest,
                                expected_sha256=url.split("/")[-2],
                                quiet=quiet,
                                label=f"CLIP {variant} checkpoint")
    except DownloadError as e:
        raise CheckpointUnavailable(
            f"CLIP {variant} checkpoint is not cached at {dest} and the "
            f"download from {url} failed ({e}). Either place the official "
            f".pt there manually, pass --clip-checkpoint <path>, or run "
            f"once with network access."
        ) from e
