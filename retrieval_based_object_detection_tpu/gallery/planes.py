"""Capacity-plane sidecar: persist the int4+bf16 serving planes.

The capacity tier's device planes (bf16 rescore mirror + packed int4 +
per-row scales — ``gallery/capacity.py``) are a deterministic function
of the snapshot rows, yet every restart rebuilt them from the f32 host
buffer: normalise + quantise on device, with a 4·N·D-byte f32 upload
(21.5 GB at the 10M flagship — the measured 646-913 s cold start,
DESIGN.md "capacity_10m"). This module persists the planes themselves
as a ``<name>.rbod.planes`` sidecar next to the base snapshot, so a
restart streams 2.5·N·D bytes (13.4 GB at 10M — 1.6× less transfer)
straight into the device buffers with no quantisation pass at all.

Validity is keyed on the snapshot identity: the header records the
base snapshot id and delta sequence the planes were computed at, and
the store uses the sidecar only when its live state matches exactly
(``Gallery._planes_sidecar_view``) — any later write falls back to the
chunked device build. A full base rewrite unlinks the sidecar
(``persist.save_gallery``).

Plane bytes are computed HOST-SIDE (``host_pack_planes`` — the NumPy
twin of ``search.pack_rows_int4`` + the device fill's normalise), so
writing the sidecar is a pure CPU+disk pass over the (possibly
memmap-backed) host rows: no device round trip, runnable offline
before deployment. Host- and device-built planes agree to bf16
rounding; the int4 codes are integer-identical (round-half-even both
sides) — parity-tested in tests/test_capacity_planes.py.

Role: the restart half of the capacity-tier story. The *build*-path
twin of this idea (upload host-quantised planes instead of f32 on
first build) was measured and rejected (DESIGN.md "capacity_10m",
rejected optimisation) — the restart path is different because the
quantise cost is paid once at save time, off the serving path.
"""

from __future__ import annotations

import json
import os
import struct
from pathlib import Path

import numpy as np

_MAGIC = b"RBP1"
_ALIGN = 8


def _bf16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def host_pack_planes(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """(bf16 [m, D], packed int4 [m, D/2] int8, scales [m] f32) from raw
    f32 rows — the NumPy twin of the device fill (capacity._fill_chunk:
    L2-normalise, bf16 cast) + search.pack_rows_int4 (per-row scale
    ``max|x|/7``, biased low nibble ``b = 16*hi + lo + 8``). np.round
    and jnp.round are both round-half-even, so the int4 codes match the
    device build exactly; the bf16 mirror matches to RTNE rounding."""
    rows = np.asarray(rows, np.float32)
    m, d = rows.shape
    if d % 2:
        raise ValueError("int4 packing needs an even dim")
    norm = np.sqrt(np.einsum("nd,nd->n", rows, rows,
                             dtype=np.float32))[:, None]
    rows = rows / np.maximum(norm, np.float32(1e-12))
    bf16 = rows.astype(_bf16_dtype())
    s = np.maximum(np.abs(rows).max(axis=1, keepdims=True),
                   np.float32(1e-12)) / np.float32(7.0)
    q = np.clip(np.round(rows / s), -8, 7).astype(np.int16)
    lo, hi = q[:, : d // 2], q[:, d // 2:]
    packed = (hi * 16 + lo + 8).astype(np.int8)
    return bf16, packed, s[:, 0].astype(np.float32)


def sidecar_path(root: str | Path, name: str) -> Path:
    return Path(root) / f"{name}.rbod.planes"


def write_planes(path: str | Path, vectors: np.ndarray, n: int, dim: int,
                 base_id: str, seq: int, chunk: int = 1 << 17) -> None:
    """Stream the planes of ``vectors[:n]`` into ``path`` (NOT atomic —
    callers write to a temp name and rename; persist.save_capacity_planes
    owns that protocol). The file is pre-sized and filled through
    memmapped sections, so peak RAM stays one chunk regardless of N."""
    path = Path(path)
    sizes = {"bf16": n * dim * 2, "packed": n * (dim // 2), "scales": n * 4}
    secmap, off = {}, 0
    for name in ("bf16", "packed", "scales"):
        secmap[name] = [off, sizes[name]]
        off = (off + sizes[name] + _ALIGN - 1) // _ALIGN * _ALIGN
    hdr = {"base_id": base_id, "seq": int(seq), "n": int(n),
           "dim": int(dim), "sections": secmap}
    js = json.dumps(hdr).encode()
    data_base = (8 + len(js) + _ALIGN - 1) // _ALIGN * _ALIGN
    total = data_base + off
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(js)))
        f.write(js)
        f.truncate(total)
    # bf16 is stored as raw uint16 bytes (memmap-safe regardless of
    # whether the installed NumPy accepts ml_dtypes in memmap mode).
    mm_b = np.memmap(path, np.uint16, mode="r+",
                     offset=data_base + secmap["bf16"][0], shape=(n, dim))
    mm_p = np.memmap(path, np.int8, mode="r+",
                     offset=data_base + secmap["packed"][0],
                     shape=(n, dim // 2))
    mm_s = np.memmap(path, np.float32, mode="r+",
                     offset=data_base + secmap["scales"][0], shape=(n,))
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        bf16, packed, scales = host_pack_planes(vectors[lo:hi])
        mm_b[lo:hi] = bf16.view(np.uint16)
        mm_p[lo:hi] = packed
        mm_s[lo:hi] = scales
    mm_b.flush()
    mm_p.flush()
    mm_s.flush()
    del mm_b, mm_p, mm_s
    # Durability matches the snapshot writer (rbod_native.cc fsync):
    # a renamed-in sidecar must not be torn by power loss.
    fd = os.open(path, os.O_RDWR)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def read_header(path: str | Path) -> dict:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"not a planes sidecar: {path}")
        (jlen,) = struct.unpack("<I", f.read(4))
        return json.loads(f.read(jlen).decode())


def open_sections(path: str | Path) -> tuple[dict, np.ndarray, np.ndarray,
                                             np.ndarray]:
    """(header, bf16 [n, D], packed [n, D/2], scales [n]) — read-only
    memmaps; pages fault in as the chunked upload walks them."""
    path = Path(path)
    hdr = read_header(path)
    n, dim = int(hdr["n"]), int(hdr["dim"])
    with open(path, "rb") as f:
        f.seek(4)
        (jlen,) = struct.unpack("<I", f.read(4))
    data_base = (8 + jlen + _ALIGN - 1) // _ALIGN * _ALIGN
    sec = hdr["sections"]
    mm_b = np.memmap(path, np.uint16, mode="r",
                     offset=data_base + sec["bf16"][0], shape=(n, dim)
                     ).view(_bf16_dtype())
    mm_p = np.memmap(path, np.int8, mode="r",
                     offset=data_base + sec["packed"][0],
                     shape=(n, dim // 2))
    mm_s = np.memmap(path, np.float32, mode="r",
                     offset=data_base + sec["scales"][0], shape=(n,))
    return hdr, mm_b, mm_p, mm_s
