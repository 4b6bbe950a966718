"""Router topology as REAL OS processes through the CLI (the DCN role).

The round-4 DCN test wired multihost helpers together by hand inside
worker scripts; this is its production rewrite (VERDICT r4 next #1):
two ``rbod gallery-server`` processes (one per "host") + one
``rbod gallery-router`` process, driven end-to-end through the same
``GalleryClient`` the pipelines use — ingest, tiered + filtered search,
deletes, per-shard snapshots on SIGTERM, and a full topology restart
that reloads shard state from disk.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.gallery.client import (
    GalleryClient,
    RemoteVectorStore,
)
from retrieval_based_object_detection_tpu.gallery.schema import (
    Filter,
    Payload,
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = (str(Path(__file__).resolve().parent.parent)
                         + os.pathsep + env.get("PYTHONPATH", ""))
    return env


def _wait_healthy(url: str, proc, timeout: float = 300.0):
    # Generous: each server pays a full jax import at startup, and a
    # 1-core CI host serialises them when several launch together.
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if proc.poll() is not None:
            raise AssertionError(
                f"process died: {proc.stderr.read().decode()[-2000:]}")
        try:
            with urllib.request.urlopen(f"{url}/healthz", timeout=5) as r:
                if json.loads(r.read()).get("status") == "ok":
                    return
        except OSError:
            time.sleep(0.25)
    raise AssertionError(f"{url} never became healthy")


def _spawn(args):
    return subprocess.Popen(
        [sys.executable, "-m", "retrieval_based_object_detection_tpu.cli",
         *args],
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def _stop(proc, timeout=60):
    if proc.poll() is None:
        proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=30)


@pytest.mark.slow
def test_cli_router_topology_end_to_end(tmp_path):
    ports = [_free_port() for _ in range(3)]
    shard_urls = [f"http://127.0.0.1:{p}" for p in ports[:2]]
    router_url = f"http://127.0.0.1:{ports[2]}"
    procs = []
    try:
        # Sequential spawn: concurrent jax imports on a small CI host
        # serialise anyway and risk the health timeout.
        for i in range(2):
            p = _spawn(
                ["gallery-server", "--store", str(tmp_path / f"shard{i}"),
                 "--host", "127.0.0.1", "--port", str(ports[i])])
            procs.append(p)
            _wait_healthy(shard_urls[i], p)
        procs.append(_spawn(
            ["gallery-router", "--shards", *shard_urls,
             "--host", "127.0.0.1", "--port", str(ports[2])]))
        _wait_healthy(router_url, procs[-1])

        # ---- ingest + search through the one client API
        store = RemoteVectorStore(router_url)
        store.create_collection("prod", dim=24)
        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(120, 24)).astype(np.float32)
        g = store.get("prod")
        g.upsert([f"p{i}" for i in range(120)], vecs,
                 [Payload(data_type="original_images",
                          class_name=("a" if i % 2 else "b"),
                          img_path=f"/i/{i}.png") for i in range(120)])
        assert g.count() == 120
        # Both shards hold a nonempty partition.
        parts = [GalleryClient(u, "prod").count() for u in shard_urls]
        assert sum(parts) == 120 and min(parts) > 20, parts

        hits = g.search(vecs[17], k=3, method="exact")[0]
        assert hits[0].id == "p17" and hits[0].score > 0.999
        hits = g.search(vecs[17], k=3,
                        flt=Filter(must={"class_name": "b"}))[0]
        assert all(h.payload.class_name == "b" for h in hits)
        assert g.delete(ids=["p17"]) == 1
        assert g.search(vecs[17], k=1, method="exact")[0][0].id != "p17"

        # ---- SIGTERM the topology: router broadcasts a final snapshot,
        # shards persist their roots.
        _stop(procs[2])
        _stop(procs[0])
        _stop(procs[1])
        for i in range(2):
            assert any((tmp_path / f"shard{i}").glob("*.rbod*")), \
                f"shard{i} did not snapshot on SIGTERM"

        # ---- full restart from per-shard snapshots
        ports2 = [_free_port() for _ in range(3)]
        shard_urls2 = [f"http://127.0.0.1:{p}" for p in ports2[:2]]
        procs2 = []
        try:
            for i in range(2):
                p = _spawn(
                    ["gallery-server",
                     "--store", str(tmp_path / f"shard{i}"),
                     "--host", "127.0.0.1", "--port", str(ports2[i])])
                procs2.append(p)
                _wait_healthy(shard_urls2[i], p)
            procs2.append(_spawn(
                ["gallery-router", "--shards", *shard_urls2,
                 "--host", "127.0.0.1", "--port", str(ports2[2])]))
            router2 = f"http://127.0.0.1:{ports2[2]}"
            _wait_healthy(router2, procs2[-1])

            g2 = GalleryClient(router2, "prod")
            assert g2.count() == 119  # p17 stayed deleted
            hits = g2.search(vecs[40], k=2, method="exact")[0]
            assert hits[0].id == "p40" and hits[0].score > 0.999
        finally:
            for p in procs2:
                _stop(p)
    finally:
        for p in procs:
            _stop(p)
