"""Utils: checkpointing, prefetch loader, config system, logging, tree."""

import time

import numpy as np
import pytest

from retrieval_based_object_detection_tpu.utils import config as cfg_lib
from retrieval_based_object_detection_tpu.utils import tree
from retrieval_based_object_detection_tpu.utils.loader import (
    PrefetchIterator,
    batched,
)
from retrieval_based_object_detection_tpu.utils.logging import (
    StageLogger,
    ThroughputTimer,
)


# ------------------------------------------------------------ loader
def test_prefetch_preserves_order():
    out = list(PrefetchIterator(range(20), lambda x: x * x, depth=3))
    assert out == [x * x for x in range(20)]


def test_prefetch_overlaps():
    """Producer works ahead while the consumer is busy."""
    def slow(x):
        time.sleep(0.02)
        return x

    t0 = time.perf_counter()
    for item in PrefetchIterator(range(10), slow, depth=2):
        time.sleep(0.02)  # consumer work in parallel with producer
    elapsed = time.perf_counter() - t0
    # Serial would be ~0.4s; overlapped ~0.22s.
    assert elapsed < 0.35, elapsed


def test_prefetch_propagates_errors():
    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    it = PrefetchIterator(range(10), boom, depth=2)
    got = []
    with pytest.raises(ValueError, match="boom"):
        for v in it:
            got.append(v)
    assert got == [0, 1, 2]


def test_batched():
    assert batched([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]


# ------------------------------------------------------------ checkpoint
def test_params_checkpoint_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    from retrieval_based_object_detection_tpu.utils import checkpoint as ck

    params = {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)),
              "nested": {"b": jnp.zeros(3)}}
    ck.save_params(params, tmp_path / "p")
    loaded = ck.load_params(tmp_path / "p", like=params)
    np.testing.assert_allclose(np.asarray(loaded["w"]),
                               np.asarray(params["w"]))


def test_train_checkpointer_resume(tmp_path, rng):
    import jax.numpy as jnp

    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        TrainCheckpointer,
    )

    state = {"step": jnp.asarray(0),
             "w": jnp.asarray(rng.normal(size=(2, 2)).astype(np.float32))}
    ck = TrainCheckpointer(tmp_path / "ckpt", keep=2)
    for s in (1, 2, 3):
        state = {**state, "step": jnp.asarray(s)}
        ck.save(s, state)
    assert ck.latest_step() == 3
    restored = ck.restore(state)
    assert int(restored["step"]) == 3
    ck.close()


# ------------------------------------------------------------ config
def test_config_json_roundtrip(tmp_path):
    from retrieval_based_object_detection_tpu.pipelines.crop import CropConfig

    cfg = CropConfig(src_root="a", margin_ratio=0.3)
    cfg_lib.save_config(cfg, tmp_path / "c.json")
    loaded = cfg_lib.load_config(CropConfig, tmp_path / "c.json")
    assert loaded.src_root == "a" and loaded.margin_ratio == 0.3
    with pytest.raises(KeyError):
        cfg_lib.merge_overrides(cfg, {"bogus": 1})
    assert cfg_lib.merge_overrides(cfg, {"img_type": "natural"}).img_type \
        == "natural"


def test_prompt_choice_validation_loop():
    answers = iter(["zzz", "17", "2"])
    printed = []
    out = cfg_lib.prompt_choice(
        "pick", ["alpha", "beta", "gamma"],
        input_fn=lambda _: next(answers), print_fn=printed.append)
    assert out == "beta"
    assert any("invalid" in p for p in printed)


def test_prompt_yes_no_default():
    assert cfg_lib.prompt_yes_no("q", default=True,
                                 input_fn=lambda _: "",
                                 print_fn=lambda _: None) is True
    answers = iter(["maybe", "n"])
    assert cfg_lib.prompt_yes_no("q", input_fn=lambda _: next(answers),
                                 print_fn=lambda _: None) is False


# ------------------------------------------------------------ logging
def test_stage_logger_jsonl(tmp_path, capsys):
    log = StageLogger("embed", log_file=tmp_path / "log.jsonl")
    log.event("batch", n=64)
    log.summary(total=128)
    lines = (tmp_path / "log.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    import json

    rec = json.loads(lines[0])
    assert rec["stage"] == "embed" and rec["n"] == 64


def test_throughput_timer():
    t = ThroughputTimer("imgs")
    t.add(100)
    assert t.n == 100
    assert t.per_sec > 0
    assert "imgs: 100" in t.report()


# ------------------------------------------------------------ tree
def test_stage_flags():
    assert tree.stage_flags("dataset_segmented") == {
        "is_segmented": True, "is_augmented": False}
    assert tree.stage_flags("/x/y/dataset_augmented")["is_augmented"]
    assert tree.stage_flags("somewhere_else") == {
        "is_segmented": False, "is_augmented": False}


def test_type_dir_validation():
    with pytest.raises(ValueError):
        tree.type_dir("root", "bogus")


def test_parallel_map_order_and_exceptions():
    from retrieval_based_object_detection_tpu.utils.loader import (
        parallel_map,
    )

    # Order preserved even when forced onto the pool path.
    out = parallel_map(lambda x: x * 2, list(range(50)), workers=4)
    assert out == [x * 2 for x in range(50)]
    # None results (decode failures) pass through untouched.
    out = parallel_map(lambda x: None if x % 2 else x, [0, 1, 2, 3],
                       workers=4)
    assert out == [0, None, 2, None]
    # Exceptions propagate like a plain loop.
    import pytest

    with pytest.raises(ValueError):
        parallel_map(lambda x: (_ for _ in ()).throw(ValueError("boom")),
                     [1, 2], workers=4)


def test_snapshot_header_and_listing(tmp_path, rng):
    from retrieval_based_object_detection_tpu import native
    from retrieval_based_object_detection_tpu.gallery import persist
    from retrieval_based_object_detection_tpu.gallery.schema import Payload
    from retrieval_based_object_detection_tpu.gallery.store import VectorStore

    store = VectorStore()
    for name, n in (("alpha", 7), ("beta", 3)):
        g = store.create_collection(name, dim=4)
        g.upsert([f"{name}{i}" for i in range(n)],
                 rng.normal(size=(n, 4)).astype(np.float32),
                 [Payload(data_type="original_images", class_name="c")
                  for _ in range(n)])
    persist.save_store(store, tmp_path)
    rows, dim, blob_len = native.snapshot_header(tmp_path / "alpha.rbod")
    assert (rows, dim) == (7, 4) and blob_len > 0
    assert persist.list_snapshots(tmp_path) == [("alpha", 7), ("beta", 3)]
