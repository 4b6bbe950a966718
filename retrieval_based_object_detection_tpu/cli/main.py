"""``rbod`` CLI — the reference's 15 numbered scripts as subcommands.

Mapping (reference script → subcommand):
  01_heic_to_jpeg             → ingest
  02/util/qdrant_manager      → store (list/create/rename/delete/count)
  11_dataset_labeling         → label
  12_labeling_check           → review (headless session commands)
  13_restore_manual_labeled   → restore
  21_crop_image               → crop
  22_segment_image_auto       → segment
  22_segment_image_manual     → segment-manual
  23_augmentation             → augment
  31_clip_embedding…          → embed
  32_create_delegate_vector   → delegates
  33_run_all_experiments      → experiments
  41_results_analysis…        → analyze

Unlike the reference's blocking ``input()`` loops, every command is fully
driveable by flags (scriptable/CI-safe); the same decision points exist as
options with the reference's defaults. State that Qdrant held lives in a
snapshot directory (``--store``).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path


def _is_remote(path: str) -> bool:
    """True when a --store argument addresses a running gallery server
    (http(s) URL) rather than a local snapshot directory."""
    return path.startswith(("http://", "https://"))


def _store_load(path: str):
    """Local snapshot dir, or — when given an http(s) URL — a client for
    a running ``rbod gallery-server`` (the reference's Qdrant-container
    topology, docker-compose.yml)."""
    if _is_remote(path):
        from retrieval_based_object_detection_tpu.gallery.client import (
            RemoteVectorStore,
        )

        return RemoteVectorStore(path)
    from retrieval_based_object_detection_tpu.gallery.persist import load_store

    return load_store(path)


def _store_save(store, path: str) -> None:
    if _is_remote(path):
        store.snapshot()  # the server owns persistence
        return
    from retrieval_based_object_detection_tpu.gallery.persist import save_store

    save_store(store, path)


def _get_collection(store, name: str):
    """store.get with the clean missing-collection error every command
    should produce (not a raw KeyError traceback)."""
    if name not in store:
        print(f"error: no such collection: {name!r}", file=sys.stderr)
        raise SystemExit(1)
    return store.get(name)


def _load_clip(checkpoint: str | None,
               variant: str | None = None, cache_dir: str = "model"):
    """CLIP params + config: converted checkpoint if given (torch file or
    a converted orbax dir from `rbod convert-weights`), auto-downloaded
    official weights if a --clip-variant is named (31:23-27 behaviour),
    else random init (clearly warned — useful for pipeline testing
    without weights)."""
    from retrieval_based_object_detection_tpu.models.clip import model as M

    if not checkpoint and variant:
        from retrieval_based_object_detection_tpu.models.clip.download import (
            ensure_checkpoint,
        )

        checkpoint = str(ensure_checkpoint(variant, cache_dir))
    if checkpoint and Path(checkpoint).is_dir():
        import json

        from retrieval_based_object_detection_tpu.utils.checkpoint import (
            load_params,
        )

        cfg_file = Path(checkpoint) / "clip_config.json"
        if not cfg_file.exists():
            # Fail actionably (like the SAM path): guessing ViT-B/32
            # for a ViT-L/14 dir would surface as a cryptic orbax
            # restore shape mismatch, or worse, a silently wrong model.
            print(f"error: {checkpoint} has no clip_config.json — not a "
                  f"directory produced by `rbod convert-weights`; re-run "
                  f"the conversion (or pass the original torch file)",
                  file=sys.stderr)
            raise SystemExit(1)
        config = M.CLIPVisionConfig(**json.loads(cfg_file.read_text()))
        params = load_params(Path(checkpoint) / "params",
                             like=M.init_params(config, seed=0))
    elif checkpoint:
        from retrieval_based_object_detection_tpu.models.clip.convert import (
            load_torch_checkpoint,
        )

        params, config = load_torch_checkpoint(checkpoint)
    else:
        print("[rbod] WARNING: no --clip-checkpoint given; using randomly "
              "initialised ViT-B/32 weights (embeddings are NOT meaningful "
              "CLIP embeddings)", file=sys.stderr)
        config = M.VIT_B_32
        params = M.init_params(config, seed=0)
    return params, config


def cmd_ingest(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.ingest import (
        IngestConfig,
        run_ingest,
    )

    res = run_ingest(IngestConfig(
        src_root=args.src, dst_root=args.dst, img_type=args.type,
        classes=args.classes))
    print(f"converted={res.n_converted} existing={res.n_skipped_existing} "
          f"duplicates={res.n_skipped_duplicate} failed={res.n_failed}"
          + (f" name_collisions={res.n_name_collisions}"
             if res.n_name_collisions else ""))
    return 0


def cmd_store(args) -> int:
    # list/count need only snapshot headers on a local store — do not
    # deserialise gigabytes of vectors to print a name and a number.
    local = not _is_remote(args.store)
    if local and args.action == "list":
        from retrieval_based_object_detection_tpu.gallery.persist import (
            list_snapshots,
        )

        for name, count in list_snapshots(args.store):
            print(f"{name}\t{count}")
        return 0
    if local and args.action == "count" and args.name:
        from retrieval_based_object_detection_tpu.gallery.persist import (
            list_snapshots,
        )

        counts = dict(list_snapshots(args.store))
        if args.name not in counts:
            print(f"error: no such collection: {args.name!r}",
                  file=sys.stderr)
            return 1
        print(counts[args.name])
        return 0
    store = _store_load(args.store)
    needs_name = args.action in ("create", "rename", "delete", "count")
    if needs_name and not args.name:
        print(f"error: 'store {args.action}' requires --name",
              file=sys.stderr)
        return 2
    if args.action == "rename" and not args.new_name:
        print("error: 'store rename' requires --new-name", file=sys.stderr)
        return 2
    if (args.action in ("rename", "delete", "count", "maintain",
                    "warm", "save-planes")
            and args.name and args.name not in store):
        print(f"error: no such collection: {args.name!r}", file=sys.stderr)
        return 1
    if args.action == "list":
        for name, count in store.list_collections():
            print(f"{name}\t{count}")
    elif args.action == "create":
        if args.name in store and not args.force:
            print(f"error: collection {args.name!r} exists "
                  f"({len(store.get(args.name))} points); pass --force to "
                  f"recreate and DISCARD its contents", file=sys.stderr)
            return 1
        store.create_collection(args.name, dim=args.dim,
                                distance=args.distance)
        _store_save(store, args.store)
        print(f"created {args.name} (dim={args.dim}, {args.distance})")
    elif args.action == "rename":
        if args.new_name in store:
            print(f"error: collection {args.new_name!r} already exists",
                  file=sys.stderr)
            return 1
        store.rename_collection(args.name, args.new_name)
        _store_save(store, args.store)
        print(f"renamed {args.name} -> {args.new_name}")
    elif args.action == "delete":
        store.delete_collection(args.name)
        _store_save(store, args.store)
        print(f"deleted {args.name}")
    elif args.action == "delete-all":
        n = store.delete_all_collections()
        _store_save(store, args.store)
        print(f"deleted {n} collections")
    elif args.action == "count":
        print(len(store.get(args.name)))
    elif args.action == "maintain":
        # Deferred-compaction window (Gallery.maintain): reclaim
        # tombstoned rows that large-gallery deletes left in place
        # (docs/PRODUCTION.md "Compaction backpressure").
        names = ([args.name] if args.name
                 else [n for n, _ in store.list_collections()])
        remote = _is_remote(args.store)
        total = 0
        for n in names:
            g = store.get(n)
            # Remote: GalleryClient.maintain → the SERVER runs the
            # reclaim and owns its durability (the backpressure accrued
            # in the server process; a CLI-side compaction of a private
            # snapshot copy could not drain it).
            reclaimed = g.maintain(force=args.force)
            total += reclaimed
            if reclaimed and not remote:
                # Make the reclaim DURABLE: poison the snapshot identity
                # so the save below rewrites the base and collapses the
                # delta chain — otherwise the next load replays the
                # delete-deltas and resurrects the tombstones.
                g._snap_id = None
            print(f"{n}\t{reclaimed} rows reclaimed")
        if total and not remote:
            _store_save(store, args.store)
    elif args.action == "warm":
        # Server-side Gallery.warm (post-bulk-ingest, pre-cutover);
        # only meaningful against a RUNNING server — a CLI-local warm
        # would build device state in a process about to exit.
        if not _is_remote(args.store):
            print("error: 'store warm' targets a running server "
                  "(--store http://…); for startup warming use "
                  "`rbod gallery-server --warm`", file=sys.stderr)
            return 2
        names = ([args.name] if args.name
                 else [n for n, _ in store.list_collections()])
        for n in names:
            print(f"{n}\t{store.get(n).warm():.1f}s")
    elif args.action == "save-planes":
        # Capacity-plane sidecar (gallery/planes.py): pre-quantise the
        # serving planes next to the snapshot so the NEXT restart's
        # first capacity search streams them straight to device
        # instead of re-deriving from f32 rows. Local-store operation
        # (pure host CPU+disk); run after a save / before a cutover.
        if _is_remote(args.store):
            print("error: 'store save-planes' writes next to a LOCAL "
                  "snapshot directory (the server saves on shutdown); "
                  "point --store at the snapshot dir", file=sys.stderr)
            return 2
        from retrieval_based_object_detection_tpu.gallery.persist import (
            save_capacity_planes,
        )

        names = ([args.name] if args.name
                 else [n for n, _ in store.list_collections()])
        _store_save(store, args.store)  # sidecars key on a saved state
        for n in names:
            g = store.get(n)
            if g.distance != "cosine" or g.dim % 2:
                print(f"{n}\tskipped (capacity tier serves cosine, "
                      f"even-dim collections)")
                continue
            t0 = time.perf_counter()
            path = save_capacity_planes(g, args.store)
            size = os.path.getsize(path) / 2**20
            print(f"{n}\t{path.name}\t{size:.1f} MB\t"
                  f"{time.perf_counter() - t0:.1f}s")
    return 0


def _max_objects(s: str) -> int | None:
    """--max-objects value: a positive int, or 'a' = all boxes above the
    conf gate (the reference's unlimited input, 11_dataset_labeling.py:
    84-93 — 'a' maps max_object_count to None)."""
    if s.strip().lower() == "a":
        return None
    n = int(s)
    if n <= 0:
        raise ValueError("must be a positive integer or 'a'")
    return n


def _load_tinydet(checkpoint: str, conf_threshold: float):
    """TinyDetDetector from a `rbod fit-detector` output dir."""
    import json

    from retrieval_based_object_detection_tpu.models.detector import tinydet
    from retrieval_based_object_detection_tpu.train.detector_loop import (
        TinyDetDetector,
    )
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        load_params,
    )

    cfg_file = Path(checkpoint) / "tinydet_config.json"
    config = (tinydet.TinyDetConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in json.loads(cfg_file.read_text()).items()})
        if cfg_file.exists() else tinydet.TinyDetConfig())
    params = load_params(Path(checkpoint) / "params",
                         like=tinydet.init_params(config, seed=0))
    return TinyDetDetector(params, config, conf_threshold=conf_threshold)


def cmd_label(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.labeling import (
        LabelConfig,
        run_labeling,
    )

    detector = None
    if args.detector == "tinydet":
        if not args.detector_checkpoint:
            print("error: --detector tinydet requires --detector-checkpoint"
                  " (run `rbod fit-detector` first)", file=sys.stderr)
            return 2
        detector = _load_tinydet(args.detector_checkpoint, args.conf)
    elif args.detector == "yolo":
        # The reference's own model family (11_dataset_labeling.py:10,
        # 96-99): official yolov8*.pt weights, converted on load. A
        # --detector-checkpoint path wins (the reference keeps it at
        # model/yolov8s.pt); otherwise the variant is fetched into
        # model/ exactly once.
        from retrieval_based_object_detection_tpu.models.yolo import (
            YoloDetector,
        )
        from retrieval_based_object_detection_tpu.models.yolo.download import (
            CheckpointUnavailable,
        )

        kw = dict(conf_threshold=args.conf, image_size=args.det_size,
                  max_det=(args.max_objects or 16))
        try:
            if args.detector_checkpoint:
                detector = YoloDetector.from_checkpoint(
                    args.detector_checkpoint, **kw)
            else:
                detector = YoloDetector.from_variant(args.yolo_variant,
                                                     **kw)
        except CheckpointUnavailable as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
    elif args.detector_checkpoint:
        print("[rbod] WARNING: --detector-checkpoint given but --detector "
              f"is {args.detector!r} — the checkpoint is IGNORED (pass "
              "--detector tinydet or --detector yolo to use it)",
              file=sys.stderr)
    # Letterbox at the detector's TRAINED resolution: a tinydet fit at
    # --image-size 512 decodes (and clips) boxes in a 512px frame — a
    # hardwired 256 canvas would run it at half scale with boxes
    # spilling into the padding.
    det_size = (detector.config.image_size if detector is not None
                else LabelConfig.det_size)
    res = run_labeling(LabelConfig(
        root_dir=args.root, img_type=args.type, classes=args.classes,
        conf_threshold=args.conf, max_object_count=args.max_objects,
        det_size=det_size, overwrite=args.overwrite), detector=detector)
    print(f"total={res.total_images} labeled={res.labeled} "
          f"existing={res.skipped_existing} no_object={res.skipped_no_object} "
          f"failed={res.failed}")
    if res.not_detected and args.show_missing:
        for p in res.not_detected:
            print(f"  - {p}")
    return 0


def cmd_review(args) -> int:
    from retrieval_based_object_detection_tpu.models.detector import (
        SaliencyProposer,
    )
    from retrieval_based_object_detection_tpu.pipelines.review import (
        ReviewConfig,
        ReviewSession,
    )

    session = ReviewSession(
        ReviewConfig(root_dir=args.root, img_type=args.type,
                     classes=args.classes, manual_dir=args.manual_dir),
        detector=SaliencyProposer())
    if args.command == "status":
        print(f"items={len(session.items)} pos={session.pos} "
              f"current={session.current}")
    elif args.command == "render":
        from PIL import Image

        out = Path(args.out or "review_preview.png")
        Image.fromarray(session.render()).save(out)
        print(f"current={session.current} boxes={len(session.boxes())} "
              f"preview={out}")
    elif args.command == "select":
        ok = session.select_box(args.box)
        print("ok" if ok else "invalid box index")
    elif args.command == "redetect":
        for i, box in enumerate(session.redetect()):
            print(f"{i}: {box}")
    elif args.command == "manual":
        dst = session.move_to_manual()
        print(f"moved to {dst}")
    elif args.command in ("next", "prev"):
        getattr(session, args.command)()
        print(f"pos={session.pos} current={session.current}")
    return 0


def cmd_review_web(args) -> int:
    """Browser-based label review (the 12_* workflow, headless-friendly)."""
    from retrieval_based_object_detection_tpu.models.detector import (
        SaliencyProposer,
    )
    from retrieval_based_object_detection_tpu.pipelines import review_web
    from retrieval_based_object_detection_tpu.pipelines.review import (
        ReviewConfig,
        ReviewSession,
    )

    session = ReviewSession(
        ReviewConfig(root_dir=args.root, img_type=args.type,
                     classes=args.classes, manual_dir=args.manual_dir),
        detector=SaliencyProposer())
    srv = review_web.serve(session, host=args.host, port=args.port)
    print(f"label review UI on http://{args.host}:{srv.server_address[1]} "
          f"({len(session.items)} labeled images)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_segment_web(args) -> int:
    """Browser-based click-to-segment (the 22m workflow, gradio-free)."""
    from retrieval_based_object_detection_tpu.pipelines import segment_web
    from retrieval_based_object_detection_tpu.pipelines.segment import (
        ManualSegmentSession,
    )

    session = ManualSegmentSession(_make_sam(args), args.dir,
                                   only_unprocessed=not args.all)
    srv = segment_web.serve(session, host=args.host, port=args.port)
    print(f"segmentation UI on http://{args.host}:{srv.server_address[1]} "
          f"({len(session.items)} images)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_restore(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.review import (
        restore_manual_labeled,
    )

    res = restore_manual_labeled(args.manual_dir, args.dst, args.type)
    print(f"restored={res.n_restored} skipped={res.n_skipped_no_label}")
    return 0


def cmd_crop(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.crop import (
        CropConfig,
        run_crop,
    )

    res = run_crop(CropConfig(
        src_root=args.src, dst_root=args.dst, img_type=args.type,
        classes=args.classes, margin_ratio=args.margin))
    print(f"objects={res.n_objects} no_label={res.n_no_label} "
          f"empty={res.n_empty_label}")
    return 0


def _make_sam(args):
    from retrieval_based_object_detection_tpu.models.sam import model as SM

    checkpoint = args.sam_checkpoint
    if not checkpoint and getattr(args, "sam_variant", None):
        # Auto-download the official checkpoint into the cache dir
        # (22_segment_image_auto.py:24-38 behaviour).
        from retrieval_based_object_detection_tpu.models.sam.download import (
            ensure_checkpoint,
        )

        checkpoint = str(ensure_checkpoint(
            args.sam_variant,
            getattr(args, "sam_cache_dir", None) or "model"))
    if checkpoint and Path(checkpoint).is_dir():
        # Converted (`rbod convert-weights`) or fine-tuned
        # (`rbod fit-sam`) checkpoint dir: params + sam_config.json.
        import json

        from retrieval_based_object_detection_tpu.models.sam.decoder import (
            DecoderConfig,
        )
        from retrieval_based_object_detection_tpu.models.sam.encoder import (
            EncoderConfig,
        )
        from retrieval_based_object_detection_tpu.utils.checkpoint import (
            load_params,
        )

        cfg_file = Path(checkpoint) / "sam_config.json"
        if not cfg_file.exists():
            # Guessing a config against stored params yields deep shape
            # errors (or silently wrong masks) — fail actionably.
            raise SystemExit(
                f"error: {checkpoint} has no sam_config.json — re-run "
                f"`rbod convert-weights --model sam` (current versions "
                f"write it) or pass the original .pth directly")
        raw = json.loads(cfg_file.read_text())
        enc = dict(raw["encoder"])
        enc["global_attn_indexes"] = tuple(enc["global_attn_indexes"])
        config = SM.SamConfig(encoder=EncoderConfig(**enc),
                              decoder=DecoderConfig(**raw["decoder"]))
        params = load_params(Path(checkpoint) / "params")
    elif checkpoint:
        from retrieval_based_object_detection_tpu.models.sam.convert import (
            load_torch_checkpoint,
        )

        params, config = load_torch_checkpoint(checkpoint)
    else:
        print("[rbod] WARNING: no --sam-checkpoint; using the random-init "
              "tiny SAM (masks are NOT meaningful)", file=sys.stderr)
        config = SM.SAM_TINY
        params = SM.init_params(config, seed=0)
    return SM.SamPredictor(params, config)


def cmd_segment(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.segment import (
        SegmentConfig,
        run_auto_segment,
    )

    res = run_auto_segment(SegmentConfig(
        src_root=args.src, dst_root=args.dst, img_type=args.type,
        classes=args.classes), _make_sam(args))
    print(f"segmented={res.n_segmented} failed={res.n_failed}")
    return 0


def cmd_segment_manual(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.segment import (
        ManualSegmentSession,
    )
    import numpy as np

    session = ManualSegmentSession(_make_sam(args), args.dir,
                                   only_unprocessed=not args.all)
    if args.command == "list":
        for p in session.items:
            print(p)
    elif args.command == "click":
        session.load()
        masks, scores = session.click(args.x, args.y)
        best = int(np.argmax(scores))
        print(f"scores={[round(float(s), 4) for s in scores]} best={best}")
        out = session.save(best if args.mask is None else args.mask)
        print(f"saved {out}")
    return 0


def cmd_augment(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines.augment import (
        AugmentConfig,
        run_augment,
    )

    res = run_augment(AugmentConfig(
        src_root=args.src, dst_root=args.dst, img_type=args.type,
        classes=args.classes, seed=args.seed))
    print(f"inputs={res.n_inputs} written={res.n_written} "
          f"failed={res.n_failed}")
    return 0


def cmd_embed(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines import embed as ep

    params, config = _load_clip(args.clip_checkpoint,
                                variant=getattr(args, "clip_variant",
                                                None))
    store = _store_load(args.store)
    if args.collection not in store:
        # Collection dim follows the loaded tower (ViT-L/14 emits 768-d).
        store.create_collection(args.collection, dim=config.embed_dim)
    gallery = store.get(args.collection)
    if gallery.dim != config.embed_dim:
        print(f"error: collection {args.collection!r} holds "
              f"{gallery.dim}-d vectors but the loaded tower emits "
              f"{config.embed_dim}-d", file=sys.stderr)
        return 1
    encoder = ep.make_encoder(params, config,
                              compute_dtype=args.compute_dtype,
                              exact=not args.fast)
    from retrieval_based_object_detection_tpu.utils.logging import StageLogger

    res = ep.embed_tree(gallery, encoder, ep.EmbedConfig(
        root_dir=args.root, img_type=args.type, classes=args.classes,
        batch_size=args.batch_size, image_size=config.image_size),
        logger=StageLogger("embed"))
    _store_save(store, args.store)
    print(f"embedded={res.total} failed={res.n_failed}")
    for cls, n in sorted(res.per_class_counts.items()):
        print(f"  - {cls}: {n}")
    return 0


def cmd_delegates(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines import delegates as dp

    store = _store_load(args.store)
    gallery = _get_collection(store, args.collection)
    res = dp.build_delegates(gallery, classes=args.classes, alpha=args.alpha)
    _store_save(store, args.store)
    print(f"delegates_written={res.n_delegates_written}")
    for (cls, case, dtype), n in sorted(res.member_counts.items()):
        if n:
            print(f"  - {cls}/{case}/{dtype}: {n} members")
    return 0


def cmd_experiments(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines import experiments as xp

    store = _store_load(args.store)
    gallery = _get_collection(store, args.collection)
    root = xp.TEST_GROUPS.get(args.test_group, args.test_group)
    out = xp.run_experiments(gallery, xp.ExperimentConfig(
        root_dir=root, results_dir=args.results_dir,
        match_mode=args.match_mode))
    print(f"rows={len(out.rows)} csv={out.csv_path}")
    print("class usage:")
    for cls, n in sorted(out.class_image_count.items()):
        print(f"  - {cls}: {n}")
    return 0


def cmd_import_qdrant(args) -> int:
    """Migrate collections from a live Qdrant server (the reference's
    vector database, 02_qdrant_environment_setting.txt:1-8) into the
    gallery store — the switch-over path for existing reference users."""
    from retrieval_based_object_detection_tpu.pipelines import migrate as mg

    store = _store_load(args.store)
    try:
        res = mg.import_qdrant(store, args.url,
                               collections=args.collections,
                               batch=args.batch, force=args.force)
    except mg.QdrantError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    _store_save(store, args.store)
    print(f"imported_points={res.n_points} "
          f"collections={','.join(res.collections) or '(none)'}")
    if res.dropped_fields:
        print(f"  dropped {res.n_dropped_fields} values of non-schema "
              f"payload fields: {sorted(res.dropped_fields)}")
    return 0


def cmd_gallery_server(args) -> int:
    """Standalone gallery service (the Qdrant role, port 6333)."""
    from retrieval_based_object_detection_tpu.gallery.server import serve

    srv = serve(args.store, host=args.host, port=args.port,
                api=getattr(args, "api", "native"),
                mesh_devices=getattr(args, "mesh_devices", 0),
                warm=getattr(args, "warm", False))
    print(f"gallery service on http://{args.host}:{srv.server_address[1]} "
          f"(store: {args.store}, api: {getattr(args, 'api', 'native')})")
    # Container orchestrators stop with SIGTERM, not Ctrl-C — route it
    # through the same snapshot-on-shutdown path (the finally below).
    import signal

    def _sigterm(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.service.snapshot()
        print("snapshotted on shutdown")
    return 0


def cmd_gallery_router(args) -> int:
    """Shard router: one endpoint over N gallery-server shards (the DCN
    scale-out tier, gallery/router.py). Stateless — snapshots happen per
    shard; shutdown broadcasts a final /snapshot to every shard."""
    from retrieval_based_object_detection_tpu.gallery.router import (
        serve_router,
    )

    srv = serve_router(args.shards, host=args.host, port=args.port,
                       api=args.api)
    print(f"gallery router on http://{args.host}:{srv.server_address[1]} "
          f"({len(args.shards)} shards: {', '.join(args.shards)}, "
          f"api: {args.api})")
    import signal

    def _sigterm(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        try:
            srv.service.snapshot()
            print("broadcast snapshot on shutdown")
        except Exception as e:  # noqa: BLE001 — shards may already be down
            print(f"shutdown snapshot broadcast failed: {e}",
                  file=sys.stderr)
    return 0


def cmd_convert_weights(args) -> int:
    """Convert a torch checkpoint (OpenAI CLIP / HF CLIPVision / SAM) to a
    fast-loading orbax directory."""
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        save_params,
    )

    import dataclasses
    import json

    out = Path(args.output)
    if args.model == "clip":
        from retrieval_based_object_detection_tpu.models.clip.convert import (
            load_torch_checkpoint,
        )

        params, config = load_torch_checkpoint(args.input)
        save_params(params, out / "params")
        out.joinpath("clip_config.json").write_text(
            json.dumps(dataclasses.asdict(config), indent=2))
        print(f"CLIP config: {config}")
    else:
        from retrieval_based_object_detection_tpu.models.sam.convert import (
            load_torch_checkpoint,
        )

        params, config = load_torch_checkpoint(args.input)
        save_params(params, out / "params")
        out.joinpath("sam_config.json").write_text(json.dumps({
            "encoder": dataclasses.asdict(config.encoder),
            "decoder": dataclasses.asdict(config.decoder)}))
        print(f"SAM config: {config}")
    print(f"converted {args.input} -> {out}")
    return 0


def cmd_serve(args) -> int:
    """Online retrieval-as-detection HTTP service over a built store."""
    from retrieval_based_object_detection_tpu.pipelines.serve import (
        RetrievalDetector,
        serve_http,
    )

    store = _store_load(args.store)
    gallery = _get_collection(store, args.collection)
    params, config = _load_clip(args.clip_checkpoint,
                                variant=getattr(args, "clip_variant",
                                                None))
    detector = RetrievalDetector(
        params, gallery, config,
        delegate_type=args.delegate_type, case=args.case,
        data_type=args.data_type)
    if getattr(args, "warm", False):
        # Pre-pay the first request's jit compiles (~13 s measured on
        # the tunnel for the fused saliency→crop→encode→classify chain
        # at batch 1) with one dummy detect at the serving resolution.
        import time as _time

        import numpy as _np

        t0 = _time.perf_counter()
        detector.detect(_np.zeros((1, args.serving_size,
                                   args.serving_size, 3), _np.uint8))
        print(f"warmed detect pipeline in "
              f"{_time.perf_counter() - t0:.1f}s", file=sys.stderr)
    srv = serve_http(detector, host=args.host, port=args.port,
                     serving_size=args.serving_size,
                     max_batch=args.max_batch,
                     batch_wait_ms=args.batch_wait_ms)
    print(f"serving retrieval-as-detection on "
          f"http://{args.host}:{srv.server_address[1]}/detect "
          f"({len(detector.classes)} classes, micro-batch "
          f"{args.max_batch})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnostic: backend, devices, native runtime, store
    health, checkpoint cache — the first thing to run on a new machine
    or when something behaves oddly."""
    import jax

    ok = True

    def row(label, value, good=True):
        nonlocal ok
        ok = ok and good
        print(f"  {'✓' if good else '✗'} {label}: {value}")

    print("[doctor] JAX / devices")
    row("jax", jax.__version__)
    try:
        devs = jax.devices()
        kinds = {d.platform for d in devs}
        row("backend", f"{jax.default_backend()} "
            f"({len(devs)} device(s): {sorted(kinds)})")
        from retrieval_based_object_detection_tpu.utils import platform

        row("tpu", platform.is_tpu(),
            good=True)  # informational — CPU is a valid dev setup
    except Exception as e:
        row("devices", f"FAILED: {e}", good=False)

    print("[doctor] native runtime")
    try:
        from retrieval_based_object_detection_tpu import native

        row("librbod", "loaded" if native.available()
            else "absent (NumPy fallbacks active — run make -C native)",
            good=True)
    except Exception as e:
        row("native import", f"FAILED: {e}", good=False)

    print("[doctor] store")
    from pathlib import Path as _P

    store_dir = _P(args.store)
    if store_dir.is_dir():
        from retrieval_based_object_detection_tpu.gallery.persist import (
            list_snapshots,
        )

        snaps = list_snapshots(store_dir)
        row(str(store_dir), f"{len(snaps)} collection(s): "
            + (", ".join(f"{n} ({c})" for n, c in snaps) or "—"))
    else:
        row(str(store_dir), "no store directory (created on first write)")

    print("[doctor] checkpoint cache (model/)")
    model_dir = _P("model")
    if model_dir.is_dir():
        files = sorted(p.name for p in model_dir.iterdir()
                       if p.suffix in (".pt", ".pth"))
        row("cached", ", ".join(files) or "none")
    else:
        row("cached", "none (auto-download needs network; see README "
            "'Pretrained weights')")

    print("[doctor] compute smoke test")
    try:
        import jax.numpy as jnp

        v = float(jnp.dot(jnp.ones(8), jnp.ones(8)))
        row("jit dot", v, good=v == 8.0)
    except Exception as e:
        row("jit dot", f"FAILED: {e}", good=False)
    print("[doctor]", "all checks passed" if ok else "PROBLEMS FOUND")
    return 0 if ok else 1


def cmd_bench(args) -> int:
    """Run the benchmark suite in-process (source checkouts only — the
    suite lives beside the package, not inside it)."""
    import runpy
    import sys as _sys
    from pathlib import Path as _Path

    suite = _Path(__file__).resolve().parents[2] / "benchmarks" / "suite.py"
    if not suite.exists():
        print("benchmarks/suite.py not found — `rbod bench` needs a "
              "source checkout", file=_sys.stderr)
        return 1
    if args.only is not None and not args.only:
        print("error: --only given without bench names (omit the flag to "
              "run everything)", file=_sys.stderr)
        return 2
    argv = [str(suite)]
    if args.quick:
        argv.append("--quick")
    if args.json:
        argv += ["--json", args.json]
    if args.only:
        argv += ["--only", *args.only]
    old = _sys.argv
    _sys.argv = argv
    try:
        runpy.run_path(str(suite), run_name="__main__")
    finally:
        _sys.argv = old
    return 0


def cmd_e2e(args) -> int:
    """One-shot pipeline: [ingest →] label → crop → segment → augment →
    embed → delegates → experiments → analyze on a raw
    labeled-or-unlabeled image tree.

    With ``--raw``, the HEIC/any→JPEG ingest stage (01) runs first into
    ``--data``. The augment stage runs on the segmented ORIGINAL images
    (the delegate source set, 23_augmentation.py) so the full 3-case ×
    4-type experiment grid — including ``pre_c`` — is exercised; the
    reference's own committed run lacked pre_c rows (BASELINE.md note)."""
    if args.raw:
        for t in ("original", "natural"):
            rc = main(["ingest", "--src", args.raw, "--dst", args.data,
                       "--type", t])
            if rc:
                return rc
    for t in ("original", "natural"):
        rc = main(["label", "--root", args.data, "--type", t]
                  + (["--overwrite"] if args.overwrite else []))
        if rc:
            return rc
        # Stage roots derive from the data root's parent for isolation.
        rc = main(["crop", "--src", args.data, "--dst", args.cropped,
                   "--type", t])
        if rc:
            return rc
        rc = main(["segment", "--src", args.cropped, "--dst", args.segmented,
                   "--type", t]
                  + (["--sam-checkpoint", args.sam_checkpoint]
                     if args.sam_checkpoint else [])
                  + (["--sam-variant", args.sam_variant,
                      "--sam-cache-dir", args.sam_cache_dir]
                     if args.sam_variant else []))
        if rc:
            return rc
        # pre_c source: augmented variants of the segmented images. Both
        # types are augmented (23_augmentation.py:20 offers either) —
        # experiment delegates are pinned to the test images' data_type
        # (33:117-137), so pre_c needs natural delegates too.
        rc = main(["augment", "--src", args.segmented,
                   "--dst", args.augmented, "--type", t])
        if rc:
            return rc
        for root in (args.cropped, args.segmented, args.augmented):
            rc = main(["embed", "--root", root, "--type", t,
                       "--store", args.store, "--collection",
                       args.collection]
                      + (["--clip-checkpoint", args.clip_checkpoint]
                         if args.clip_checkpoint else [])
                      + (["--clip-variant", args.clip_variant]
                         if args.clip_variant else []))
            if rc:
                return rc
    rc = main(["delegates", "--store", args.store,
               "--collection", args.collection])
    if rc:
        return rc
    rc = main(["experiments", "--store", args.store,
               "--collection", args.collection,
               "--test-group", args.segmented,
               "--results-dir", args.results_dir])
    if rc:
        return rc
    return main(["analyze", "--results-dir", args.results_dir]
                + (["--no-plots"] if args.no_plots else []))


def cmd_fit_detector(args) -> int:
    """Train TinyDet on a labeled tree (the YOLOv8s slot's learned
    option) and save a checkpoint dir usable by
    `rbod label --detector tinydet`."""
    import dataclasses
    import json

    from retrieval_based_object_detection_tpu.models.detector import tinydet
    from retrieval_based_object_detection_tpu.train.detector_loop import (
        DetFitConfig,
        fit_detector,
    )
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        save_params,
    )

    config = tinydet.TinyDetConfig(image_size=args.image_size)
    params, metrics = fit_detector(config, DetFitConfig(
        root_dir=args.root, img_type=args.type, epochs=args.epochs,
        batch_size=args.batch_size, learning_rate=args.lr, seed=args.seed))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "tinydet_config.json").write_text(
        json.dumps(dataclasses.asdict(config)))
    save_params(params, out / "params")
    print(f"fit done: loss={float(metrics.get('loss', float('nan'))):.4f} "
          f"checkpoint={out}")
    return 0


def cmd_finetune(args) -> int:
    """Fine-tune the CLIP tower on a labeled crop tree (dp×tp sharded)
    and save a converted-checkpoint dir usable by --clip-checkpoint."""
    import dataclasses
    import json

    import jax
    import numpy as np

    from retrieval_based_object_detection_tpu.parallel.mesh import make_mesh
    from retrieval_based_object_detection_tpu.train.loop import (
        FitConfig,
        fit,
    )
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        save_params,
    )

    init_params_, clip_config = _load_clip(args.clip_checkpoint,
                                           variant=args.clip_variant)
    n_dev = len(jax.devices())
    tp = args.tp if args.tp else 1
    dp = args.dp if args.dp else max(1, n_dev // tp)
    mesh = make_mesh({"dp": dp, "tp": tp}, devices=jax.devices()[:dp * tp])
    params, metrics = fit(clip_config, FitConfig(
        root_dir=args.root, img_type=args.type, epochs=args.epochs,
        batch_size=args.batch_size, learning_rate=args.lr,
        checkpoint_dir=args.resume_dir, seed=args.seed,
        compute_dtype=args.compute_dtype, head=args.head,
        lr_schedule=args.lr_schedule, augment=args.augment),
        mesh, params=init_params_)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "clip_config.json").write_text(
        json.dumps(dataclasses.asdict(clip_config)))
    # The tower (the part every downstream stage loads); the linear head
    # is training scaffolding.
    tower = params["tower"] if isinstance(params, dict) \
        and "tower" in params else params
    save_params(jax.tree.map(lambda a: np.asarray(a), tower),
                out / "params")
    print(f"finetune done: loss={float(metrics.get('loss', 0.0)):.4f} "
          f"acc={float(metrics.get('accuracy', 0.0)):.3f} "
          f"checkpoint={out} (mesh dp={dp} tp={tp})")
    return 0


def cmd_fit_sam(args) -> int:
    """Fine-tune SAM on the segment stage's own RGBA outputs (images +
    alpha-channel masks, 22_segment_image_auto.py:154-159): manually
    reviewed segmentations become training pairs for the rest — the
    self-training loop the reference's manual/auto split implies. Saves
    a checkpoint dir loadable by `rbod segment --sam-checkpoint`."""
    import dataclasses
    import json

    from retrieval_based_object_detection_tpu.models.sam import model as SM
    from retrieval_based_object_detection_tpu.train.sam_loop import (
        SamFitConfig,
        fit_sam,
        load_segmented_tree,
    )
    from retrieval_based_object_detection_tpu.utils.checkpoint import (
        save_params,
    )

    if args.sam_checkpoint:
        from retrieval_based_object_detection_tpu.models.sam.convert import (
            load_torch_checkpoint,
        )

        init, config = load_torch_checkpoint(args.sam_checkpoint)
    else:
        config = SM.SAM_TINY
        init = SM.init_params(config, seed=args.seed)
    images, masks, points = load_segmented_tree(
        args.root, args.type, size=config.img_size, classes=args.classes)
    params, metrics = fit_sam(
        config, images, masks, points,
        cfg=SamFitConfig(epochs=args.epochs, batch_size=args.batch_size,
                         learning_rate=args.lr, seed=args.seed),
        params=init)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "sam_config.json").write_text(json.dumps({
        "encoder": dataclasses.asdict(config.encoder),
        "decoder": dataclasses.asdict(config.decoder)}))
    save_params(params, out / "params")
    print(f"sam fit done: {images.shape[0]} masks, "
          f"best-token IoU={metrics.get('train_best_iou', 0.0):.3f} "
          f"checkpoint={out}")
    return 0


def cmd_wizard(args) -> int:
    """Interactive pipeline walk-through — the reference's input()-driven
    UX (SURVEY.md §5 config audit) over the same decision points, calling
    the exact same stage commands as the flags."""
    from retrieval_based_object_detection_tpu.utils.config import (
        prompt_choice,
        prompt_value,
        prompt_yes_no,
    )

    def pick_collection(store_path: str = "gallery_store") -> str:
        """Collection pick with point counts — the reference's
        list-then-choose flow (32_create_delegate_vector.py:65-75).
        Local stores list from snapshot HEADERS (O(1) per collection;
        a full load_store would deserialise every vector twice — once
        for the menu, once for the confirmed command)."""
        try:
            if _is_remote(store_path):
                cols = _store_load(store_path).list_collections()
            else:
                from retrieval_based_object_detection_tpu.gallery.persist \
                    import list_snapshots

                cols = list_snapshots(store_path)
        except Exception:
            cols = []
        if not cols:
            return prompt_value("Collection name", default="default")
        labels = [f"{n} ({c} points)" for n, c in cols]
        # rsplit on the count suffix — collection names may contain spaces.
        return prompt_choice("Collection?", labels).rsplit(" (", 1)[0]

    stage = prompt_choice(
        "Which stage do you want to run?",
        ["ingest", "label", "review", "review-web", "restore", "crop",
         "segment", "segment-web", "augment", "embed", "delegates",
         "experiments", "analyze", "serve", "e2e"])
    img_type = None
    if stage in ("ingest", "label", "review", "review-web", "restore",
                 "crop", "segment", "segment-web", "augment", "embed"):
        # segment-web takes no --type flag, but the type still shapes its
        # default directory below.
        img_type = prompt_choice("Image type?", ["original", "natural"],
                                 default="original")
    argv: list[str] = [stage]
    if img_type:
        argv += ["--type", img_type]
    if stage == "review":
        argv += [prompt_choice(
            "Review action?",
            ["status", "render", "select", "redetect", "manual",
             "next", "prev"], default="status")]
    if stage == "segment-web":
        argv = [stage]  # no --type flag on this command
        # The session lists ONE flat directory of images — default to a
        # concrete class dir (the type dir alone holds only class
        # subdirectories, which would show "(0 images)").
        type_dir = Path(f"dataset_cropped/{img_type}_images")
        classes = (sorted(p.name for p in type_dir.iterdir() if p.is_dir())
                   if type_dir.is_dir() else [])
        default_dir = (str(type_dir / classes[0]) if classes
                       else str(type_dir))
        argv += ["--dir", prompt_value(
            "Class directory to segment (one class's images)?",
            default=default_dir)]
        if prompt_yes_no("Re-segment already-processed images?",
                         default=False):
            argv += ["--all"]
    if stage in ("segment", "segment-web"):
        # SAM variant pick with the reference's VRAM guidance (22a:20-26).
        variant = prompt_choice(
            "SAM model? (auto-downloads the official checkpoint)",
            ["vit_b (fastest, ~4GB)", "vit_l (~6GB)",
             "vit_h (best, ~8GB)", "none (random-init tiny SAM)"],
            default="vit_b (fastest, ~4GB)").split()[0]
        if variant != "none":
            argv += ["--sam-variant", variant]
    if stage == "embed":
        argv += ["--root", prompt_choice(
            "Dataset directory?",
            ["dataset_cropped", "dataset_segmented", "dataset_augmented"])]
        argv += ["--collection", pick_collection()]
    if stage in ("delegates", "experiments", "serve"):
        argv += ["--collection", pick_collection()]
    if stage == "experiments":
        group = prompt_choice(
            "Test group?",
            ["TestGroup1 (dataset_segmented)", "TestGroup2 (dataset_cropped)"],
            default="TestGroup1 (dataset_segmented)")
        argv += ["--test-group", group.split()[0]]
    if stage == "e2e":
        if prompt_yes_no("Run HEIC ingest first?", default=False):
            argv += ["--raw", prompt_value("Raw source tree",
                                           default="dataset_heic")]
    if not prompt_yes_no(f"Run: rbod {' '.join(argv)} ?", default=True):
        print("aborted")
        return 1
    return main(argv)


def cmd_analyze(args) -> int:
    from retrieval_based_object_detection_tpu.pipelines import analysis

    csv = args.csv
    if csv is None:
        found = analysis.find_result_csvs(args.results_dir)
        if not found:
            print("no result CSVs found", file=sys.stderr)
            return 1
        csv = found[-1]
    res = analysis.analyze(csv, make_plots=not args.no_plots)
    print(f"summary: {res['summary_path']}")
    print(res["summary"].round(4).to_string(index=False))
    print(f"metrics: {len(res['metrics'])} groups; plots: {len(res['plots'])}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rbod",
        description="TPU-native retrieval-based object detection pipeline")
    p.add_argument("--platform", default=None,
                   choices=("default", "cpu", "tpu", "axon"),
                   help="force a JAX backend (also via RBOD_PLATFORM env); "
                        "'cpu' is handy for small-model host runs")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the whole command "
                        "into this directory (view with TensorBoard / "
                        "xprof) — works on any subcommand")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **kw):
        sp = sub.add_parser(name, **kw)
        sp.set_defaults(fn=fn)
        return sp

    sp = add("ingest", cmd_ingest, help="HEIC/any -> JPEG tree (01)")
    sp.add_argument("--src", default="dataset_heic")
    sp.add_argument("--dst", default="dataset_jpeg")
    sp.add_argument("--type", default="original",
                    choices=("original", "natural"))
    sp.add_argument("--classes", nargs="*", default=None)

    sp = add("store", cmd_store, help="collection admin (02/util)")
    sp.add_argument("action", choices=("list", "create", "rename", "delete",
                                       "delete-all", "count", "maintain",
                                       "warm", "save-planes"))
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--name")
    sp.add_argument("--new-name")
    sp.add_argument("--dim", type=int, default=512)
    sp.add_argument("--distance", default="cosine")
    sp.add_argument("--force", action="store_true",
                    help="allow 'create' to recreate an existing collection")

    sp = add("label", cmd_label, help="auto-label with detector (11)")
    sp.add_argument("--root", default="dataset_jpeg")
    sp.add_argument("--type", default="original",
                    choices=("original", "natural"))
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--conf", type=float, default=0.25)
    sp.add_argument("--max-objects", type=_max_objects, default=1,
                    help="top-K boxes per image; 'a' = all above --conf "
                         "(the reference's 'a' input, 11:84-93)")
    sp.add_argument("--overwrite", action="store_true")
    sp.add_argument("--show-missing", action="store_true")
    sp.add_argument("--detector",
                    choices=("saliency", "tinydet", "yolo"),
                    default="saliency",
                    help="yolo = official YOLOv8 weights (the "
                         "reference's model, 11:10) converted to JAX")
    sp.add_argument("--detector-checkpoint",
                    help="dir from `rbod fit-detector` (tinydet) or a "
                         ".pt file (yolo, e.g. model/yolov8s.pt)")
    sp.add_argument("--yolo-variant", default="yolov8s",
                    help="official variant to auto-download when "
                         "--detector yolo has no --detector-checkpoint")
    sp.add_argument("--det-size", type=int, default=640,
                    help="detector letterbox size (yolo; must be "
                         "divisible by 32)")

    sp = add("review", cmd_review, help="label review session (12)")
    sp.add_argument("command", choices=("status", "render", "select",
                                        "redetect", "manual", "next", "prev"))
    sp.add_argument("--root", default="dataset_jpeg")
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--manual-dir", default="dataset_manual")
    sp.add_argument("--box", type=int, default=0)
    sp.add_argument("--out")

    sp = add("review-web", cmd_review_web,
             help="browser label review UI (12)")
    sp.add_argument("--root", default="dataset_jpeg")
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--manual-dir", default="dataset_manual")
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=7891)

    sp = add("segment-web", cmd_segment_web,
             help="browser click-to-segment UI (22m, port 7890)")
    sp.add_argument("--dir", required=True)
    sp.add_argument("--all", action="store_true")
    sp.add_argument("--sam-checkpoint")
    sp.add_argument("--sam-variant", choices=["vit_b", "vit_l", "vit_h"],
                    help="auto-download this official SAM checkpoint "
                         "into --sam-cache-dir (22a:24-38)")
    sp.add_argument("--sam-cache-dir", default="model")
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=7890)

    sp = add("restore", cmd_restore, help="restore quarantined images (13)")
    sp.add_argument("--manual-dir", default="dataset_manual")
    sp.add_argument("--dst", default="dataset_jpeg")
    sp.add_argument("--type", default="original")

    sp = add("crop", cmd_crop, help="crop labeled boxes with margin (21)")
    sp.add_argument("--src", default="dataset_jpeg")
    sp.add_argument("--dst", default="dataset_cropped")
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--margin", type=float, default=0.2)

    sp = add("segment", cmd_segment, help="auto center-point SAM (22a)")
    sp.add_argument("--src", default="dataset_cropped")
    sp.add_argument("--dst", default="dataset_segmented")
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--sam-checkpoint")
    sp.add_argument("--sam-variant", choices=["vit_b", "vit_l", "vit_h"],
                    help="auto-download this official SAM checkpoint "
                         "into --sam-cache-dir (22a:24-38)")
    sp.add_argument("--sam-cache-dir", default="model")

    sp = add("segment-manual", cmd_segment_manual,
             help="click-to-segment session (22m)")
    sp.add_argument("command", choices=("list", "click"))
    sp.add_argument("--dir", required=True)
    sp.add_argument("--x", type=float, default=0)
    sp.add_argument("--y", type=float, default=0)
    sp.add_argument("--mask", type=int, default=None)
    sp.add_argument("--all", action="store_true")
    sp.add_argument("--sam-checkpoint")
    sp.add_argument("--sam-variant", choices=["vit_b", "vit_l", "vit_h"],
                    help="auto-download this official SAM checkpoint "
                         "into --sam-cache-dir (22a:24-38)")
    sp.add_argument("--sam-cache-dir", default="model")

    sp = add("augment", cmd_augment, help="augmentation grid (23)")
    sp.add_argument("--src", default="dataset_segmented")
    sp.add_argument("--dst", default="dataset_augmented")
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--seed", type=int, default=0)

    sp = add("embed", cmd_embed, help="batched CLIP embed + upsert (31)")
    sp.add_argument("--root", required=True)
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--collection", default="default")
    sp.add_argument("--clip-checkpoint")
    sp.add_argument("--clip-variant",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"],
                    help="auto-download this official OpenAI CLIP "
                         "checkpoint into model/ (31:23-27)")
    sp.add_argument("--batch-size", type=int, default=64)
    sp.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "bfloat16"))
    sp.add_argument("--fast", action="store_true",
                    help="skip HIGHEST matmul precision")

    sp = add("delegates", cmd_delegates, help="build delegate vectors (32)")
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--collection", default="default")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--alpha", type=float, default=2.0)

    sp = add("experiments", cmd_experiments, help="experiment grid (33)")
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--collection", default="default")
    sp.add_argument("--test-group", default="TestGroup1",
                    help="TestGroup1|TestGroup2 or an explicit root dir")
    sp.add_argument("--results-dir", default="results")
    sp.add_argument("--match-mode", default="same_class",
                    choices=("same_class", "nearest"))

    sp = add("import-qdrant", cmd_import_qdrant,
             help="migrate collections from a live Qdrant server "
                  "(the reference's vector DB) into the gallery store")
    sp.add_argument("--url", default="http://localhost:6333",
                    help="Qdrant REST endpoint")
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--collections", nargs="*", default=None,
                    help="names to migrate (default: all)")
    sp.add_argument("--batch", type=int, default=1024,
                    help="scroll page size")
    sp.add_argument("--force", action="store_true",
                    help="recreate (wipe) existing non-empty destination "
                         "collections")

    sp = add("gallery-server", cmd_gallery_server,
             help="standalone gallery HTTP service (the Qdrant role)")
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=6333)
    sp.add_argument("--api", choices=["native", "qdrant"],
                    default="native",
                    help="'qdrant' serves the Qdrant wire-compatible "
                         "REST facade (the reference's qdrant-client "
                         "call sites work unchanged)")
    sp.add_argument("--mesh-devices", type=int, default=0,
                    dest="mesh_devices",
                    help="shard every cosine collection over an N-device "
                         "gallery mesh (-1 = all visible devices); "
                         "searches route through the ICI-sharded tier")
    sp.add_argument("--warm", action="store_true",
                    help="pre-build each collection's serving tier in a "
                         "background thread at startup — the first "
                         "client query otherwise pays the device view "
                         "build (minutes at 10M rows)")

    sp = add("gallery-router", cmd_gallery_router,
             help="shard router over N gallery-servers (multi-host "
                  "gallery behind one endpoint)")
    sp.add_argument("--shards", nargs="+", required=True,
                    metavar="URL",
                    help="shard base URLs, e.g. http://host1:6333 "
                         "http://host2:6333 — id-hash write routing, "
                         "fan-out/merge reads, per-shard snapshots")
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=6334)
    sp.add_argument("--api", choices=["native", "qdrant"],
                    default="native",
                    help="'qdrant' serves the Qdrant wire facade over "
                         "the sharded topology")

    sp = add("convert-weights", cmd_convert_weights,
             help="torch checkpoint -> orbax dir (clip or sam)")
    sp.add_argument("--model", choices=("clip", "sam"), default="clip")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)

    sp = add("serve", cmd_serve,
             help="online detection-by-retrieval HTTP service")
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--collection", default="default")
    sp.add_argument("--clip-checkpoint")
    sp.add_argument("--clip-variant",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"],
                    help="auto-download this official OpenAI CLIP "
                         "checkpoint into model/ (31:23-27)")
    sp.add_argument("--delegate-type", default="average")
    sp.add_argument("--case", default="pre_a")
    sp.add_argument("--data-type", default="original_images")
    sp.add_argument("--host", default="0.0.0.0")
    sp.add_argument("--port", type=int, default=8080)
    sp.add_argument("--serving-size", type=int, default=512,
                    dest="serving_size",
                    help="fixed letterbox square for uploads (one jit "
                         "shape however clients resize)")
    sp.add_argument("--warm", action="store_true",
                    help="run one dummy detect before binding so the "
                         "first client request skips the jit compiles")
    sp.add_argument("--max-batch", type=int, default=16,
                    help="micro-batch concurrent requests into shared "
                         "device dispatches (1 disables)")
    sp.add_argument("--batch-wait-ms", type=float, default=4.0,
                    help="max co-arrival wait before dispatching a "
                         "partial batch")

    sp = add("e2e", cmd_e2e,
             help="full pipeline in one shot: label->crop->segment->embed->"
                  "delegates->experiments->analyze")
    sp.add_argument("--raw", default=None,
                    help="HEIC/any source tree; runs ingest (01) first")
    sp.add_argument("--data", default="dataset_jpeg")
    sp.add_argument("--cropped", default="dataset_cropped")
    sp.add_argument("--segmented", default="dataset_segmented")
    sp.add_argument("--augmented", default="dataset_augmented")
    sp.add_argument("--store", default="gallery_store")
    sp.add_argument("--collection", default="default")
    sp.add_argument("--results-dir", default="results")
    sp.add_argument("--clip-checkpoint")
    sp.add_argument("--clip-variant",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"],
                    help="auto-download this official OpenAI CLIP "
                         "checkpoint into model/ (31:23-27)")
    sp.add_argument("--sam-checkpoint")
    sp.add_argument("--sam-variant", choices=["vit_b", "vit_l", "vit_h"],
                    help="auto-download this official SAM checkpoint "
                         "into --sam-cache-dir (22a:24-38)")
    sp.add_argument("--sam-cache-dir", default="model")
    sp.add_argument("--overwrite", action="store_true")
    sp.add_argument("--no-plots", action="store_true")

    sp = add("fit-detector", cmd_fit_detector,
             help="train TinyDet on a labeled tree (YOLOv8s slot)")
    sp.add_argument("--root", default="dataset_jpeg")
    sp.add_argument("--type", default="original")
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.add_argument("--image-size", type=int, default=256)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--out", default="detector_ckpt")

    sp = add("finetune", cmd_finetune,
             help="fine-tune the CLIP tower on a labeled crop tree "
                  "(dp×tp sharded)")
    sp.add_argument("--root", default="dataset_cropped")
    sp.add_argument("--type", default="original")
    sp.add_argument("--epochs", type=int, default=1)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--lr", type=float, default=1e-4)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--compute-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    sp.add_argument("--head", default="linear",
                    choices=("linear", "cosine"),
                    help="cosine = retrieval-aligned classifier head")
    sp.add_argument("--lr-schedule", default="constant",
                    choices=("constant", "cosine"),
                    help="cosine = linear warmup + cosine decay")
    sp.add_argument("--augment", action="store_true",
                    help="train-time augmentation (brightness jitter, "
                         "translation, noise — label-preserving, no flips)")
    sp.add_argument("--dp", type=int, default=0, help="0 = auto")
    sp.add_argument("--tp", type=int, default=0, help="0 = auto")
    sp.add_argument("--clip-checkpoint")
    sp.add_argument("--clip-variant",
                    choices=["ViT-B/32", "ViT-B/16", "ViT-L/14"])
    sp.add_argument("--resume-dir",
                    help="orbax checkpoint dir for save/resume")
    sp.add_argument("--out", default="clip_finetuned")

    sp = add("fit-sam", cmd_fit_sam,
             help="fine-tune SAM on segmented RGBA outputs "
                  "(images + alpha masks)")
    sp.add_argument("--root", default="dataset_segmented")
    sp.add_argument("--type", default="original")
    sp.add_argument("--classes", nargs="*", default=None)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--batch-size", type=int, default=8)
    sp.add_argument("--lr", type=float, default=3e-4)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--sam-checkpoint",
                    help="official .pth to start from (default: tiny "
                         "random init)")
    sp.add_argument("--out", default="sam_finetuned")

    add("wizard", cmd_wizard,
        help="interactive stage picker (the reference's prompt-driven UX)")

    sp = add("doctor", cmd_doctor,
             help="environment diagnostic: backend, native lib, store, "
                  "checkpoint cache")
    sp.add_argument("--store", default="gallery_store")

    sp = add("bench", cmd_bench,
             help="run the benchmark suite (benchmarks/suite.py)")
    sp.add_argument("--quick", action="store_true")
    sp.add_argument("--json", default=None)
    sp.add_argument("--only", nargs="*", default=None)

    sp = add("analyze", cmd_analyze, help="analysis + plots (41)")
    sp.add_argument("--csv", default=None)
    sp.add_argument("--results-dir", default="results")
    sp.add_argument("--no-plots", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    platform = args.platform or os.environ.get("RBOD_PLATFORM")
    if platform and platform != "default":
        # Must happen before the first jax operation. Plain env vars are
        # not enough in images whose sitecustomize pins a platform.
        import jax

        jax.config.update("jax_platforms", platform)
    from retrieval_based_object_detection_tpu.utils.logging import (
        profile_trace,
    )

    with profile_trace(args.profile_dir):
        return args.fn(args)


def entry() -> None:
    """console_scripts entry point (`rbod` on PATH after pip install)."""
    raise SystemExit(main())


if __name__ == "__main__":
    raise SystemExit(main())
