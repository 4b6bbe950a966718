from retrieval_based_object_detection_tpu.cli.main import main

raise SystemExit(main())
