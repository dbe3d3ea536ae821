from legal_rag_tpu.cli import main

raise SystemExit(main())
