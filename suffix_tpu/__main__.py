from suffix_tpu.cli import main

raise SystemExit(main())
