from wavespec_tpu.cli import main

raise SystemExit(main())
