from sdr_tpu.app.cli import main

raise SystemExit(main())
