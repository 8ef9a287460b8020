from metalchat_tpu.cli.main import main

raise SystemExit(main())
