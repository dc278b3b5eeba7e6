from codedup.cli import main

raise SystemExit(main())
