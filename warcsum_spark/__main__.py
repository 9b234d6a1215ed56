from warcsum_spark.cli import main

raise SystemExit(main())
