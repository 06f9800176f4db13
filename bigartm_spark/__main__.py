from bigartm_spark.cli import main

raise SystemExit(main())
