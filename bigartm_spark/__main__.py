import sys

if len(sys.argv) > 1 and sys.argv[1] == "pipeline":
    from bigartm_spark.pipeline_cli import main

    raise SystemExit(main(sys.argv[2:]))

from bigartm_spark.cli import main

raise SystemExit(main())
