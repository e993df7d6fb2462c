"""`python -m hbase_bulkload_spark` — see cli.py."""

import sys

from hbase_bulkload_spark.cli import main

sys.exit(main())
