"""``python -m warcit_spark`` == the warcit-compatible CLI."""

import sys

from warcit_spark.cli import main

sys.exit(main())
