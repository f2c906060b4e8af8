"""``python -m warcit_spark`` == the warcit-compatible CLI."""

import sys

from warcit_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
