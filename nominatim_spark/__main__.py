"""``python -m nominatim_spark`` — CLI entry point (see cli.py)."""

import sys

from nominatim_spark.cli import main

sys.exit(main())
