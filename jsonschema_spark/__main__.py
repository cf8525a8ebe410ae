"""``python -m jsonschema_spark`` == the cli module (spark-submit can
also point straight at jsonschema_spark/cli.py)."""

import sys

from .cli import main

sys.exit(main())
