"""``python -m halo2_regex_tpu`` -> the CLI."""

import sys

from .cli import main

sys.exit(main())
