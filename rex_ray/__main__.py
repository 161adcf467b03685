"""``python -m rex_ray`` — CLI entry (see rex_ray/cli.py)."""

import sys

from rex_ray.cli import main

sys.exit(main())
