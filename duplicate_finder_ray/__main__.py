"""``python -m duplicate_finder_ray`` — CLI entry point (reference
/root/reference/duplicate_finder/__main__.py:10-32 analogue)."""

import sys

from duplicate_finder_ray.cli import main

if __name__ == "__main__":
    sys.exit(main())
