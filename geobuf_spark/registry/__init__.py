"""Registry package: explicit driver-window ordering (window.py).

The query/oracle definitions themselves live in __spark_entry__ (split
into family modules is tracked in COVERAGE.md); this package owns the
ORDER the external driver sees.
"""

from .window import WINDOW, QUEUE

__all__ = ["WINDOW", "QUEUE"]
