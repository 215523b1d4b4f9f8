"""Driver contract facade — entry/queries/oracle_sql.

The query registry itself lives in geobuf_spark/registry/ (one module
per family, oracles beside their queries, driver-window order as
explicit data in window.py — the r5 split of the former 18k-line
monolith, VERDICT r4 #2). This facade re-exports the whole registry
namespace so tests and tools keep addressing `__spark_entry__.q_foo`,
helpers and constants exactly as before.
"""
from geobuf_spark.registry import (  # noqa: F401
    MODULES,
    entry,
    oracle_sql,
    queries,
)

for _m in MODULES:
    globals().update({k: v for k, v in vars(_m).items()
                      if not k.startswith("__")})
del _m
