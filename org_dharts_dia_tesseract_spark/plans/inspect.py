"""Physical-plan inspection helpers.

The scale posture of every operator is asserted in tests against the plan
itself (".explain the plan and iterate until it's the plan you'd want"):
filters must reach the parquet scan, projections must prune the read
schema, small dims must broadcast, co-partitioned joins must not
exchange. These helpers parse `explain("formatted")` output so tests can
pin those properties and fail on regressions.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema strings of every scan (column-pruning evidence)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", explain_str(df))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def n_exchanges(df: DataFrame) -> int:
    """Shuffle count (BroadcastExchange excluded — broadcasts are cheap)."""
    return len(re.findall(r"(?<!Broadcast)Exchange (hash|range|Single)",
                          explain_str(df, "simple")))


def has_exchange(df: DataFrame) -> bool:
    return n_exchanges(df) > 0
