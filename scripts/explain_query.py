"""Dump the physical plan of any registry query.

    python scripts/explain_query.py <query_name> [sf_dir] [mode]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry

    from org_dharts_dia_tesseract_spark.session import get_spark

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    mode = sys.argv[3] if len(sys.argv) > 3 else "formatted"
    qs = entry.queries()
    if name not in qs:
        sys.exit(f"unknown query {name!r}; choices: {sorted(qs)}")
    spark = get_spark("local[8]", app_name="explain", shuffle_partitions=8)
    qs[name](spark, sf_dir).explain(mode)
    spark.stop()


if __name__ == "__main__":
    main()
