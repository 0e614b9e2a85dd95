"""User-defined aggregate and table functions (the UDAF/UDTF legs of
SURVEY 2.C; the UDF leg is the pipeline's pandas/Arrow stages).

Both are the Arrow-vectorized forms — no per-row Python at the API
level — and both are parity-tested against the equivalent native plan
(tests/test_functions.py), because at scale a UDAF/UDTF should only be
used where built-ins genuinely cannot express the semantics; here they
demonstrate the extension points with kernels that have exact native
twins. Factories are lazy: pyspark registers UDFs against the active
session, so creation happens at call time, not import time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def percentile90_udaf():
    """Grouped-agg pandas UDAF: p90 with linear interpolation — the same
    definition as Spark's `percentile(col, 0.9)`, so the two plans must
    agree exactly (test-pinned). Partial aggregation is NOT available to
    grouped-agg UDAFs (each group's values ship to one worker) — the
    built-in stays the hot-path choice; this is the extension seam."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def percentile90(v: pd.Series) -> float:
        return float(np.percentile(v.to_numpy(dtype=np.float64), 90))
    return percentile90


def word_split_udtf():
    """Python UDTF: one row per whitespace word with its 0-based index —
    the exact twin of `posexplode(split(text, ' '))` minus empty tokens
    (test-pinned). Lateral-joins like any table function:

        spark.udtf.register("word_split", word_split_udtf())
        SELECT d.doc_id, s.word, s.word_id
        FROM documents d, LATERAL word_split(d.text) s
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, word_id: int")
    class WordSplit:
        def eval(self, text: str):
            if text is None:
                return
            i = 0
            for w in text.split(" "):
                if w != "":
                    yield w, i
                    i += 1
    return WordSplit


def word_split_lateral(df, text_col: str = "text"):
    """DataFrame-side helper: documents -> (doc_id, word, word_id) via the
    UDTF lateral join."""
    ws = word_split_udtf()
    return (df.lateralJoin(ws(F.col(text_col).outer()))
            .select("doc_id", "word", "word_id"))
