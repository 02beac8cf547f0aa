"""Python UDTFs (user-defined *table* functions, Spark ≥ 3.5).

The UDF surface of SURVEY §2.3 declares scalar UDFs, pandas_udfs, and
applyInPandas; a UDTF completes the set — one input row to N output rows
with a declared schema, usable from SQL via LATERAL. The reference's
response-normalization step (one REST page -> many records,
etl_connector.py:115-120) is exactly this shape.

Scale note: Python UDTFs are the slow path (row-serialized through the
Python worker, not Arrow-vectorized). Use them when per-row fan-out logic
genuinely needs Python; when the fan-out is expressible with
split/explode/transform (as the bigram twin in plans/extensions.py shows),
the JVM formulation wins at 100 TB. The engine declares both.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, pos: int")
class NGrams:
    """Emit word n-grams of ``text`` with their token position.

    Tokenization is a plain single-space split with empties preserved, so
    the output aligns token-for-token with SQL ``string_split`` /
    ``F.split`` across engines.
    """

    def eval(self, text: str, n: int):  # noqa: D102
        toks = (text or "").split(" ")
        for i in range(max(0, len(toks) - n + 1)):
            yield " ".join(toks[i : i + n]), i
