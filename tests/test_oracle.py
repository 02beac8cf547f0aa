"""Differential test: every oracle-paired query in the registry runs on
Spark AND DuckDB over the same parquet (SURVEY §5.2.1). Mimics the driver's
gate: column names, row counts, and values (doubles rounded to 6) must match
order-insensitively.

Run at sf0.001 by default for speed; set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's scale.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans import oracle_sql, queries
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import TABLES

_QUERIES = queries()
_ORACLES = oracle_sql()


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _oracle_df(con, sf_dir: str, sql: str) -> pd.DataFrame:
    """Run an oracle with a retry on transient DuckDB OOM (round-8
    hardening, VERDICT r7 hazard #1): under full-suite memory pressure a
    single allocation failure poisons the session-scoped connection and
    cascades into a contiguous block of FALSE failures that read as
    wrong answers. The retry runs the same SQL on a FRESH connection
    with its own views — an actual value mismatch still fails."""
    try:
        return con.sql(sql).df()
    except duckdb.OutOfMemoryException:
        fresh = duckdb.connect()
        try:
            for t in TABLES:
                fresh.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            return fresh.sql(sql).df()
        finally:
            fresh.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize like the driver: sort columns by name, round doubles to
    6, render timestamps as UTC strings, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: None if v is None else v)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def _assert_match(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            bad = ~(
                (sv.isna() & ov.isna())
                | (sv.notna() & ov.notna() & ((sv - ov).abs() <= 1e-6 + 1e-9 * ov.abs()))
            )
        else:
            bad = ~((sv.isna() & ov.isna()) | (sv.astype(str) == ov.astype(str)))
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"{name}: column {c!r} differs at canonical row {i}: "
                f"spark={sv[i]!r} oracle={ov[i]!r} "
                f"(of {int(bad.sum())} differing rows)\n"
                f"spark head:\n{s.head()}\noracle head:\n{o.head()}"
            )


# the two heaviest oracle differentials (multi-pass near-dedup / curation
# pipelines, ~30 s together): depth profile only — their operators keep
# dedicated default-run suites (test_dedup, test_curate), and the driver's
# own DuckDB gate re-verifies the declared queries every round
_SLOW_ORACLE = {"q53_near_dedup_corpus", "q54_curate_corpus"}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
        for n in sorted(_ORACLES)
    ],
)
def test_oracle_match(name, spark, sf_dir, ddb):
    spark_pdf = _QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = _oracle_df(ddb, sf_dir, _ORACLES[name])
    _assert_match(name, spark_pdf, oracle_pdf)


def test_oracle_retries_transient_oom_on_fresh_connection(sf_dir):
    """A connection that throws OutOfMemoryException (simulating the
    poisoned session connection) must not surface as a wrong answer:
    _oracle_df retries the same SQL on a fresh connection and returns
    the real result."""

    class _Poisoned:
        def sql(self, q):
            raise duckdb.OutOfMemoryException("Out of Memory (simulated)")

    name = "q01_pricing_summary"
    got = _oracle_df(_Poisoned(), sf_dir, _ORACLES[name])
    fresh = duckdb.connect()
    try:
        for t in TABLES:
            fresh.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        want = fresh.sql(_ORACLES[name]).df()
    finally:
        fresh.close()
    _assert_match(name, got, want)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_no_oracle_queries_run(name, spark, sf_dir):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_approx_distinct_error_bound(spark, sf_dir):
    """q16 has no oracle; bound its estimate against the exact count."""
    approx = {
        r.l_returnflag: r.approx_parts
        for r in _QUERIES["q16_distinct_approx"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.exact_parts
        for r in _QUERIES["q15_distinct_exact"](spark, sf_dir).collect()
    }
    for k, e in exact.items():
        assert math.isclose(approx[k], e, rel_tol=0.1), (k, approx[k], e)


def test_percentile_approx_error_bound(spark, sf_dir):
    """q67 has no oracle; bound the sketch against q35's exact percentiles."""
    approx = {
        r.event_type: (r.p25, r.p50, r.p75)
        for r in _QUERIES["q67_percentile_approx"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: (r.p25, r.p50, r.p75)
        for r in _QUERIES["q35_percentiles"](spark, sf_dir).collect()
    }
    for k, (e25, e50, e75) in exact.items():
        a25, a50, a75 = approx[k]
        spread = abs(e75 - e25) + 1e-9
        for a, e in ((a25, e25), (a50, e50), (a75, e75)):
            assert abs(a - e) <= 0.05 * spread + 1e-6, (k, a, e)


# ---------------------------------------------------------------------------
# Corner-case differentials: run selected oracle pairs on constructed
# fixtures that the driver's synthetic tables never produce (empty inputs,
# fractional quantities) — pinning the cross-engine edge semantics
# (NULL-guarded ratios, coalesced empty sums, round-before-cast).
# ---------------------------------------------------------------------------


def _compare_corner(spark, dirpath, name):
    import os

    con = duckdb.connect()
    for t in TABLES:
        f = f"{dirpath}/{t}.parquet"
        if os.path.exists(f):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{f}/*.parquet')")
    try:
        spark_pdf = _QUERIES[name](spark, str(dirpath)).toPandas()
        oracle_pdf = con.sql(_ORACLES[name]).df()
        _assert_match(name, spark_pdf, oracle_pdf)
    finally:
        con.close()


def test_q344_empty_corpus_corner(spark, tmp_path):
    """Empty documents: n_trigrams/vocab/hapax must be 0 (not NULL) and the
    ratios NULL in BOTH engines (no Infinity, no NULL-vs-0 drift)."""
    d = tmp_path / "sf_corner"
    d.mkdir()
    spark.createDataFrame([], "doc_id long, source string, text string").write.parquet(
        str(d / "documents.parquet")
    )
    _compare_corner(spark, d, "q344_good_turing")


def test_q344_hapax_free_corner(spark, tmp_path):
    """A corpus where every trigram occurs >= 2 times: N1 = 0, so
    r_star_hapax must be NULL in both engines (DuckDB ieee division would
    otherwise yield Infinity vs Spark NULL)."""
    d = tmp_path / "sf_corner"
    d.mkdir()
    txt = "a b c a b c a b c"
    spark.createDataFrame(
        [(1, "s", txt), (2, "s", txt)], "doc_id long, source string, text string"
    ).write.parquet(str(d / "documents.parquet"))
    _compare_corner(spark, d, "q344_good_turing")


def test_q345_fractional_quantity_corner(spark, tmp_path):
    """Fractional (x.5) quantities: without round-before-cast Spark's
    truncating long cast and DuckDB's half-away-from-zero cast would place
    run boundaries differently."""
    d = tmp_path / "sf_corner"
    d.mkdir()
    rows = [
        (1, 1, 10, "N", 2.5),
        (1, 2, 10, "N", 3.49),
        (1, 3, 10, "N", 2.5),
        (1, 4, 11, "N", 3.5),
        (2, 1, 11, "R", 0.5),
        (2, 2, 11, "R", 1.0),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_suppkey long, "
        "l_returnflag string, l_quantity double",
    ).write.parquet(str(d / "lineitem.parquet"))
    _compare_corner(spark, d, "q345_rle_profile")


def test_q345_empty_lineitem_corner(spark, tmp_path):
    """Empty lineitem: run counts 0 (not NULL) and rle_ratio NULL in both
    engines."""
    d = tmp_path / "sf_corner"
    d.mkdir()
    spark.createDataFrame(
        [],
        "l_orderkey long, l_linenumber int, l_suppkey long, "
        "l_returnflag string, l_quantity double",
    ).write.parquet(str(d / "lineitem.parquet"))
    _compare_corner(spark, d, "q345_rle_profile")
