"""Round-8 pinned-read leases (genstore.gen_lease + the stores'
``pinned()``): a read lease makes a pinned generation survive vacuum()
and retention trims for the lease's lifetime — lazy pinned DataFrames
materialize instead of dying mid-job with a file-not-found — and the
directory is reclaimed after release. Crashed lease holders (dead pids)
never pin retention forever.
"""

from __future__ import annotations

import os
import subprocess

import pytest
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators import genstore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import PostingsStore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq_store import IVFPQStore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

TERMS = ["table", "sort", "hash"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_postings_lease_survives_vacuum_then_reclaims(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    store = PostingsStore.build(
        spark, docs, "doc_id", "text", str(tmp_path / "p"), n_buckets=8
    )
    g0 = store.current_gen()
    want = _rows(store.ranked_bm25(TERMS, topk=10))
    with store.pinned(g0) as g:
        # lazy pinned frame created BEFORE maintenance
        pinned_df = store.ranked_bm25(TERMS, topk=10, as_of_gen=g)
        store.upsert(
            docs.filter(F.col("doc_id") % 7 == 1).withColumn(
                "text", F.concat(F.lit("table sort "), F.col("text"))
            )
        )
        store.vacuum()  # would sweep g0 without the lease
        d0, dl0 = store._gen_dirs(g0)
        assert os.path.isdir(d0) and os.path.isdir(dl0)  # lease held
        assert _rows(pinned_df) == want  # materializes fine mid-lease
        # NEW pinned reads inside the lease also still resolve
        assert _rows(store.ranked_bm25(TERMS, topk=10, as_of_gen=g)) == want
    # lease released: pinned reads fail LOUDLY, next publish reclaims
    with pytest.raises(LookupError, match="vacuumed|leased"):
        store.ranked_bm25(TERMS, topk=10, as_of_gen=g0)
    store.delete(docs.filter(F.col("doc_id") % 13 == 2).select("doc_id"))
    assert not os.path.isdir(d0) and not os.path.isdir(dl0)


def test_pq_lease_survives_retention_trim(spark, sf_dir, tmp_path):
    e = load(spark, sf_dir, "embeddings")
    store = IVFPQStore.build(spark, e, "vec_id", "embedding", str(tmp_path / "v"))
    store.keep_gens = 1  # tight retention: one mutation trims g0 fast
    g0 = store.current_gen()
    q = e.filter(F.col("vec_id") < 2)
    want = _rows(store.query(q, nprobe=2, topk=5))
    with store.pinned(g0) as g:
        pinned_df = store.query(q, nprobe=2, topk=5, as_of_gen=g)
        store.upsert(
            e.filter(F.col("vec_id") % 5 == 3).withColumn(
                "embedding", F.reverse(F.col("embedding"))
            )
        )
        store.delete(e.filter(F.col("vec_id") % 11 == 4).select("vec_id"))
        # two publishes with keep_gens=1: g0 fell out of retention, but
        # the lease kept its directory
        assert os.path.isdir(os.path.join(store.path, store._gen_name(g0)))
        assert _rows(pinned_df) == want
        assert _rows(store.query(q, nprobe=2, topk=5, as_of_gen=g)) == want
    with pytest.raises(LookupError, match="leased"):
        store.query(q, nprobe=2, topk=5, as_of_gen=g0)
    store.vacuum()
    assert not os.path.isdir(os.path.join(store.path, store._gen_name(g0)))


def test_dead_holder_lease_is_ignored_and_swept(tmp_path):
    p = subprocess.Popen(["true"])
    p.wait()
    d = os.path.join(str(tmp_path), genstore._LEASE_ROOT)
    os.makedirs(d)
    with open(os.path.join(d, f"data-00000001.{p.pid}-1"), "w") as f:
        f.write(str(p.pid))
    assert genstore.leased_dirnames(str(tmp_path)) == set()
    assert os.listdir(d) == []  # stale lease swept


def test_live_lease_listed(tmp_path):
    with genstore.gen_lease(str(tmp_path), "data-00000007"):
        assert genstore.leased_dirnames(str(tmp_path)) == {"data-00000007"}
    assert genstore.leased_dirnames(str(tmp_path)) == set()
