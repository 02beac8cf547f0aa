"""Step-level timing of PostingsStore.upsert / delete internals at sf0.1."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.session import get_spark
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-upsert")
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import (
        PostingsStore,
        _with_stamp,
    )

    docs = load(spark, sf_dir, "documents")
    docs.count()

    for rep in range(2):
        root = tempfile.mkdtemp(prefix="prof_upsert_") + "/ix"
        t0 = time.perf_counter()
        ps = PostingsStore.build(spark, docs, "doc_id", "text", root, n_buckets=16)
        t1 = time.perf_counter()
        print(f"rep{rep} build          {t1 - t0:6.2f}s")

        up = docs.filter(F.col("doc_id") % 23 == 5).withColumn(
            "text", F.concat(F.lit("fused rank "), F.col("text"))
        )
        # --- replicate upsert internals with timing ---
        base = ps._ptr()
        base_data, base_doclen = ps._gen_dirs(int(base["gen"]))
        live = ps._read_leg(base_data, ps._postings_schema, "bucket=")
        live_dl = _with_stamp(ps._read_leg(base_doclen, ps._doclen_schema, "dbucket="))
        t2 = time.perf_counter()
        enc = ps._encode(up).persist()
        ids = up.select(F.col(ps.id_col).alias("doc_id")).distinct()
        touched = {int(r["bucket"]) for r in enc.select("bucket").distinct().collect()}
        t3 = time.perf_counter()
        print(f"rep{rep} enc+buckets    {t3 - t2:6.2f}s")
        prior = live.join(ids, "doc_id", "left_semi").select("bucket").distinct()
        touched |= {int(r["bucket"]) for r in prior.collect()}
        buckets = sorted(touched)
        t4 = time.perf_counter()
        print(f"rep{rep} prior-semijoin {t4 - t3:6.2f}s  ({len(buckets)} buckets)")
        new_dl = ps._doclen(up, stamp=7)
        dbuckets = sorted(
            int(r["dbucket"]) for r in new_dl.select("dbucket").distinct().collect()
        )
        t5 = time.perf_counter()
        print(f"rep{rep} dbuckets       {t5 - t4:6.2f}s  ({len(dbuckets)} dbuckets)")
        rewritten = (
            live.filter(F.col("bucket").isin(buckets))
            .join(ids, "doc_id", "left_anti")
            .unionByName(enc)
            .select("token", "doc_id", "pos", "bucket")
        )
        tmp_data = base_data + ".upsert"
        rewritten.write.mode("overwrite").partitionBy("bucket").parquet(tmp_data)
        t6 = time.perf_counter()
        print(f"rep{rep} write postings {t6 - t5:6.2f}s")
        dl_rewritten = (
            live_dl.filter(F.col("dbucket").isin(dbuckets))
            .join(ids, "doc_id", "left_anti")
            .unionByName(new_dl)
            .select("doc_id", "dlen", "mstamp", "dbucket")
        )
        tmp_doclen = base_doclen + ".upsert"
        dl_rewritten.write.mode("overwrite").partitionBy("dbucket").parquet(tmp_doclen)
        enc.unpersist()
        t7 = time.perf_counter()
        print(f"rep{rep} write doclen   {t7 - t6:6.2f}s")
        ps._swap_partitions(base, tmp_data, buckets, tmp_doclen, dbuckets)
        t8 = time.perf_counter()
        print(f"rep{rep} swap/hardlink  {t8 - t7:6.2f}s")
        print(f"rep{rep} UPSERT TOTAL   {t8 - t2:6.2f}s")
        # file counts
        import glob
        nfiles = len(glob.glob(os.path.join(ps._data_path(), "**", "*.parquet"), recursive=True))
        ndl = len(glob.glob(os.path.join(ps._doclen_path(), "**", "*.parquet"), recursive=True))
        print(f"rep{rep} files: postings={nfiles} doclen={ndl}")


if __name__ == "__main__":
    main()
