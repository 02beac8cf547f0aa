"""Phase-level wall profile of q403's paired streaming lifecycle."""

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
    spark = get_spark(app_name="profile-q403")
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.paired import (
        paired_streaming_append,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import (
        PostingsStore,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq_store import IVFPQStore
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round29 import (
        _IVF_ITERS,
        _IVF_LISTS,
        _IVF_NPROBE,
        _PQ_K,
        _PQ_M,
        _PQ_NQ,
        _coarse_centroids,
        _pq_codebook,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round33 import (
        _QT_SHORTLIST,
        _qt_frame,
    )

    load(spark, sf_dir, "documents").count()
    for rep in range(2):
        marks = [("start", time.perf_counter())]

        def mark(label):
            marks.append((label, time.perf_counter()))

        docs = load(spark, sf_dir, "documents")
        e = load(spark, sf_dir, "embeddings")
        held = (F.col("vec_id") % 7) == 1
        held_ids = e.filter(held).select(F.col("vec_id").alias("doc_id"))
        init_docs = docs.join(held_ids, "doc_id", "left_anti")
        init_vecs = e.filter(~held)
        proot = tempfile.mkdtemp(prefix="prof403_p_") + "/ix"
        vroot = tempfile.mkdtemp(prefix="prof403_v_") + "/ix"
        ps = PostingsStore.build(spark, init_docs, "doc_id", "text", proot, n_buckets=16)
        mark("ps.build")
        vs = IVFPQStore.build(
            spark, init_vecs, "vec_id", "embedding", vroot,
            n_lists=_IVF_LISTS, km_iters=_IVF_ITERS, m=_PQ_M, k_centroids=_PQ_K,
            centroids=_coarse_centroids(spark, sf_dir),
            codebook=_pq_codebook(spark, sf_dir),
        )
        mark("vs.build")
        payload = docs.join(held_ids, "doc_id", "left_semi").join(
            e.filter(held).select("vec_id", "embedding"),
            F.col("doc_id") == F.col("vec_id"),
        )
        src = tempfile.mkdtemp(prefix="prof403_src_")
        payload.write.mode("overwrite").parquet(src)
        mark("payload.write")
        ckpt = tempfile.mkdtemp(prefix="prof403_ckpt_") + "/ckpt"
        stream = spark.readStream.schema(payload.schema).parquet(src)
        paired_streaming_append(ps, vs, stream, ckpt).awaitTermination()
        mark("stream")
        bm = ps.ranked_bm25_table(_qt_frame(spark), topk=_QT_SHORTLIST)
        bm.write.format("noop").mode("overwrite").save()
        mark("bm.serve")
        ann = vs.query(
            e.filter(F.col("vec_id") < _PQ_NQ),
            nprobe=_IVF_NPROBE, topk=_QT_SHORTLIST, query_mode="join",
        )
        ann.write.format("noop").mode("overwrite").save()
        mark("ann.serve")
        print(f"--- rep {rep} ---")
        for (l0, t0), (l1, t1) in zip(marks, marks[1:]):
            print(f"{l1:15s} {t1 - t0:7.2f}s")
        print(f"{'TOTAL':15s} {marks[-1][1] - marks[0][1]:7.2f}s")


if __name__ == "__main__":
    main()
