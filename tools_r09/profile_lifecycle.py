"""Phase-level wall profile of the store lifecycle verbs at sf0.1.

Times each sub-step of the q404-shaped lifecycle (the superset: build
both stores, single-store verbs, reconcile, repair, stamp surface) so
optimization targets the right verb. Run on a quiet machine.
"""

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
    spark = get_spark(app_name="profile-lifecycle")
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings_store import (
        PostingsStore,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.pq_store import IVFPQStore
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.reconcile import (
        reconcile_stores,
        store_stamps,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.paired import repair_drift
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round29 import (
        _IVF_ITERS,
        _IVF_LISTS,
        _PQ_K,
        _PQ_M,
        _coarse_centroids,
        _pq_codebook,
    )
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round35 import (
        _AUD_PDEL,
        _AUD_STAMP,
        _AUD_UPS,
        _AUD_VDEL,
    )

    marks: list[tuple[str, float]] = []

    def mark(label):
        marks.append((label, time.perf_counter()))

    # warm
    load(spark, sf_dir, "documents").count()

    for rep in range(int(os.environ.get("REPS", "2"))):
        docs = load(spark, sf_dir, "documents")
        e = load(spark, sf_dir, "embeddings")
        base_docs = docs.join(
            e.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
        )
        proot = tempfile.mkdtemp(prefix="prof_p_") + "/ix"
        vroot = tempfile.mkdtemp(prefix="prof_v_") + "/ix"
        mark("start")
        spark.sparkContext.setJobDescription("prof: ps.build")
        ps = PostingsStore.build(spark, base_docs, "doc_id", "text", proot, n_buckets=16)
        mark("ps.build")
        spark.sparkContext.setJobDescription("prof: vs.build")
        vs = IVFPQStore.build(
            spark, e, "vec_id", "embedding", vroot,
            n_lists=_IVF_LISTS, km_iters=_IVF_ITERS, m=_PQ_M, k_centroids=_PQ_K,
            centroids=_coarse_centroids(spark, sf_dir),
            codebook=_pq_codebook(spark, sf_dir),
        )
        mark("vs.build")
        spark.sparkContext.setJobDescription("prof: ps.upsert")
        ps.upsert(
            base_docs.filter(F.col("doc_id") % _AUD_UPS == 2).withColumn(
                "text", F.concat(F.lit("stale edit "), F.col("text"))
            ),
            stamp=_AUD_STAMP,
        )
        mark("ps.upsert")
        spark.sparkContext.setJobDescription("prof: ps.delete")
        ps.delete(base_docs.filter(F.col("doc_id") % _AUD_PDEL == 3).select("doc_id"))
        mark("ps.delete")
        spark.sparkContext.setJobDescription("prof: vs.delete")
        vs.delete(e.filter(F.col("vec_id") % _AUD_VDEL == 4).select("vec_id"))
        mark("vs.delete")
        spark.sparkContext.setJobDescription("prof: reconcile+repair")
        repair_drift(ps, vs, reconcile_stores(ps, vs), base_docs, e)
        mark("repair_drift")
        spark.sparkContext.setJobDescription("prof: stamp surface")
        store_stamps(ps, vs).select("doc_id", "p_stamp", "v_stamp").write.format(
            "noop"
        ).mode("overwrite").save()
        mark("serve")
        print(f"--- rep {rep} ---")
        for (l0, t0), (l1, t1) in zip(marks, marks[1:]):
            print(f"{l1:15s} {t1 - t0:7.2f}s")
        total = marks[-1][1] - marks[0][1]
        print(f"{'TOTAL':15s} {total:7.2f}s")
        marks.clear()


if __name__ == "__main__":
    main()
