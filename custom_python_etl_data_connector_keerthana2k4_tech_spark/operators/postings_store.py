"""Persistent positional postings store: the on-disk inverted index
behind ``operators/postings.py``'s scale claim.

Postings rows (token, doc_id, pos) are written partitioned by a stable
TOKEN-HASH BUCKET (``hex_hash60(token) % n_buckets`` — the cross-engine
md5 hash with a driver-side twin, functions/text.py), so a phrase
query's bucket set is computable on the driver and the ``bucket IN``
predicate becomes PartitionFilters — a k-token phrase opens at most k
bucket directories, never the corpus. Appends (batch or streaming
``foreachBatch``) encode with the same layout, so the index grows under
ingest; queries reuse ``postings.phrase_match`` unchanged on the pruned
reader (the operator is layout-agnostic — the store only narrows what
gets scanned).

Why hash buckets and not one directory per token: real vocabularies are
millions of tokens (file-system metadata death); a fixed bucket count
keeps directory fan-out constant while still pruning ~(1 - k/n_buckets)
of the bytes per query. Reference parity: no text/search surface in the
reference at all (SURVEY §0, §2.2).

Durability model (round 6 — the pq_store discipline applied to the
lexical index):

- GENERATIONS: maintenance verbs (``compact``/``upsert``/``delete``)
  never mutate live directories. They build generation ``N+1`` (postings
  AND the doclen sidecar — both flip together) and commit with ONE
  atomic pointer-file replace, so a crash at any step leaves the store
  fully readable under the old pointer. Untouched bucket directories
  carry into the new generation as HARDLINKS (no bytes copied): an
  upsert of a handful of documents rewrites only the buckets their
  tokens hash to, never the corpus.
- EPOCH COMMITS: ``streaming_append`` stages each micro-batch in a
  temp directory and publishes it with one atomic directory rename,
  keyed by the epoch id — a RETRIED epoch sees its commit directory and
  skips, so at-least-once foreachBatch delivery becomes exactly-once
  index content (a blind parquet append would double-count postings and,
  worse, duplicate doclen sidecar rows, silently skewing every BM25
  score). One streaming lineage (checkpoint) per store: epoch ids are
  only unique within a checkpoint.
- The doclen sidecar is partitioned by a DOC-hash bucket (``dbucket``),
  so document upsert/delete rewrites only the touched dbucket
  directories — dbucket is a pure function of doc_id, hence stable
  across text edits.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import hex_hash60, py_hex_hash60
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators import genstore
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import build_postings, phrase_match

_PARAMS_FILE = "_postings_params.json"
_DATA_DIR = "data"
_DOCLEN_DIR = "doclen"
_STORE_PTR = "_store_ptr"  # names the live generation (crash-safe publish)
_EPOCH_ROOT = genstore.EPOCH_ROOT


class PostingsStore:
    """A bucket-partitioned positional inverted index on disk."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, _PARAMS_FILE)) as f:
            p = json.load(f)
        self.n_buckets: int = p["n_buckets"]
        self.id_col: str = p["id_col"]
        self.text_col: str = p["text_col"]

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        id_col: str,
        text_col: str,
        path: str,
        n_buckets: int = 64,
    ) -> "PostingsStore":
        os.makedirs(path, exist_ok=True)
        tmp = os.path.join(path, _PARAMS_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(
                {"n_buckets": n_buckets, "id_col": id_col, "text_col": text_col}, f
            )
        os.replace(tmp, os.path.join(path, _PARAMS_FILE))
        store = cls(spark, path)
        store._encode(docs).write.mode("overwrite").partitionBy("bucket").parquet(
            store._data_path()
        )
        store._doclen(docs).write.mode("overwrite").partitionBy("dbucket").parquet(
            store._doclen_path()
        )
        return store

    # -- generations ----------------------------------------------------------

    def _ptr(self) -> dict:
        """The live-generation pointer (operators/genstore.py):
        ``{"gen": N, "folded": [epoch names], "watermark": max folded
        epoch id}``. Generation 0 is the original ``data``/``doclen``
        pair; no pointer file means generation 0 with nothing folded.
        ``folded`` lists epoch commits whose rows are already contained
        in the live generation (compact folds them) — readers skip them
        even if a crash between the pointer flip and the directory sweep
        left them on disk; the watermark makes a REPLAY of a folded-and-
        swept epoch a no-op (crash between fold and the streaming
        checkpoint)."""
        return genstore.read_ptr(os.path.join(self.path, _STORE_PTR), 0)

    def _gen_dirs(self, gen: int) -> tuple[str, str]:
        if gen == 0:
            return (
                os.path.join(self.path, _DATA_DIR),
                os.path.join(self.path, _DOCLEN_DIR),
            )
        return (
            os.path.join(self.path, f"{_DATA_DIR}-{gen:08d}"),
            os.path.join(self.path, f"{_DOCLEN_DIR}-{gen:08d}"),
        )

    def _data_path(self) -> str:
        return self._gen_dirs(self._ptr()["gen"])[0]

    def _doclen_path(self) -> str:
        return self._gen_dirs(self._ptr()["gen"])[1]

    def _publish(self, gen: int, newly_folded: list[str]) -> None:
        """Commit generation ``gen`` with ONE atomic pointer replace
        (postings and doclen flip together — folded epochs and the
        advanced watermark ride the same write), then sweep every stale
        ``data*``/``doclen*`` sibling and every folded epoch directory.
        Post-flip, anything that is not the live generation or a live
        epoch is garbage by construction (single-maintainer contract),
        so each maintenance call is also a full orphan sweep. After the
        sweep, folded entries whose directories are gone are pruned from
        the pointer (a second atomic replace — a crash between the two
        just leaves harmless tombstones; the watermark keeps refusing
        their replays either way)."""
        prev = self._ptr()
        folded_all, wm = genstore.fold_bookkeeping(prev, newly_folded)
        data, doclen = self._gen_dirs(gen)
        live = {os.path.basename(data), os.path.basename(doclen)}
        ptr = os.path.join(self.path, _STORE_PTR)
        genstore.write_ptr(ptr, gen, folded_all, wm)
        for name in os.listdir(self.path):
            if (
                name.startswith((_DATA_DIR, _DOCLEN_DIR))
                and name not in live
            ):
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
        remaining = genstore.sweep_folded(self.path, folded_all)
        genstore.write_ptr(ptr, gen, remaining, wm)

    def _next_gen(self) -> int:
        return int(self._ptr()["gen"]) + 1

    def _epochs(self) -> list[str]:
        """Committed, unfolded epoch directory names (sorted)."""
        return genstore.list_epochs(self.path, self._ptr()["folded"])

    # -- encode / ingest ------------------------------------------------------

    def _doclen(self, docs: DataFrame) -> DataFrame:
        """(doc_id, dlen, dbucket) — dlen counts the same slots
        build_postings emits (single-space split, empties kept), so the
        sidecar always agrees with the postings rows per doc; dbucket is
        the doc-hash partition (stable across text edits)."""
        return docs.select(
            F.col(self.id_col).alias("doc_id"),
            F.size(F.split(F.col(self.text_col), " ")).cast("long").alias("dlen"),
        ).withColumn(
            "dbucket",
            (hex_hash60(F.col("doc_id").cast("string")) % self.n_buckets).cast(
                "int"
            ),
        )

    def _encode(self, docs: DataFrame) -> DataFrame:
        postings = build_postings(docs, self.id_col, self.text_col)
        return postings.withColumn(
            "bucket",
            (hex_hash60(F.col("token")) % self.n_buckets).cast("int"),
        )

    def append(self, docs: DataFrame) -> None:
        """Synchronous batch append into the live generation (no retry
        semantics — streaming ingest goes through the epoch-commit path
        instead)."""
        self._encode(docs).write.mode("append").partitionBy("bucket").parquet(
            self._data_path()
        )
        self._doclen(docs).write.mode("append").partitionBy("dbucket").parquet(
            self._doclen_path()
        )

    def _commit_epoch(self, docs: DataFrame, epoch_id: int) -> None:
        """Exactly-once micro-batch ingest (genstore.commit_epoch): a
        retried epoch finds its commit directory — or an id at-or-below
        the folded watermark (folded and swept before the streaming
        checkpoint recorded it) — and skips, so at-least-once
        foreachBatch delivery never double-counts a posting or a doclen
        row."""

        def write_legs(tmp: str) -> None:
            self._encode(docs).write.mode("overwrite").partitionBy(
                "bucket"
            ).parquet(os.path.join(tmp, "postings"))
            self._doclen(docs).write.mode("overwrite").partitionBy(
                "dbucket"
            ).parquet(os.path.join(tmp, "doclen"))

        genstore.commit_epoch(
            self.path, epoch_id, self._ptr()["watermark"], write_legs
        )

    def streaming_append(self, stream: DataFrame, checkpoint_dir: str):
        """Index new documents as they arrive. Exactly-once per epoch:
        each micro-batch publishes through ``_commit_epoch``'s atomic
        rename, so a crash-and-replay of an epoch cannot double-append
        (and cannot skew ranked_bm25's n_docs/avg_len via duplicated
        doclen rows). One streaming lineage per store — epoch ids are
        unique only within a checkpoint; run ``compact()`` before
        pointing a NEW stream at an old store. Returns the started
        StreamingQuery."""
        return (
            stream.writeStream.foreachBatch(
                lambda b, eid: self._commit_epoch(b, eid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- maintenance ----------------------------------------------------------

    def compact(self) -> None:
        """Fold every committed epoch into a fresh generation and rewrite
        each bucket into one file (the small-files maintenance verb:
        streaming ingest leaves one file set per epoch per touched
        bucket). The epoch list is SNAPSHOT once and both the fold input
        and the pointer record use exactly that snapshot — an epoch a
        racing stream commits mid-compact stays a live union leg, never
        half-folded. Publishes behind the atomic pointer flip; folded
        epochs are recorded (and the watermark advanced) BEFORE their
        directories are swept, so a crash mid-sweep never double-counts
        them and a replay of a swept epoch is refused."""
        eps = self._epochs()
        gen = self._next_gen()
        data, doclen = self._gen_dirs(gen)
        shutil.rmtree(data, ignore_errors=True)
        shutil.rmtree(doclen, ignore_errors=True)
        (
            self._union_legs(self._data_path(), "postings", "bucket=", eps)
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(data)
        )
        (
            self._union_legs(self._doclen_path(), "doclen", "dbucket=", eps)
            .repartition("dbucket")
            .write.mode("overwrite")
            .partitionBy("dbucket")
            .parquet(doclen)
        )
        self._publish(gen, eps)

    def _swap_partitions(
        self,
        tmp_data: str,
        touched_buckets: list[int],
        tmp_doclen: str,
        touched_dbuckets: list[int],
    ) -> None:
        """Publish a partition-selective rewrite: generation N+1 takes
        the rewritten bucket/dbucket directories from the temp writes
        and HARDLINKS every untouched directory's files from the live
        generation (no bytes copied), then the pointer flips atomically.
        The live directories are never mutated — a crash at any step
        leaves the store readable under the old pointer; half-built
        generations are swept by the next publish."""
        gen = self._next_gen()
        new_data, new_doclen = self._gen_dirs(gen)
        for new, old, tmp, touched in (
            (new_data, self._data_path(), tmp_data,
             {f"bucket={b}" for b in touched_buckets}),
            (new_doclen, self._doclen_path(), tmp_doclen,
             {f"dbucket={b}" for b in touched_dbuckets}),
        ):
            shutil.rmtree(new, ignore_errors=True)
            os.makedirs(new)
            for name in os.listdir(old):
                src = os.path.join(old, name)
                if name in touched or not os.path.isdir(src):
                    continue
                os.makedirs(os.path.join(new, name))
                for f in os.listdir(src):
                    os.link(os.path.join(src, f), os.path.join(new, name, f))
            for name in sorted(touched):
                src = os.path.join(tmp, name)
                if os.path.exists(src):
                    os.rename(src, os.path.join(new, name))
        self._publish(gen, self._ptr().get("folded", []))
        shutil.rmtree(tmp_data, ignore_errors=True)
        shutil.rmtree(tmp_doclen, ignore_errors=True)

    def upsert(self, docs: DataFrame) -> None:
        """Replace-or-insert documents by id, rewriting ONLY the touched
        partitions: the token buckets the new postings land in, plus the
        buckets currently holding older versions of the same doc ids
        (found with one semi-join scan — the pq_store contract), plus
        the doc ids' dbucket directories in the doclen sidecar (dbucket
        is a pure function of doc_id, so old and new rows share it).
        Committed epochs are folded first (``compact``) so the rewrite
        has a single base generation to link from, and the rewrite reads
        THAT generation only — an epoch a racing stream commits after
        the fold stays a separate live leg (never duplicated by the
        rewrite, though also not deduplicated against it: quiesce the
        stream before maintenance, the single-maintainer contract)."""
        if self._epochs():
            self.compact()
        live = self.spark.read.parquet(self._data_path())
        live_dl = self.spark.read.parquet(self._doclen_path())
        enc = self._encode(docs).persist()
        ids = docs.select(F.col(self.id_col).alias("doc_id")).distinct()
        touched = {
            int(r["bucket"]) for r in enc.select("bucket").distinct().collect()
        }
        prior = (
            live
            .join(ids, "doc_id", "left_semi")
            .select("bucket")
            .distinct()
        )
        touched |= {int(r["bucket"]) for r in prior.collect()}
        buckets = sorted(touched)
        new_dl = self._doclen(docs)
        dbuckets = sorted(
            int(r["dbucket"]) for r in new_dl.select("dbucket").distinct().collect()
        )

        rewritten = (
            live
            .filter(F.col("bucket").isin(buckets))
            .join(ids, "doc_id", "left_anti")
            .unionByName(enc)
            .select("token", "doc_id", "pos", "bucket")
        )
        tmp_data = self._data_path() + ".upsert"
        rewritten.write.mode("overwrite").partitionBy("bucket").parquet(tmp_data)

        dl_rewritten = (
            live_dl
            .filter(F.col("dbucket").isin(dbuckets))
            .join(ids, "doc_id", "left_anti")
            .unionByName(new_dl)
            .select("doc_id", "dlen", "dbucket")
        )
        tmp_doclen = self._doclen_path() + ".upsert"
        dl_rewritten.write.mode("overwrite").partitionBy("dbucket").parquet(
            tmp_doclen
        )
        enc.unpersist()
        self._swap_partitions(tmp_data, buckets, tmp_doclen, dbuckets)

    def delete(self, ids: DataFrame) -> None:
        """Remove documents by id (a one-column frame), rewriting only
        the token buckets that hold their postings and the dbucket
        directories that hold their doclen rows."""
        if self._epochs():
            self.compact()
        live = self.spark.read.parquet(self._data_path())
        live_dl = self.spark.read.parquet(self._doclen_path())
        vids = ids.toDF("doc_id").distinct()
        homes = (
            live
            .join(vids, "doc_id", "left_semi")
            .select("bucket")
            .distinct()
        )
        buckets = sorted(int(r["bucket"]) for r in homes.collect())
        # touched sidecar partitions come from EXISTING doclen rows (the
        # same semi-join device as the postings side), so deleting
        # already-absent ids is a true no-op — hashing the requested ids
        # would rewrite (and de-hardlink) dbucket dirs that hold nothing
        dhomes = (
            live_dl
            .join(vids, "doc_id", "left_semi")
            .select("dbucket")
            .distinct()
        )
        dbuckets = sorted(int(r["dbucket"]) for r in dhomes.collect())
        if not buckets and not dbuckets:
            return

        kept = (
            live
            .filter(F.col("bucket").isin(buckets))
            .join(vids, "doc_id", "left_anti")
            .select("token", "doc_id", "pos", "bucket")
        )
        tmp_data = self._data_path() + ".delete"
        kept.write.mode("overwrite").partitionBy("bucket").parquet(tmp_data)

        dl_kept = (
            live_dl
            .filter(F.col("dbucket").isin(dbuckets))
            .join(vids, "doc_id", "left_anti")
            .select("doc_id", "dlen", "dbucket")
        )
        tmp_doclen = self._doclen_path() + ".delete"
        dl_kept.write.mode("overwrite").partitionBy("dbucket").parquet(tmp_doclen)
        self._swap_partitions(tmp_data, buckets, tmp_doclen, dbuckets)

    # -- read -----------------------------------------------------------------

    def _union_legs(
        self, base: str, sub: str, part_prefix: str,
        epochs: list[str] | None = None,
    ) -> DataFrame:
        """The live generation plus every committed epoch's ``sub``
        directory, unioned by name (``epochs`` pins an explicit snapshot
        — compact/maintenance pass one so a racing stream commit can't
        slip between listing and reading). Empty epoch writes (a 0-row
        micro-batch) leave no partition directories and are skipped."""
        df = self.spark.read.parquet(base)
        eroot = os.path.join(self.path, _EPOCH_ROOT)
        for ep in self._epochs() if epochs is None else epochs:
            leg = os.path.join(eroot, ep, sub)
            if not os.path.isdir(leg) or not any(
                name.startswith(part_prefix) for name in os.listdir(leg)
            ):
                continue
            df = df.unionByName(self.spark.read.parquet(leg))
        return df

    def reader(self) -> DataFrame:
        return self._union_legs(self._data_path(), "postings", "bucket=")

    def doclen_reader(self) -> DataFrame:
        """The (doc_id, dlen, dbucket) sidecar; raises a descriptive
        error for stores built before the sidecar existed (rebuild to
        enable ranked retrieval)."""
        if not os.path.isdir(self._doclen_path()):
            raise FileNotFoundError(
                "this postings store has no doclen sidecar (built by an "
                "older version?) — rebuild the store to enable ranked_bm25"
            )
        return self._union_legs(self._doclen_path(), "doclen", "dbucket=")

    # -- query ----------------------------------------------------------------

    def ranked_bm25(
        self, terms: list[str], topk: int = 10,
        k1: float = 1.2, b: float = 0.75,
    ) -> DataFrame:
        """Okapi BM25 ranked retrieval FROM the store — the query a
        retrieval user actually runs (phrase() is the exact-match
        sibling). Plan: the query terms' bucket directories prune via
        PartitionFilters (<= |terms| dirs opened, plan-asserted in
        tests), tf/df derive from the pruned postings only, and the
        corpus-level length stats come from the ``doclen`` sidecar the
        store maintains at build/append time (a 2-column frame whose
        aggregate is a 1-row broadcast) — so scoring never rescans the
        corpus text. Scoring is q171's operand-identical BM25 tree
        (plans/round4.py), and the final top-k is an orderBy+limit
        (TakeOrderedAndProject — distributed partial top-k, no global
        window). Ties break on doc_id. Returns doc_id, bm25,
        n_terms_hit (the top ``topk`` by score)."""
        if not terms:
            raise ValueError("empty term set")
        buckets = sorted({py_hex_hash60(t) % self.n_buckets for t in terms})
        pruned = (
            self.reader()
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("token").isin(list(terms)))
        )
        tf = pruned.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dl = self.doclen_reader().select(
            F.col("doc_id").alias("d_id"), "dlen"
        )
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avg_len"),
        )
        dfreq = tf.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        ).select(F.col("token").alias("f_term"), "df")
        idf = F.log(
            ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
            + 1
        )
        contrib = idf * (
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + (F.lit(b) * F.col("dlen")) / F.col("avg_len"))
            )
        )
        # Order-independent sum (exact DECIMAL accumulation, then one
        # deterministic cast): per-(doc) contributions arrive in whatever
        # order partial aggregation delivers them, and a plain double sum
        # would drift by an ulp between plans — this keeps the single-query
        # and query-table paths (and the DuckDB oracle) bit-identical.
        scored = (
            tf.join(F.broadcast(dfreq), tf.token == F.col("f_term"))
            .join(dl, tf.doc_id == F.col("d_id"))
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(
                F.sum(contrib.cast("decimal(30,10)")).cast("double").alias("bm25"),
                F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            )
        )
        return scored.orderBy(F.desc("bm25"), "doc_id").limit(topk)

    def ranked_bm25_table(
        self, query_terms: DataFrame, topk: int = 10,
        k1: float = 1.2, b: float = 0.75,
        query_id_col: str = "query_id", term_col: str = "term",
    ) -> DataFrame:
        """BM25 ranked retrieval for a query TABLE — the batch sibling of
        ``ranked_bm25`` (which serves ONE Python term list). Queries stay
        a DataFrame end to end: ``query_terms`` is a (query_id, term)
        frame (duplicates collapse, matching the single-query ``isin``
        semantics), and the result is row-identical per query to looping
        ``ranked_bm25`` over each query's terms (pinned in tests).

        Plan: the only driver collect is the distinct BUCKET ids of the
        queries' terms (<= n_buckets ints at any Q — the pq_store
        join-mode device), so the bucket predicate stays a literal
        PartitionFilters entry; the postings are additionally semi-joined
        to the distinct term set (evaluated where the terms live, never
        collected). tf/df compute ONCE over the union of all query terms
        and are shared across queries — df(token) is a corpus property,
        so per-query and batch scoring agree exactly. The per-query fan
        out is one equi-join of tf against the (query_id, term) frame;
        corpus length stats are the 1-row doclen-sidecar broadcast; the
        per-query cut is a window top-k (ties on doc_id, the single-query
        rule). Returns query_id, doc_id, bm25, n_terms_hit, rank."""
        qts = (
            query_terms.select(
                F.col(query_id_col).alias("query_id"),
                F.col(term_col).alias("token"),
            )
            # NULL terms can never match a posting (the equi-join drops
            # them) — filter them here so the bucket collect below can't
            # surface a None bucket as an opaque TypeError
            .filter(F.col("token").isNotNull())
            .distinct()
        )
        buckets = sorted(
            int(r["bucket"])
            for r in qts.select(
                (hex_hash60(F.col("token")) % self.n_buckets)
                .cast("int")
                .alias("bucket")
            )
            .distinct()
            .collect()
        )
        if not buckets:
            raise ValueError("empty query-term table")
        terms = qts.select("token").distinct()
        pruned = (
            self.reader()
            .filter(F.col("bucket").isin(buckets))
            .join(terms, "token", "left_semi")
        )
        tf = pruned.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dl = self.doclen_reader().select(
            F.col("doc_id").alias("d_id"), "dlen"
        )
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avg_len"),
        )
        dfreq = tf.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        ).select(F.col("token").alias("f_term"), "df")
        idf = F.log(
            ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
            + 1
        )
        contrib = idf * (
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + (F.lit(b) * F.col("dlen")) / F.col("avg_len"))
            )
        )
        scored = (
            tf.join(qts, "token")
            .join(F.broadcast(dfreq), tf.token == F.col("f_term"))
            .join(dl, tf.doc_id == F.col("d_id"))
            .crossJoin(F.broadcast(stats))
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum(contrib.cast("decimal(30,10)")).cast("double").alias("bm25"),
                F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), "doc_id")
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= topk)
            .select("query_id", "doc_id", "bm25", "n_terms_hit", "rank")
        )

    def phrase(self, phrase: list[str]) -> DataFrame:
        """Exact phrase search reading ONLY the phrase tokens' buckets
        (driver-computed via the cross-engine hash twin; the bucket IN
        predicate lands in PartitionFilters)."""
        buckets = sorted({py_hex_hash60(tok) % self.n_buckets for tok in phrase})
        pruned = self.reader().filter(F.col("bucket").isin(buckets))
        return phrase_match(pruned.select("token", "doc_id", "pos"), phrase)

    def phrase_table(
        self,
        phrases: DataFrame,
        phrase_id_col: str = "phrase_id",
        pos_col: str = "ppos",
        term_col: str = "term",
    ) -> DataFrame:
        """Exact phrase search for a phrase TABLE — the batch sibling of
        ``phrase`` (ranked_bm25_table's device applied to adjacency):
        the only driver collect is the distinct BUCKET ids of the
        phrases' terms (<= n_buckets ints at any number of phrases, so
        the bucket predicate stays literal PartitionFilters), the
        postings additionally semi-join to the distinct term set, and
        ``phrase_match_table`` resolves all phrases in ONE anchor-
        alignment join. Row-identical per phrase to looping ``phrase``
        (pinned in tests). Returns phrase_id, doc_id, n_matches,
        first_pos."""
        from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.postings import (
            phrase_match_table,
        )

        ph = phrases.select(
            F.col(phrase_id_col).alias("phrase_id"),
            F.col(pos_col).alias("ppos"),
            F.col(term_col).alias("term"),
        )
        raw = [
            r["bucket"]
            for r in ph.select(
                (hex_hash60(F.col("term")) % self.n_buckets)
                .cast("int")
                .alias("bucket")
            )
            .distinct()
            .collect()
        ]
        if any(b is None for b in raw):
            # a NULL slot can never match a token, and silently dropping
            # it would SHORTEN the phrase (adjacency would skip the slot)
            raise ValueError("phrase table contains a NULL term slot")
        buckets = sorted(int(b) for b in raw)
        if not buckets:
            raise ValueError("empty phrase table")
        terms = ph.select(F.col("term").alias("token")).distinct()
        pruned = (
            self.reader()
            .filter(F.col("bucket").isin(buckets))
            .join(terms, "token", "left_semi")
            .select("token", "doc_id", "pos")
        )
        return phrase_match_table(pruned, ph)
