"""Corpus curation: the composed training-data pipeline (north-star ops
stacked the way a real pipeline runs them).

``curate`` = quality gate -> exact dedup (content fingerprint) -> near-dup
dedup (similarity-graph clustering), with per-stage accounting. Stage order
matters at scale: the cheap narrow filter runs first (prunes the scan),
exact dedup removes the bulk of redundancy with one hash shuffle, and the
pairwise near-dup machinery only sees the survivors. This mirrors the
reference pipeline's shape (filter -> dedup-by-key, etl_connector.py:194-203,
167-191) lifted from keyed records to open-text corpora.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.functions.text import quality_score
from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.dedup import content_dedup, near_dedup


@dataclass(frozen=True)
class CurationReport:
    """Per-stage accounting of a curate() run (R11 lifted to the corpus)."""

    n_input: int
    n_after_quality: int
    n_after_exact_dedup: int
    n_after_near_dedup: int

    @property
    def kept_fraction(self) -> float:
        return self.n_after_near_dedup / max(self.n_input, 1)


def curate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.9,
    with_report: bool = False,
) -> DataFrame | tuple[DataFrame, CurationReport]:
    """Curated corpus: quality-gated, exactly- and nearly-deduplicated.

    - quality gate: ``quality_score(text) >= min_quality`` (pure Column
      expression — pushed into the scan stage, no shuffle)
    - exact dedup: lowest id per content fingerprint (one hash shuffle)
    - near dedup: similarity-graph clustering at ``near_dup_threshold``
      (operators/dedup.near_dedup — canonical-set mining + components)

    With ``with_report`` the per-stage counts are computed (three actions)
    and returned alongside the frame; without it the whole chain stays lazy.
    """
    gated = df.filter(quality_score(F.col(text_col)) >= F.lit(min_quality))
    exact = content_dedup(gated, id_col, text_col)
    near = near_dedup(exact, id_col, text_col, threshold=near_dup_threshold)
    if not with_report:
        return near
    report = CurationReport(
        n_input=df.count(),
        n_after_quality=gated.count(),
        n_after_exact_dedup=exact.count(),
        n_after_near_dedup=near.count(),
    )
    return near, report
