"""Z-order layout: the point is file/row-group skipping, so the test reads
the written parquet FOOTERS (pyarrow) and measures how many files a 2-D box
predicate could touch — z-ordered layout must prune most files where a
random layout prunes none. Plus content preservation."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.zorder import write_zordered
from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

N_FILES = 16


def _file_ranges(path: str, cols: list[str]):
    """[(file, {col: (min, max)})] from parquet footer statistics."""
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo: dict = {}
        hi: dict = {}
        for g in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(g).column(idx[c]).statistics
                lo[c] = st.min if c not in lo else min(lo[c], st.min)
                hi[c] = st.max if c not in hi else max(hi[c], st.max)
        out.append((f, {c: (lo[c], hi[c]) for c in cols}))
    return out


def _touched(ranges, box) -> int:
    n = 0
    for _, r in ranges:
        if all(r[c][0] <= b_hi and r[c][1] >= b_lo for c, (b_lo, b_hi) in box.items()):
            n += 1
    return n


def test_zorder_prunes_box_queries(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    plain_path, z_path = str(tmp_path / "plain"), str(tmp_path / "zord")
    ev.repartition(N_FILES).write.mode("overwrite").parquet(plain_path)
    write_zordered(ev, z_path, ["user_id", "value"], n_files=N_FILES)

    # content preserved (order-invariant checksum of ids)
    a = spark.read.parquet(plain_path).agg(F.sum("event_id"), F.count("*")).first()
    b = spark.read.parquet(z_path).agg(F.sum("event_id"), F.count("*")).first()
    assert tuple(a) == tuple(b)

    # a ~12.5%-per-dimension box in the middle of both domains
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_lo = stats[0] + (stats[1] - stats[0]) * 4 // 8
    u_hi = stats[0] + (stats[1] - stats[0]) * 5 // 8
    v_lo = stats[2] + (stats[3] - stats[2]) * 0.5
    v_hi = stats[2] + (stats[3] - stats[2]) * 0.625
    box = {"user_id": (u_lo, u_hi), "value": (v_lo, v_hi)}

    cols = ["user_id", "value"]
    plain_touch = _touched(_file_ranges(plain_path, cols), box)
    z_touch = _touched(_file_ranges(z_path, cols), box)

    # random layout: most files span the full domain -> barely prunable
    assert plain_touch >= N_FILES // 2
    # z-order: the box intersects only a few curve segments (observed 1/16
    # vs 13/16 at sf0.001)
    assert z_touch * 4 <= plain_touch, (z_touch, plain_touch)
    assert z_touch <= N_FILES // 4, (z_touch, plain_touch)


def test_zorder_key_rejects_overflow(spark, sf_dir):
    import pytest

    ev = load(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        from custom_python_etl_data_connector_keerthana2k4_tech_spark.operators.zorder import zorder_key

        zorder_key(ev, ["user_id", "value"], n_bits=32)
