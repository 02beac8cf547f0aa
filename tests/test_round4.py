"""Round-4 operator semantics: association-rule identities, boilerplate
screening on planted templates, transition-audit rule coverage, and EAV
profile open-schema behavior (oracle hash-matches are in tests/test_oracle.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.registry import queries
from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round4 import ALLOWED_TRANSITIONS

_QS = queries()


def test_association_rule_identities(spark, sf_dir):
    rows = _QS["q151_association_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert 2 <= r["n_ab"] <= min(r["n_a"], r["n_b"])
        # confidence = support / P(a); lift symmetric identity
        assert r["confidence"] == pytest.approx(r["n_ab"] / r["n_a"])
        assert r["lift"] == pytest.approx(
            r["confidence"] / (r["n_b"] / (r["n_ab"] / r["support"]))
        )
        assert 0.0 < r["support"] <= r["confidence"] <= 1.0


def test_association_rules_use_set_semantics(spark):
    # A part repeated within one order must count once (basket sets).
    li = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)],
        "l_orderkey long, l_partkey long",
    )
    import custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round4 as r4

    items = li.select("l_orderkey", "l_partkey").distinct()
    pairs = r4.copurchase_pairs(items).collect()
    assert {(r["part_a"], r["part_b"], r["n_orders"]) for r in pairs} == {
        (10, 20, 2)
    }


def test_boilerplate_share_flags_planted_template(spark, tmp_path):
    # 5 docs share an identical template; 1 doc is unique vocabulary.
    tmpl = "terms of service apply to all users of this site"
    docs = [(i, tmpl, "en", "web", len(tmpl)) for i in range(5)]
    docs.append((99, "zq xv qj wk vb nm", "en", "web", 17))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in _QS["q152_boilerplate_share"](spark, str(tmp_path)).collect()
    }
    for i in range(5):
        assert out[i]["shared_share"] == 1.0  # template: every bigram shared
    assert out[99]["shared_share"] == 0.0  # unique doc: nothing shared
    assert out[99]["n_bigrams"] == 5


def test_transition_audit_totals_and_rules(spark, sf_dir):
    rows = _QS["q153_transition_audit"](spark, sf_dir).collect()
    allowed = set(ALLOWED_TRANSITIONS)
    for r in rows:
        assert r["legal"] == ((r["prev_type"], r["event_type"]) in allowed)
        assert r["n"] >= r["n_users"] >= 1
    # Transition count = events - first-event-per-user.
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in rows) == n_events - n_users


def test_eav_profile_open_schema(spark, tmp_path):
    # Mixed keys, missing keys, empty and null props all handled.
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, '{"a": 1, "b": 10}'),
        (2, "2024-01-01 00:00:01", 1, "view", 1.0, '{"a": 3}'),
        (3, "2024-01-01 00:00:02", 2, "view", 1.0, "{}"),
        (4, "2024-01-01 00:00:03", 2, "view", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["k"]: r for r in _QS["q154_props_eav_profile"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {"a", "b"}
    assert (out["a"]["n"], out["a"]["n_vals"]) == (2, 2)
    assert (out["a"]["vmin"], out["a"]["vmax"]) == (1, 3)
    assert out["a"]["vavg"] == pytest.approx(2.0)
    assert (out["b"]["n"], out["b"]["vavg"]) == (1, 10.0)


def test_pareto_cutoff_bounds(spark, sf_dir):
    rows = _QS["q155_pareto_cutoff"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # Top-revenue ranking ==> 80% needs at most ~80% of parts +1, and
        # at least ceil(0.8 * n / n) >= 1.
        assert 1 <= r["parts_to_80"] <= r["n_parts"]
        assert r["share_of_catalog"] == pytest.approx(
            r["parts_to_80"] / r["n_parts"]
        )
        # Concentration: ranked-by-revenue prefix always beats uniform.
        assert r["share_of_catalog"] <= 0.8 + 1.0 / r["n_parts"] + 1e-12


def test_funnel_latency_consistency(spark, sf_dir):
    r = _QS["q156_funnel_latency"](spark, sf_dir).collect()[0]
    assert r["n_converted"] > 0
    assert r["min_s"] <= r["p50_s"] <= r["p90_s"] <= r["max_s"]
    assert r["min_s"] > 0  # strict first_purchase > first_view filter


def test_naive_bayes_probabilities_normalize(spark, sf_dir):
    import collections

    rows = _QS["q157_naive_bayes_tokens"](spark, sf_dir).collect()
    assert rows
    vocab = rows[0]["vocab"]
    by_class = collections.defaultdict(float)
    seen = collections.defaultdict(set)
    for r in rows:
        assert r["p_smooth"] == pytest.approx(
            (r["n"] + 1) / (r["class_total"] + vocab)
        )
        by_class[r["lang"]] += r["p_smooth"]
        seen[r["lang"]].add(r["tok"])
    for lang, mass in by_class.items():
        # Seen-token mass + unseen-token mass (1/(T+V) each) must sum to 1.
        r0 = [r for r in rows if r["lang"] == lang][0]
        unseen = (vocab - len(seen[lang])) / (r0["class_total"] + vocab)
        assert mass + unseen == pytest.approx(1.0)


def test_calendar_gaps_are_real_holes(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    gaps = _QS["q158_calendar_gaps"](spark, sf_dir).collect()
    days = {
        r["day"]
        for r in load(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    import datetime

    for g in gaps:
        start, end = g["gap_start"].date(), g["gap_end"].date()
        assert start <= end
        assert (end - start).days + 1 == g["n_missing"]
        d = start
        while d <= end:
            assert d not in days  # every reported day truly has no orders
            d += datetime.timedelta(days=1)
        # boundary days do have orders
        assert start - datetime.timedelta(days=1) in days
        assert end + datetime.timedelta(days=1) in days


def test_rrf_is_rank_symmetric_and_bounded(spark, sf_dir):
    rows = _QS["q159_reciprocal_rank_fusion"](spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["rev_rank"] for r in rows) == list(range(1, n + 1))
    assert sorted(r["freq_rank"] for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert r["rrf"] == pytest.approx(
            1 / (60 + r["rev_rank"]) + 1 / (60 + r["freq_rank"])
        )
    # best possible and worst possible scores bound everything
    for r in rows:
        assert 2 / (60 + n) <= r["rrf"] <= 2 / 61


def test_session_stats_conserve_events(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q160_session_stats"](spark, sf_dir).collect()
    total = load(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total  # every event in a session
    for r in rows:
        assert 0.0 <= r["bounce_rate"] <= 1.0
        assert r["avg_duration_s"] >= 0.0
        assert r["n_events"] >= r["n_sessions"]


def test_session_boundary_rule(spark, tmp_path):
    # Two bursts 31 minutes apart = 2 sessions; 29 minutes = 1 session.
    rows = [
        (1, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "click", 1.0, "{}"),
        (3, "2024-01-01 00:41:00", 7, "view", 1.0, "{}"),  # 31 min gap
        (4, "2024-01-01 01:09:00", 7, "click", 1.0, "{}"),  # 28 min: same
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = _QS["q160_session_stats"](spark, str(tmp_path)).collect()
    assert sum(r["n_sessions"] for r in out) == 2
    assert all(r["entry_type"] == "view" for r in out)


def test_lexical_diversity_extremes(spark, tmp_path):
    docs = [
        (1, "a a a a a a", "en", "w", 11),          # minimal diversity
        (2, "one two three four", "en", "w", 18),   # maximal diversity
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in _QS["q161_lexical_diversity"](spark, str(tmp_path)).collect()}
    assert out[1]["n_types"] == 1 and out[1]["ttr"] == pytest.approx(1 / 6)
    assert out[2]["ttr"] == 1.0


def test_share_shift_shares_sum_to_one(spark, sf_dir):
    import collections

    rows = _QS["q162_share_shift"](spark, sf_dir).collect()
    by_year = collections.defaultdict(float)
    ranks = collections.defaultdict(list)
    for r in rows:
        by_year[r["yr"]] += r["share"]
        ranks[r["yr"]].append(r["rnk"])
    for yr, s in by_year.items():
        assert s == pytest.approx(1.0)
        assert sorted(ranks[yr]) == list(range(1, len(ranks[yr]) + 1))
    # deltas tie out against the prior year's own share
    prev = {(r["l_suppkey"], r["yr"]): r["share"] for r in rows}
    for r in rows:
        if r["prev_yr"] is not None:
            assert r["prev_share"] == pytest.approx(
                prev[(r["l_suppkey"], r["prev_yr"])]
            )
            assert r["share_delta"] == pytest.approx(
                r["share"] - r["prev_share"]
            )


def test_forecast_backtest_alignment(spark, sf_dir):
    rows = {r["yr"]: r for r in _QS["q163_forecast_backtest"](spark, sf_dir).collect()}
    assert rows
    # First forecastable year has < 52 scored weeks (lag consumes a year).
    first = min(rows)
    assert rows[first]["n_weeks"] <= 52
    for r in rows.values():
        assert r["mae_total"] >= 0.0 and r["wape"] >= 0.0


def test_k_anonymity_covers_every_class(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q164_k_anonymity"](spark, sf_dir).collect()
    total = load(spark, sf_dir, "customer").count()
    assert sum(r["k"] for r in rows) == total
    for r in rows:
        assert r["violates_k5"] == (r["k"] < 5)


def test_weighted_median_against_numpy(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    got = {
        r["l_returnflag"]: r["weighted_median"]
        for r in _QS["q165_weighted_median"](spark, sf_dir).collect()
    }
    pdf = (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for flag, g in pdf.groupby("l_returnflag"):
        g = g.sort_values("l_extendedprice")
        cw = g["l_quantity"].cumsum()
        want = g.loc[cw * 2 >= g["l_quantity"].sum(), "l_extendedprice"].iloc[0]
        assert got[flag] == want


def test_skew_profile_identities(spark, sf_dir):
    r = _QS["q166_skew_profile"](spark, sf_dir).collect()[0]
    assert r["n_rows"] == 60000 or r["n_rows"] > 0
    assert r["max_freq"] >= r["p99_freq"] >= 1.0
    assert r["mean_freq"] == pytest.approx(r["n_rows"] / r["n_keys"])
    assert r["top1_share"] == pytest.approx(r["max_freq"] / r["n_rows"])


def test_reconciliation_covers_all_orders(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = {r["band"]: r["n"] for r in _QS["q167_reconciliation_audit"](spark, sf_dir).collect()}
    assert sum(rows.values()) == load(spark, sf_dir, "orders").count()
    assert set(rows) <= {"within_1pct", "within_5pct", "mismatch", "missing_lines"}


def test_decile_lift_identities(spark, sf_dir):
    rows = sorted(
        _QS["q168_decile_lift"](spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    all_conv = sum(r["n_conv"] for r in rows)
    all_n = sum(r["n"] for r in rows)
    base = all_conv / all_n
    assert 0 < base < 1  # non-degenerate outcome
    cum = 0
    for r in rows:
        cum += r["n_conv"]
        assert r["lift"] == pytest.approx(r["conv_rate"] / base)
        assert r["cum_capture"] == pytest.approx(cum / all_conv)
    assert rows[-1]["cum_capture"] == pytest.approx(1.0)


def test_purchase_cadence_positive_gaps(spark, sf_dir):
    rows = _QS["q169_purchase_cadence"](spark, sf_dir).collect()
    assert len(rows) == 5  # five market segments
    for r in rows:
        assert r["n_gaps"] > 0
        assert 0 <= r["median_gap_days"] <= r["mean_gap_days"] * 3
        assert r["mean_gap_days"] > 0


def test_grouping_sets_levels_tie_out(spark, sf_dir):
    rows = _QS["q170_grouping_sets_report"](spark, sf_dir).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    total = by_level["total"][0]
    assert total["region_name"] == total["nation_name"] == "(all)"
    region_sum = sum(r["revenue"] for r in by_level["region"])
    nation_sum = sum(r["revenue"] for r in by_level["nation"])
    assert region_sum == pytest.approx(total["revenue"])
    assert nation_sum == pytest.approx(total["revenue"])
    assert sum(r["n_orders"] for r in by_level["region"]) == total["n_orders"]
    # every nation row rolls into its region row
    for rg in by_level["region"]:
        ns = [
            r for r in by_level["nation"] if r["region_name"] == rg["region_name"]
        ]
        assert sum(r["revenue"] for r in ns) == pytest.approx(rg["revenue"])


def test_bm25_semantics(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round4 import BM25_QUERY_TERMS

    rows = _QS["q171_bm25_scoring"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_terms_hit"] <= len(BM25_QUERY_TERMS)
        assert r["bm25"] > 0.0
    # more matched query terms can only help a doc of comparable length:
    # the top-scored doc must hit every term at this fixture scale
    top = max(rows, key=lambda r: r["bm25"])
    assert top["n_terms_hit"] == len(BM25_QUERY_TERMS)


def test_quantization_invariants(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    out = {r["vec_id"]: r for r in _QS["q172_embedding_quantize"](spark, sf_dir).collect()}
    src = load(spark, sf_dir, "embeddings").limit(50).collect()
    for row in src:
        v = np.asarray(row["embedding"], dtype=np.float64)
        r = out[row["vec_id"]]
        scale = 127.0 / np.abs(v).max()
        q = np.floor(v * scale + 0.5).astype(np.int64)
        assert r["scale"] == pytest.approx(scale)
        assert r["qnorm_sq"] == int((q * q).sum())
        assert r["q_absmax"] == 127  # max element hits full range
        # reconstruction error bounded by half a quantization step
        assert np.abs(q / scale - v).max() <= 0.5 / scale + 1e-12


def test_kcore_matches_python_peel(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.extensions import copurchase_pairs
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load
    import collections

    got = {r["node"] for r in _QS["q173_kcore"](spark, sf_dir).collect()}

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = [
        (r["part_a"], r["part_b"])
        for r in copurchase_pairs(li).filter(F.col("n_orders") >= 2).collect()
    ]
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < 3:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    assert got == set(adj)


def test_kcore_on_known_graph(spark):
    # K4 plus a pendant chain: 3-core is exactly the K4.
    e = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(e, "src long, dst long")
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round4 import kcore_nodes

    assert {r["node"] for r in kcore_nodes(edges, 3).collect()} == {1, 2, 3, 4}
    # 2-core keeps the K4 only as well (chain nodes have degree 1)
    assert {r["node"] for r in kcore_nodes(edges, 2).collect()} == {1, 2, 3, 4}


def test_wilson_ci_brackets_p_hat(spark, sf_dir):
    rows = _QS["q174_wilson_ci"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0
        # interval narrows as 1/sqrt(n): sanity width bound
        import math

        assert (r["wilson_hi"] - r["wilson_lo"]) <= 4 * 1.96 * math.sqrt(
            0.25 / r["n"]
        )


def test_cusum_recursion_and_reset(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round4 import CUSUM_ALARM, CUSUM_SLACK

    rows = sorted(
        _QS["q175_cusum_drift"](spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows
    for r in rows:
        assert r["cpos"] >= 0.0
        assert r["alarm"] == (r["cpos"] > CUSUM_ALARM)
    # cpos is max(0, prev + inc): differences never exceed the raw increment
    for prev, cur in zip(rows, rows[1:]):
        inc = cur["cpos"] - prev["cpos"]
        raw = cur["mu"] - CUSUM_SLACK  # mu0 unknown here; bound loosely
        assert cur["cpos"] == 0.0 or inc <= raw


def test_quantile_drift_orderings(spark, sf_dir):
    r = _QS["q176_quantile_drift"](spark, sf_dir).collect()[0]
    assert r["p10_a"] < r["p50_a"] < r["p90_a"]
    assert r["p10_b"] < r["p50_b"] < r["p90_b"]
    assert r["median_shift"] == pytest.approx(r["p50_b"] - r["p50_a"])


def test_revenue_decomposition_closes(spark, sf_dir):
    rows = _QS["q177_revenue_decomposition"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rev_change"] == pytest.approx(
            r["volume_effect"] + r["price_effect"], abs=1e-4
        )


def test_dedup_impact_with_planted_duplicates(spark, tmp_path):
    docs = [
        (1, "Alpha beta gamma.", "web", "en", 17),
        (2, "alpha  BETA gamma", "web", "en", 17),  # canonical twin of 1
        (3, "delta epsilon", "web", "en", 13),
        (4, "unique text here", "api", "en", 16),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in _QS["q178_dedup_impact"](spark, str(tmp_path)).collect()}
    web = out["web"]
    assert (web["n_docs"], web["n_unique"]) == (3, 2)
    assert web["tokens_before"] == 3 + 3 + 2
    assert web["tokens_after"] == 3 + 2
    assert web["keep_ratio"] == pytest.approx(5 / 8)
    assert out["api"]["keep_ratio"] == 1.0


def test_kl_drift_properties(spark, sf_dir):
    r = _QS["q179_kl_drift"](spark, sf_dir).collect()[0]
    assert r["n_categories"] == 5
    assert r["kl_ab"] >= 0.0 and r["kl_ba"] >= 0.0  # Gibbs' inequality
    assert 0.0 <= r["tvd"] <= 1.0
    # Pinsker's inequality: KL >= 2 * TVD^2
    assert r["kl_ab"] >= 2 * r["tvd"] ** 2 - 1e-12
    assert r["kl_ba"] >= 2 * r["tvd"] ** 2 - 1e-12


def test_lang_confusion_shares(spark, sf_dir):
    import collections

    rows = _QS["q180_lang_confusion"](spark, sf_dir).collect()
    per_actual = collections.defaultdict(float)
    for r in rows:
        assert r["n"] >= 1
        per_actual[r["lang"]] += r["share_of_actual"]
    for lang, s in per_actual.items():
        assert s == pytest.approx(1.0)


def test_rolling_correlation_bounds_and_window(spark, sf_dir):
    rows = _QS["q181_rolling_correlation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["r"] <= 1.0 + 1e-9
    # spot-check one window against numpy
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(30,10)")) * 100)
            .cast("long")
            .alias("rev_c"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("day")
        .collect()
    )
    want_day = rows[len(rows) // 2]["day"].date()
    idx = next(i for i, d in enumerate(daily) if d["day"] == want_day)
    xs = np.array([d["rev_c"] for d in daily[idx - 29 : idx + 1]], dtype=float)
    ys = np.array([d["cnt"] for d in daily[idx - 29 : idx + 1]], dtype=float)
    want_r = np.corrcoef(xs, ys)[0, 1]
    got_r = next(r["r"] for r in rows if r["day"].date() == want_day)
    assert got_r == pytest.approx(want_r, abs=1e-9)


def test_negative_samples_are_true_negatives(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q182_negative_sampling"](spark, sf_dir).collect()
    assert rows
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pos = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    }
    maxp = max(p for _, p in pos)
    for r in rows:
        assert (r["c_custkey"], r["neg_partkey"]) not in pos
        assert 1 <= r["neg_partkey"] <= maxp
        # deterministic hash replay
        assert r["neg_partkey"] == 1 + (
            r["c_custkey"] * 2654435761 + r["attempt"] * 40503
        ) % maxp


def test_weekday_index_averages_to_one(spark, sf_dir):
    rows = _QS["q183_weekday_index"](spark, sf_dir).collect()
    assert len(rows) == 7
    # day-count-weighted mean of the index is exactly 1
    total_days = sum(r["n_days"] for r in rows)
    weighted = sum(r["seasonality_index"] * r["n_days"] for r in rows)
    assert weighted / total_days == pytest.approx(1.0)


def test_split_audit_is_deterministic_and_complete(spark, sf_dir):
    a = _QS["q184_split_audit"](spark, sf_dir).collect()
    b = _QS["q184_split_audit"](spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # same split, always
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    total = load(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in a) == total
    for r in a:
        assert 0.0 < r["frac"] < 1.0


def test_band_transitions_conserve_customers(spark, sf_dir):
    rows = _QS["q185_band_transitions"](spark, sf_dir).collect()
    assert not any(
        r["band_1996"] == "none" and r["band_2000"] == "none" for r in rows
    )
    # row/col marginals = active customers in each year
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    n96 = o.filter(F.col("yr") == 1996).select("o_custkey").distinct().count()
    n00 = o.filter(F.col("yr") == 2000).select("o_custkey").distinct().count()
    assert sum(r["n"] for r in rows if r["band_1996"] != "none") == n96
    assert sum(r["n"] for r in rows if r["band_2000"] != "none") == n00


def test_var_cvar_ordering(spark, sf_dir):
    r = _QS["q186_revenue_var"](spark, sf_dir).collect()[0]
    assert r["cvar5"] <= r["var5"]  # tail mean below the quantile
    assert 0 < r["n_tail"] <= r["n_days"] * 0.06 + 1


def test_auc_matches_sklearn_free_reference(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q187_roc_auc"](spark, sf_dir).collect()[0]
    # reference: probability a random positive outranks a random negative
    oc = {
        x["o_custkey"]: x["cnt"]
        for x in load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    rows = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").collect()
    scores = np.array([x["c_acctbal"] for x in rows])
    ys = np.array([1 if oc.get(x["c_custkey"], 0) >= 15 else 0 for x in rows])
    pos, neg = scores[ys == 1], scores[ys == 0]
    wins = sum((pos[:, None] > neg[None, :]).sum() for _ in [0])
    ties = (pos[:, None] == neg[None, :]).sum()
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert (r["np"], r["nn"]) == (len(pos), len(neg))
    assert r["auc"] == pytest.approx(want, abs=1e-12)


def test_centroid_distances_match_numpy(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q188_centroid_distances"](spark, sf_dir).collect()
    src = load(spark, sf_dir, "embeddings").collect()
    by_label = {}
    for r in src:
        q = np.floor(np.asarray(r["embedding"], dtype=np.float64) * 1e6)
        by_label.setdefault(r["label"], []).append(q)
    cents = {k: np.mean(v, axis=0) / 1e6 for k, v in by_label.items()}
    assert rows
    for r in rows:
        want = float(
            np.linalg.norm(cents[r["label_a"]] - cents[r["label_b"]])
        )
        assert r["centroid_dist"] == pytest.approx(want, rel=1e-9)
        assert r["label_a"] < r["label_b"]
    # complete upper triangle
    k = len(cents)
    assert len(rows) == k * (k - 1) // 2


def test_calendar_wow_null_after_gap(spark, sf_dir):
    rows = {r["week"]: r for r in _QS["q189_calendar_wow"](spark, sf_dir).collect()}
    weeks = sorted(rows)
    import datetime

    n_null = 0
    for w in weeks:
        prev = w - datetime.timedelta(days=7)
        if prev in rows:
            assert rows[w]["prev_rev"] == pytest.approx(rows[prev]["rev"])
            assert rows[w]["wow"] == pytest.approx(
                rows[w]["rev"] / rows[prev]["rev"] - 1
            )
        else:
            assert rows[w]["prev_rev"] is None and rows[w]["wow"] is None
            n_null += 1
    assert n_null >= 1  # at least the first week has no predecessor


def test_norm_outliers_summary(spark, sf_dir):
    r = _QS["q190_norm_outliers"](spark, sf_dir).collect()[0]
    assert r["n_vecs"] == 500
    assert r["median_normsq"] > 0 and r["mad_normsq"] > 0
    assert 0 <= r["n_outliers"] < r["n_vecs"] * 0.05  # robust screen is tight


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        _QS["q191_vocab_coverage"](spark, sf_dir).collect(),
        key=lambda r: r["checkpoint"],
    )
    assert [r["checkpoint"] for r in rows] == [10, 25, 50, 100, 250]
    last = 0.0
    for r in rows:
        assert r["coverage"] >= last  # monotone non-decreasing
        last = r["coverage"]
        assert r["vocab_used"] <= r["checkpoint"]
        assert 0.0 < r["coverage"] <= 1.0
    assert rows[-1]["coverage"] == pytest.approx(1.0)  # ladder passes vocab


def test_tail_contribution_bounds(spark, sf_dir):
    rows = _QS["q192_tail_contribution"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_top"] == r["n_orders"] // 100
        # top 1% of orders must out-earn a uniform 1%
        assert r["top1pct_share"] > 0.01
        assert r["top1pct_share"] < 0.5


def test_stickiness_bounds(spark, sf_dir):
    rows = _QS["q193_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_days"] <= 7
        # avg DAU can't exceed WAU; stickiness in (0, 1]
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["dau_total"] <= r["wau"] * r["n_days"]


def test_temporal_audit_counts(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q194_temporal_audit"](spark, sf_dir).collect()[0]
    assert r["n_lines"] == load(spark, sf_dir, "lineitem").count()
    assert 0 <= r["ship_before_order"] <= r["n_lines"]
    assert r["violation_rate"] == pytest.approx(
        r["ship_before_order"] / r["n_lines"]
    )


def test_basket_signatures_are_canonical(spark):
    # same set, different arrival order and multiplicity -> same signature
    li = spark.createDataFrame(
        [(1, 30), (1, 10), (1, 10), (2, 10), (2, 30), (3, 10)],
        "l_orderkey long, l_partkey long",
    )
    li.createOrReplaceTempView("_unused")
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        li.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        rows = _QS["q195_basket_signatures"](spark, d).collect()
    assert len(rows) == 1
    assert rows[0]["signature"] == "10,30"
    assert rows[0]["basket_size"] == 2 and rows[0]["n_orders"] == 2


def test_trigram_search_equals_like_scan(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.plans.round4 import TRIGRAM_NEEDLE
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    got = {r["doc_id"] for r in _QS["q196_trigram_search"](spark, sf_dir).collect()}
    want = {
        r["doc_id"]
        for r in load(spark, sf_dir, "documents")
        .filter(F.col("text").contains(TRIGRAM_NEEDLE))
        .collect()
    }
    assert got == want and got  # non-empty on the fixture


def test_topk_aggregate_matches_window_form(spark, sf_dir):
    rows = _QS["q197_topk_aggregate"](spark, sf_dir).collect()
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r["p_brand"], []).append(r)
    for brand, rs in by_brand.items():
        rs = sorted(rs, key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        revs = [r["rev"] for r in rs]
        assert revs == sorted(revs, reverse=True)


def test_temporal_cooccurrence_window_rule(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 7, "error", 1.0, "{}"),
        (2, "2024-01-01 00:03:00", 7, "purchase", 1.0, "{}"),  # within 5m
        (3, "2024-01-01 00:09:00", 7, "view", 1.0, "{}"),      # 6m after #2
        (4, "2024-01-01 00:00:30", 8, "error", 1.0, "{}"),     # other user
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in _QS["q198_temporal_cooccurrence"](spark, str(tmp_path)).collect()
    }
    assert out == {("error", "purchase"): 1}  # only the 3-minute pair


def test_item_similarity_jaccard_identities(spark, sf_dir):
    rows = _QS["q199_item_similarity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["a"] < r["b"]
        assert 2 <= r["inter"] <= min(r["deg_a"], r["deg_b"])
        union = r["deg_a"] + r["deg_b"] - r["inter"]
        assert r["jaccard"] == pytest.approx(r["inter"] / union)
        assert 0.0 < r["jaccard"] <= 1.0


def test_decayed_popularity_semantics(spark, sf_dir):
    rows = {r["l_partkey"]: r for r in _QS["q200_decayed_popularity"](spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        # score bounded by n_sales * full weight (2^20)
        assert 0 <= r["decayed_score"] <= r["n_sales"] * 1048576
    # determinism across partitionings: rerun must be identical
    again = {r["l_partkey"]: r["decayed_score"] for r in _QS["q200_decayed_popularity"](spark, sf_dir).collect()}
    assert again == {k: v["decayed_score"] for k, v in rows.items()}


def test_tpch_q3_shape_is_top10_unshipped(spark, sf_dir):
    rows = _QS["q201_tpch_q3_shape"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    import datetime

    cutoff = datetime.datetime(1998, 3, 15)
    for r in rows:
        assert r["o_orderdate"] < cutoff


def test_tpch_q10_shape_top20(spark, sf_dir):
    rows = _QS["q202_tpch_q10_shape"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r["n_items"] >= 1 for r in rows)


def test_rare_token_exposure_bounds(spark, sf_dir):
    rows = _QS["q203_rare_token_exposure"](spark, sf_dir).collect()
    assert rows
    assert any(r["n_rare"] > 0 for r in rows)  # screen is non-degenerate
    for r in rows:
        assert 0 <= r["n_rare"] <= r["n_tokens"]
        assert r["rare_share"] == pytest.approx(r["n_rare"] / r["n_tokens"])


def test_median_ci_brackets_median(spark, sf_dir):
    r = _QS["q204_median_ci"](spark, sf_dir).collect()[0]
    assert r["ci_lo"] <= r["median"] <= r["ci_hi"]
    # interval shrinks as sqrt(n): sanity that it's not the whole range
    assert (r["ci_hi"] - r["ci_lo"]) < r["median"] * 0.5


def test_sprt_cumsum_is_exact(spark, sf_dir):
    rows = sorted(_QS["q205_sprt"](spark, sf_dir).collect(), key=lambda r: r["day"])
    assert rows
    run = 0
    for r in rows:
        run += r["llr_q"]
        assert r["cum_llr_q"] == run  # integer accumulation, bit-exact
        assert r["accept_h1"] == (run >= 2944439)
        assert r["accept_h0"] == (run <= -2944439)
        assert 0 <= r["x"] <= r["n"]


def test_change_point_matches_numpy_argmax(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q206_change_point"](spark, sf_dir).collect()[0]
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("day")
        .collect()
    )
    cnt = np.array([x["cnt"] for x in daily], dtype=float)
    n = len(cnt)
    pre = np.cumsum(cnt)
    i = np.arange(1, n)
    s = np.abs(pre[:-1] / i - (pre[-1] - pre[:-1]) / (n - i)) * np.sqrt(
        i * (n - i) / n
    )
    best = int(np.argmax(s))
    assert r["split_index"] == best + 1
    assert r["s"] == pytest.approx(float(s[best]), rel=1e-12)


def test_dispersion_index_matches_numpy(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = {r["event_type"]: r for r in _QS["q207_dispersion_index"](spark, sf_dir).collect()}
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type = {}
    for d in daily:
        by_type.setdefault(d["event_type"], []).append(d["c"])
    for t, cs in by_type.items():
        c = np.array(cs, dtype=float)
        assert rows[t]["mean_daily"] == pytest.approx(c.mean())
        assert rows[t]["var_daily"] == pytest.approx(c.var(ddof=1))
        assert rows[t]["dispersion"] == pytest.approx(c.var(ddof=1) / c.mean())


def test_entity_sample_is_all_or_nothing(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q208_entity_sample"](spark, sf_dir).collect()[0]
    ev = load(spark, sf_dir, "events")
    sampled_users = {
        x["user_id"]
        for x in ev.filter((F.col("user_id") * 2654435761) % 100 < 5)
        .select("user_id")
        .distinct()
        .collect()
    }
    assert r["n_users"] == len(sampled_users)
    # every sampled user's FULL event history is in the sample
    full = ev.groupBy("user_id").count().collect()
    want_events = sum(x["count"] for x in full if x["user_id"] in sampled_users)
    assert r["n_events"] == want_events


def test_qte_sane(spark, sf_dir):
    r = _QS["q209_quantile_treatment_effect"](spark, sf_dir).collect()[0]
    assert r["n_control"] > 0 and r["n_treat"] > 0
    # deterministic hash arms: near-even split on purchase events
    total = r["n_control"] + r["n_treat"]
    assert abs(r["n_control"] - r["n_treat"]) < total * 0.2
    for q in ("qte_p25", "qte_p50", "qte_p75"):
        assert r[q] is not None


def test_cross_source_mirrors_with_planted_copies(spark, tmp_path):
    docs = [
        (1, "shared mirror text", "src_a", "en", 18),
        (2, "Shared MIRROR text!", "src_b", "en", 19),  # canonical twin
        (3, "shared mirror text", "src_c", "en", 18),   # third source
        (4, "unique to a", "src_a", "en", 11),
        (5, "unique to b", "src_b", "en", 11),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string, lang string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["n_sources"]: r for r in _QS["q210_cross_source_mirrors"](spark, str(tmp_path)).collect()}
    assert out[3]["n_canon_texts"] == 1 and out[3]["n_docs"] == 3
    assert out[1]["n_canon_texts"] == 2 and out[1]["n_docs"] == 2


def test_fd_histogram_covers_everything(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q211_fd_histogram"](spark, sf_dir).collect()
    total = load(spark, sf_dir, "orders").count()
    assert sum(r["n"] for r in rows) == total
    widths = {r["width"] for r in rows}
    assert len(widths) == 1 and min(widths) > 0
    # FD rule: bucket count should be sane, not 1 and not n
    assert 10 < len(rows) < total / 10


def test_new_vs_returning_consistency(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = sorted(_QS["q212_new_vs_returning"](spark, sf_dir).collect(), key=lambda r: r["day"])
    ev = load(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    # total new-user events == each user's events on their first day;
    # every user contributes at least one such event
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["new_user_events"] for r in rows) >= n_users
    assert rows[0]["new_share"] == 1.0  # cold start: everyone is new


def test_zipf_fit_on_planted_powerlaw(spark, tmp_path):
    # Construct a corpus whose rank-frequency is exactly n_r = 2^(10-r):
    # slope of ln f vs ln r is not -1 exactly, but strictly decreasing fit.
    words = ["wa", "wb", "wc", "wd", "we", "wf", "wg", "wh"]
    text = " ".join(
        " ".join([w] * (2 ** (9 - i))) for i, w in enumerate(words, 1)
    )
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = _QS["q213_zipf_fit"](spark, str(tmp_path)).collect()[0]
    assert r["k"] == 8
    assert r["zipf_slope"] < -1.0  # geometric decay is steeper than zipf


def test_effective_vocab_uniform_equals_vocab(spark, tmp_path):
    # perfectly uniform corpus: effective vocab == vocab size
    text = " ".join(["alpha beta gamma delta"] * 10)
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    r = _QS["q214_effective_vocab"](spark, str(tmp_path)).collect()[0]
    assert r["vocab_size"] == 4
    assert r["effective_vocab"] == pytest.approx(4.0)


def test_hhi_bounds_and_inverse(spark, sf_dir):
    rows = _QS["q215_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_suppliers"] - 1e-12 <= r["hhi"] <= 1.0
        # effective competitors <= actual competitors
        assert 1.0 / r["hhi"] <= r["n_suppliers"] + 1e-9


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    rows = sorted(_QS["q216_kaplan_meier"](spark, sf_dir).collect(), key=lambda r: r["t"])
    assert rows
    last = 1.0
    for r in rows:
        assert 0.0 < r["survival"] <= last + 1e-12  # non-increasing
        last = r["survival"]
        assert 0 < r["d"] < r["n_risk"]
    # n_risk is non-increasing over time
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)


def test_kaplan_meier_censoring_matters(spark, sf_dir):
    # KM survival at a given t must be >= the naive converted-only CDF
    # complement computed from the same data (censoring removes subjects
    # from the denominator instead of counting them as converted).
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = sorted(_QS["q216_kaplan_meier"](spark, sf_dir).collect(), key=lambda r: r["t"])
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    cum_d = 0
    for r in rows:
        cum_d += r["d"]
        naive_surv = 1 - cum_d / n_users
        assert r["survival"] >= naive_surv - 1e-9


def test_state_dwell_conservation(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    rows = _QS["q217_state_dwell"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every non-terminal event contributes exactly one dwell
    assert sum(r["n"] for r in rows) == n_events - n_users
    for r in rows:
        assert r["median_s"] <= r["mean_s"] * 3
        assert r["total_s"] >= r["n"]  # at least ~1s dwells on average


def test_cohort_ltv_monotone_per_cohort(spark, sf_dir):
    import collections

    rows = _QS["q218_cohort_ltv"](spark, sf_dir).collect()
    by_cohort = collections.defaultdict(list)
    for r in rows:
        by_cohort[r["cohort"]].append(r)
    for cohort, rs in by_cohort.items():
        rs = sorted(rs, key=lambda r: r["offset_q"])
        assert rs[0]["offset_q"] == 0  # acquisition quarter present
        ltv = [r["cum_ltv"] for r in rs]
        assert ltv == sorted(ltv)  # cumulative: non-decreasing
        assert all(r["cohort_users"] == rs[0]["cohort_users"] for r in rs)


def test_repeat_ladder_ordering(spark, sf_dir):
    r = _QS["q219_repeat_ladder"](spark, sf_dir).collect()[0]
    assert 0 < r["repeat_30d"] <= r["repeat_90d"] <= r["repeat_365d"] <= 1
    assert r["n_repeat_ever"] <= r["n_first_buyers"]
    assert r["repeat_365d"] <= r["n_repeat_ever"] / r["n_first_buyers"] + 1e-12


def test_max_drawdown_is_true_max(spark, sf_dir):
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q220_max_drawdown"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["drawdown"] < 1.0
    assert r["trough_rev"] <= r["peak_rev"]
    # brute-force check against the weekly series
    wk = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", "o_orderdate").alias("week"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .orderBy("week")
        .collect()
    )
    peak, best = 0.0, 0.0
    for row in wk:
        peak = max(peak, row["rev"])
        best = max(best, (peak - row["rev"]) / peak)
    assert r["drawdown"] == pytest.approx(best, rel=1e-9)


def test_price_change_audit_bounds(spark, sf_dir):
    rows = _QS["q221_price_change_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_months"] >= 2  # HAVING guarantees a comparison existed
        assert 0 <= r["n_changes"] <= r["n_months"] - 1
        assert r["max_rel_jump"] >= 0.0


def test_srm_clean_on_deterministic_hash(spark, sf_dir):
    r = _QS["q222_srm_check"](spark, sf_dir).collect()[0]
    assert r["n0"] > 0 and r["n1"] > 0
    assert r["srm_chi2"] == pytest.approx(
        (r["n0"] - r["n1"]) ** 2 / (r["n0"] + r["n1"])
    )
    assert r["srm_flag"] == (r["srm_chi2"] > 3.841)


def test_mde_shrinks_with_n(spark, sf_dir):
    import math

    r = _QS["q223_mde"](spark, sf_dir).collect()[0]
    assert 0.0 < r["p_base"] < 1.0
    want = (1.96 + 0.842) * math.sqrt(
        2 * r["p_base"] * (1 - r["p_base"]) / r["n"]
    )
    assert r["mde_abs"] == pytest.approx(want)
    assert r["mde_rel"] == pytest.approx(want / r["p_base"])
    # detectable effect must be a small fraction of the base rate here
    assert r["mde_rel"] < 0.5


def test_control_chart_baseline_inside_limits(spark, sf_dir):
    rows = sorted(_QS["q224_control_chart"](spark, sf_dir).collect(), key=lambda r: r["day"])
    assert rows
    # constant limits across the chart
    assert len({(r["lcl"], r["ucl"]) for r in rows}) == 1
    for r in rows:
        assert r["lcl"] < r["center"] < r["ucl"]
        if r["out_of_control"]:
            assert r["mu"] < r["lcl"] + 1e-6 or r["mu"] > r["ucl"] - 1e-6
    # baseline days (first 14) should rarely breach their own limits
    breaches = sum(1 for r in rows[:14] if r["out_of_control"])
    assert breaches <= 1


def test_weekend_effect_against_numpy(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q225_weekend_effect"](spark, sf_dir).collect()[0]
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum("o_totalprice").alias("rev"), F.min(F.dayofweek("o_orderdate") - 1).alias("dow"))
        .collect()
    )
    we = np.array([x["rev"] for x in daily if x["dow"] in (0, 6)])
    wd = np.array([x["rev"] for x in daily if x["dow"] not in (0, 6)])
    assert (r["n1"], r["n0"]) == (len(we), len(wd))
    assert r["mean_weekend"] == pytest.approx(we.mean(), rel=1e-6)
    want_t = (we.mean() - wd.mean()) / np.sqrt(
        we.var(ddof=1) / len(we) + wd.var(ddof=1) / len(wd)
    )
    assert r["welch_t"] == pytest.approx(float(want_t), rel=1e-4)


def test_context_overflow_monotone_thresholds(spark, sf_dir):
    rows = _QS["q226_context_overflow"](spark, sf_dir).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert 0.0 <= r["over_64"] <= r["over_32"] <= 1.0
        assert r["p50_tokens"] <= r["p95_tokens"]


def test_trend_decomposition_identity(spark, sf_dir):
    rows = _QS["q227_trend_decomposition"](spark, sf_dir).collect()
    assert rows
    import statistics

    for r in rows:
        assert r["rev"] == pytest.approx(r["trend"] + r["residual"], abs=1e-6)
    # smoothing: trend variance well below raw variance
    revs = [r["rev"] for r in rows]
    trends = [r["trend"] for r in rows]
    assert statistics.pvariance(trends) < statistics.pvariance(revs)


def test_ccdf_ladder_monotone(spark, sf_dir):
    rows = sorted(_QS["q228_ccdf_ladder"](spark, sf_dir).collect(), key=lambda r: r["threshold"])
    assert [r["threshold"] for r in rows] == [1, 2, 4, 8, 16, 32, 64]
    assert rows[0]["ccdf"] == 1.0  # every part has >= 1 sale
    ccdf = [r["ccdf"] for r in rows]
    assert ccdf == sorted(ccdf, reverse=True)


def test_discount_response_levels(spark, sf_dir):
    rows = _QS["q229_discount_response"](spark, sf_dir).collect()
    levels = sorted(r["discount_pct"] for r in rows)
    assert levels == list(range(0, 11))  # TPC-H: 0..10 percent
    for r in rows:
        assert r["sem_qty"] > 0
        # quantity uniform in 1..50: mean near 25.5, sem tiny
        assert 24 < r["mean_qty"] < 27


def test_percentile_bands_contain_median(spark, sf_dir):
    rows = sorted(_QS["q230_percentile_bands"](spark, sf_dir).collect(), key=lambda r: r["week"])
    assert rows
    for r in rows:
        assert r["band_lo"] <= r["band_mid"] <= r["band_hi"]
        assert 1 <= r["w_n"] <= 13
        # the band is built FROM the trailing window including this week,
        # so rev must lie within [min, max] of that window — bands at 10/90
        # may exclude it, but the mid-band of a 1-week frame equals rev
        if r["w_n"] == 1:
            assert r["band_mid"] == pytest.approx(r["rev"])
    assert rows[-1]["w_n"] == 13


def test_missing_cells_grid_complete(spark, sf_dir):
    rows = _QS["q231_missing_cells"](spark, sf_dir).collect()
    assert len(rows) == 25  # 5 regions x 5 priorities
    # fixtures cover every cell; the audit's pass state is all-observed
    assert all(r["observed"] for r in rows)


def test_health_index_is_standardized(spark, sf_dir):
    import statistics

    rows = _QS["q232_health_index"](spark, sf_dir).collect()
    zs = [r["health_z"] for r in rows]
    # mean ~0 by construction; spread bounded by component correlation
    assert abs(statistics.fmean(zs)) < 1e-9
    assert 0.3 < statistics.pstdev(zs) <= 1.0 + 1e-9


def test_jackknife_se_close_to_delta_method(spark, sf_dir):
    import numpy as np
    from custom_python_etl_data_connector_keerthana2k4_tech_spark.tables import load

    r = _QS["q233_jackknife_aov"](spark, sf_dir).collect()[0]
    assert r["jackknife_se"] > 0
    o = load(spark, sf_dir, "orders").select("o_totalprice").collect()
    vals = np.array([x["o_totalprice"] for x in o])
    assert r["aov"] == pytest.approx(vals.mean(), rel=1e-9)
    # against naive iid SE of the mean: same order of magnitude
    naive = vals.std(ddof=1) / np.sqrt(len(vals))
    assert 0.2 * naive < r["jackknife_se"] < 5 * naive
