"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``   — flagship extraction pipeline on /root/testdata/sf0.001
  (synthetic transcript corpus derived deterministically from the sf).
- ``queries()`` — one callable per implemented operator (SURVEY.md §2).
- ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible ones;
  column names and rounding match the Ray outputs exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# DuckDB twin of core/textnorm.normalize_text for the ASCII corpus
# (unicode NFC is a no-op there); verified char-exact corpus-wide.
_NORM_EXPR = (
    "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "replace(replace(text, chr(13)||chr(10), chr(10)), chr(13), chr(10)),"
    r"'[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),"
    r"'[ \t]+', ' ', 'g'), ' +\n', chr(10), 'g'),"
    r"'\n{3,}', chr(10)||chr(10), 'g'),"
    " ' ' || chr(10) || chr(9))"
)
_AMT_RE = r"[\d,]+\.\d{2}"


def _scrub_expr(col: str = "text") -> str:
    """Nested regexp_replace chain built from queries.SCRUB_RULES — the
    oracle twin of q_transcripts_scrub shares the engine's literal
    patterns (Arrow RE2 ↔ DuckDB RE2), so they cannot drift."""
    from ocr_engine_ray.pipelines.queries import SCRUB_RULES

    expr = col
    for pat, rep in SCRUB_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


def _cents_sql(extract_expr: str) -> str:
    """Money string → exact int cents, matching parse_money_cents
    half-up on 2-decimal amounts."""
    return ("CAST(round(replace(NULLIF(" + extract_expr
            + ", ''), ',', '')::DOUBLE * 100) AS BIGINT)")


# --- DuckDB twin of core/dates.find_date (M12), char-exact corpus-wide ---
# as_of is pinned to DEFAULT_AS_OF = 2026-01-01: century 20, future
# window year 2046 (core/dates._window_year).

def _wy(y: str) -> str:
    """Two-digit-year century windowing."""
    return (f"CASE WHEN {y} >= 100 THEN {y} "
            f"WHEN 2000 + {y} > 2046 THEN 1900 + {y} "
            f"ELSE 2000 + {y} END")


def _mkdate(y: str, m: str, d: str) -> str:
    """Validity-checked date build (invalid day/month → NULL, the
    Python parser's _mk ValueError path)."""
    return f"try_cast(printf('%04d-%02d-%02d', {y}, {m}, {d}) AS DATE)"


def _first_parseable(t: str, pat: str, parse_of_x: str) -> str:
    """find_date's per-family scan: every match of ``pat`` in position
    order, first successfully-parsed candidate wins (false matches parse
    to NULL and are skipped, like the Python parser's continue-on-None)."""
    return (f"list_filter(list_transform("
            f"regexp_extract_all({t}, '{pat}', 0), "
            f"x -> {parse_of_x}), d -> d IS NOT NULL)[1]")


def _date_parse_sql(t: str) -> str:
    """DATE expression replaying ``find_date(normalize(text))``: family
    order f1..f5, DMY→MDY→YMD order preference, 8-digit special forms,
    century windowing — verified char-exact at sf0.01 and sf0.1.
    (The keyword-proximity step needs no twin: on any corpus with one
    date-shaped candidate per text both strategies converge on it; the
    whole-text family scan is the equality the validation proves.)"""
    def grp(pat, key):
        return (f"try_cast(regexp_extract(x, '{pat}', "
                f"['a','b','c'])['{key}'] AS BIGINT)")

    # explicit replica of core/dates.MONTHS (try_strptime '%b' rejects
    # 'sept', and an explicit CASE pins case-insensitivity exactly)
    _MONTH_CASES = " ".join(
        f"WHEN '{name}' THEN {num}" for name, num in (
            ("jan", 1), ("feb", 2), ("mar", 3), ("apr", 4), ("may", 5),
            ("jun", 6), ("jul", 7), ("aug", 8), ("sep", 9), ("oct", 10),
            ("nov", 11), ("dec", 12), ("january", 1), ("february", 2),
            ("march", 3), ("april", 4), ("june", 6), ("july", 7),
            ("august", 8), ("september", 9), ("october", 10),
            ("november", 11), ("december", 12), ("sept", 9)))

    def month_num(tok_expr):
        return f"(CASE lower({tok_expr}) {_MONTH_CASES} ELSE NULL END)"

    pat1 = r"\b(\d{1,2})[/.\-](\d{1,2})[/.\-](\d{2,4})\b"
    a, b, c = (grp(pat1, k) for k in "abc")
    p1 = _first_parseable(
        t, pat1, f"COALESCE({_mkdate(_wy(c), b, a)}, {_mkdate(_wy(c), a, b)})")

    pat2 = r"\b(\d{4})[/.\-](\d{1,2})[/.\-](\d{1,2})\b"
    a, b, c = (grp(pat2, k) for k in "abc")
    p2 = _first_parseable(t, pat2, _mkdate(a, b, c))

    pat3 = r"\b(\d{8})\b"
    s12 = "try_cast(substr(x,1,2) AS BIGINT)"
    s34 = "try_cast(substr(x,3,2) AS BIGINT)"
    s14 = "try_cast(substr(x,1,4) AS BIGINT)"
    s56 = "try_cast(substr(x,5,2) AS BIGINT)"
    s78 = "try_cast(substr(x,7,2) AS BIGINT)"
    s58 = "try_cast(substr(x,5,4) AS BIGINT)"
    p3 = _first_parseable(
        t, pat3,
        f"COALESCE({_mkdate(s14, s56, s78)}, {_mkdate(s58, s34, s12)}, "
        f"{_mkdate(s58, s12, s34)})")

    pat4 = r"\b(\d{1,2})\s+([A-Za-z]{3,9})\.?\s+(\d{2,4})\b"
    a, c = grp(pat4, "a"), grp(pat4, "c")
    m4 = month_num(f"regexp_extract(x, '{pat4}', ['a','b','c'])['b']")
    p4 = _first_parseable(t, pat4, _mkdate(_wy(c), m4, a))

    pat5 = r"\b([A-Za-z]{3,9})\.?\s+(\d{1,2}),?\s+(\d{2,4})\b"
    b, c = grp(pat5, "b"), grp(pat5, "c")
    m5 = month_num(f"regexp_extract(x, '{pat5}', ['a','b','c'])['a']")
    p5 = _first_parseable(t, pat5, _mkdate(_wy(c), m5, b))

    # family 6: space-separated numeric triple ('12 3 2024'), DMY→MDY
    pat6 = r"\b(\d{1,2})\s+(\d{1,2})\s+(\d{2,4})\b"
    a, b, c = (grp(pat6, k) for k in "abc")
    p6 = _first_parseable(
        t, pat6, f"COALESCE({_mkdate(_wy(c), b, a)}, {_mkdate(_wy(c), a, b)})")

    return f"COALESCE({p1}, {p2}, {p3}, {p4}, {p5}, {p6})"


def _item_cents_sql(cell: str) -> str:
    """Item money cell → cents, replaying parse_money_cents including
    its fallback: strip non-numerics and parse; on failure, the first
    price-looking token (``-?\\d+(?:[.,]\\d{{1,2}})?``, ',' as decimal
    point).  try_cast throughout — a junk cell yields NULL (Python's
    None), never a query-aborting conversion error.  (Exactness note:
    half-up vs DOUBLE rounding can differ on >2-decimal amounts; the
    corpus grammar emits exactly 2 decimals, as the validation runs
    prove.)"""
    return f"""CASE WHEN {cell} = '' THEN NULL ELSE COALESCE(
        CAST(round(try_cast(regexp_replace({cell}, '[^0-9.\\-]', '', 'g')
             AS DOUBLE) * 100) AS BIGINT),
        CAST(round(try_cast(replace(regexp_extract({cell},
             '-?\\d+(?:[.,]\\d{{1,2}})?'), ',', '.')
             AS DOUBLE) * 100) AS BIGINT)) END"""


def _money_str_sql(c: str) -> str:
    """Exact-cents → canonical 2-decimal string (core/money.cents_to_str
    on the non-negative corpus); NULL renders ''."""
    return (f"CASE WHEN {c} IS NULL THEN '' ELSE "
            f"CAST({c} // 100 AS VARCHAR) || '.' || "
            f"lpad(CAST({c} % 100 AS VARCHAR), 2, '0') END")


def _items_rollup_ctes(transcripts: str, norm_expr: str) -> str:
    """CTE chain replaying Structures table parsing + _items_from_tables
    + items_rollup over normalized raw text (verified corpus-wide):
    contiguous ' | ' line runs form tables (gaps-and-islands), each
    table's first row is the header, rows need >=4 cells, a non-empty
    non-integer qty cell skips the row, money cells parse half-up to
    cents; rollup = (sum qty, sum total cents, (2*total+qty)//(2*qty)).
    Ends with CTE ``roll`` keyed (conv_id, turn_idx).  Exact-duplicate
    input rows share (conv_id, turn_idx) with identical text, so the
    line windows run over DISTINCT rows and callers join ``roll`` back
    per input row."""
    return f"""
    n AS (SELECT conv_id, turn_idx, {norm_expr} AS t FROM {transcripts}),
    nd AS (SELECT DISTINCT conv_id, turn_idx, t FROM n),
    lin AS (
      SELECT conv_id, turn_idx,
             unnest(list_zip(lst, range(1, len(lst) + 1))) AS z
      FROM (SELECT conv_id, turn_idx, string_split(t, chr(10)) AS lst
            FROM nd)),
    l2 AS (SELECT conv_id, turn_idx, z[1] AS ln,
                  CAST(z[2] AS BIGINT) AS idx
           FROM lin),
    pipe AS (SELECT conv_id, turn_idx, ln, idx,
                    idx - ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
                                             ORDER BY idx) AS grp
             FROM l2 WHERE contains(ln, ' | ')),
    trows AS (SELECT conv_id, turn_idx, ln,
                     ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx, grp
                                        ORDER BY idx) AS rn
              FROM pipe),
    cells AS (SELECT conv_id, turn_idx,
                     list_transform(string_split(ln, ' | '),
                                    c -> trim(c)) AS cs
              FROM trows WHERE rn > 1),
    itemrows AS (
      SELECT conv_id, turn_idx,
             try_cast(cs[2] AS BIGINT) AS qty,
             {_item_cents_sql('cs[3]')} AS unit_cents,
             {_item_cents_sql('cs[4]')} AS total_cents
      FROM cells
      WHERE len(cs) >= 4
        AND (cs[2] = '' OR try_cast(cs[2] AS BIGINT) IS NOT NULL)),
    roll AS (
      SELECT conv_id, turn_idx,
             CAST(COALESCE(SUM(qty), 0) AS BIGINT) AS items_qty,
             CAST(COALESCE(SUM(total_cents), 0) AS BIGINT)
                 AS items_total_cents,
             CASE WHEN COALESCE(SUM(qty), 0) > 0
                  THEN (2 * COALESCE(SUM(total_cents), 0) + SUM(qty))
                       // (2 * SUM(qty))
                  ELSE NULL END AS items_avg_unit_price_cents
      FROM itemrows GROUP BY conv_id, turn_idx)
    """


def entry() -> Any:
    """Flagship pipeline at sf0.001: read synthetic transcript shards →
    actor-pool extraction → validation.  Returns the validated Dataset
    (flat columns only, for stable driver-side conversion)."""
    from ocr_engine_ray.pipelines.queries import q_flagship_extract

    return q_flagship_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_engine_ray.pipelines import queries as q

    return {
        # transcript pipelines (rows-only driver check; pytest oracle
        # asserts per-turn equality)
        "flagship_extract": q.q_flagship_extract,
        "flagship_extract_templated": q.q_flagship_extract_templated,
        "conv_rollup": q.q_conv_rollup,
        "assemble_conversations": q.q_assemble_conversations,
        # SQL-checked operators over the driver testdata tables
        "events_conv_rollup": q.q_events_conv_rollup,
        "events_filter_purchases": q.q_events_filter_purchases,
        "events_first_last": q.q_events_first_last,
        "documents_dedup_exact": q.q_documents_dedup_exact,
        "documents_token_stats": q.q_documents_token_stats,
        "lineitem_pricing_summary": q.q_lineitem_pricing_summary,
        "top_customers": q.q_top_customers,
        "events_daily": q.q_events_daily,
        "distinct_event_types": q.q_distinct_event_types,
        "nation_region_join": q.q_nation_region_join,
        # dedup / similarity / text-analysis suite
        "transcripts_dedup_exact": q.q_transcripts_dedup_exact,
        "documents_minhash_neardup": q.q_documents_minhash_neardup,
        "documents_simhash_neardup": q.q_documents_simhash_neardup,
        "documents_textstats": q.q_documents_textstats,
        "embeddings_neardup": q.q_embeddings_neardup,
        "embeddings_semantic_dedup": q.q_embeddings_semantic_dedup,
        "embeddings_ann_topk": q.q_embeddings_ann_topk,
        "embeddings_ann_topk_lsh": q.q_embeddings_ann_topk_lsh,
        "embeddings_ann_topk_ivf": q.q_embeddings_ann_topk_ivf,
        # multimodal plumbing + resumable/lineage pipeline
        "media_decode": q.q_media_decode,
        "media_resize_plan": q.q_media_resize_plan,
        "media_frame_sample": q.q_media_frame_sample,
        "media_audio_segments": q.q_media_audio_segments,
        "flagship_resumable": q.q_flagship_resumable,
        # windows / set ops / export shaping / anti-join / sampling
        "events_sessionize": q.q_events_sessionize,
        "events_union_distinct": q.q_events_union_distinct,
        "export_rows": q.q_export_rows,
        "unapproved_vendors": q.q_unapproved_vendors,
        "events_sample": q.q_events_sample,
        "orders_lineitem_join": q.q_orders_lineitem_join,
        "documents_quality_filter": q.q_documents_quality_filter,
        "documents_minhash_dedup_keep": q.q_documents_minhash_dedup_keep,
        "events_value_stats": q.q_events_value_stats,
        "events_approx_distinct_users": q.q_events_approx_distinct_users,
        "events_asof_join": q.q_events_asof_join,
        "events_top2_per_user": q.q_events_top2_per_user,
        "transcripts_stratified_sample": q.q_transcripts_stratified_sample,
        # round 2: raw-transcript SQL twins, range join, exact quantiles
        "transcripts_dedup_streaming": q.q_transcripts_dedup_streaming,
        "transcripts_normalize": q.q_transcripts_normalize,
        "transcripts_invoice_numbers": q.q_transcripts_invoice_numbers,
        "transcripts_totals": q.q_transcripts_totals,
        "transcripts_vendors": q.q_transcripts_vendors,
        "transcripts_dates": q.q_transcripts_dates,
        "transcripts_raw_rollup": q.q_transcripts_raw_rollup,
        "transcripts_assemble_raw": q.q_transcripts_assemble_raw,
        "lineitem_quantiles": q.q_lineitem_quantiles,
        "events_range_join": q.q_events_range_join,
        "events_weighted_sample": q.q_events_weighted_sample,
        "events_reservoir_per_user": q.q_events_reservoir_per_user,
        "customers_without_orders": q.q_customers_without_orders,
        "events_pivot_types": q.q_events_pivot_types,
        "events_running_total": q.q_events_running_total,
        "lineitem_rollup_levels": q.q_lineitem_rollup_levels,
        "lineitem_cube_levels": q.q_lineitem_cube_levels,
        "events_distinct_users_per_type": q.q_events_distinct_users_per_type,
        "events_ntile": q.q_events_ntile,
        # round 3: LAG window, grouping sets, exact n-gram Jaccard pairs
        "events_lag_delta": q.q_events_lag_delta,
        "events_type_transitions": q.q_events_type_transitions,
        "events_value_trend": q.q_events_value_trend,
        "lineitem_grouping_sets": q.q_lineitem_grouping_sets,
        "documents_jaccard_pairs": q.q_documents_jaccard_pairs,
        # decontamination: exact (oracle-checked) + LSH scale path
        "documents_decontaminate": q.q_documents_decontaminate,
        "documents_decontaminate_lsh": q.q_documents_decontaminate_lsh,
        # round 4: the LSH join as a first-class API, hash-gated at
        # threshold 1.0 (structural recall — see the query docstring)
        "documents_lsh_join_exact": q.q_documents_lsh_join_exact,
        # extraction → rollup composition under the hash gate
        "transcripts_conv_rollup_fields": q.q_transcripts_conv_rollup_fields,
        "documents_textstats_sql": q.q_documents_textstats_sql,
        "customers_with_urgent_orders": q.q_customers_with_urgent_orders,
        "events_moving_avg": q.q_events_moving_avg,
        "events_hot_users": q.q_events_hot_users,
        "events_value_variance": q.q_events_value_variance,
        "events_top_values": q.q_events_top_values,
        # round 3 (cont.): JSON extract, scrub, dense rank, outer join
        "events_props_json": q.q_events_props_json,
        "transcripts_scrub": q.q_transcripts_scrub,
        "events_dense_rank": q.q_events_dense_rank,
        "customer_orders_left_join": q.q_customer_orders_left_join,
        # term-level text ops: chunking, TF-IDF/vocab, n-grams, Gopher gate
        "documents_chunk_windows": q.q_documents_chunk_windows,
        "documents_term_df": q.q_documents_term_df,
        "documents_top_bigrams": q.q_documents_top_bigrams,
        "documents_repetition": q.q_documents_repetition,
        "embeddings_label_centroids": q.q_embeddings_label_centroids,
        "documents_pack_bins": q.q_documents_pack_bins,
        "documents_posting_lists": q.q_documents_posting_lists,
        "events_value_histogram": q.q_events_value_histogram,
        "documents_source_mixture": q.q_documents_source_mixture,
        "documents_balance_classes": q.q_documents_balance_classes,
        "events_full_outer_days": q.q_events_full_outer_days,
        "documents_training_prep": q.q_documents_training_prep,
        # event analytics + multi-table: funnel, retention, Q3-style, set op, corr
        "events_funnel": q.q_events_funnel,
        "events_retention": q.q_events_retention,
        "orders_shipping_priority": q.q_orders_shipping_priority,
        "events_except_days": q.q_events_except_days,
        "lineitem_corr": q.q_lineitem_corr,
        # set intersection, melt, entropy, fuzzy join, gap fill
        "events_intersect_days": q.q_events_intersect_days,
        "events_unpivot_counts": q.q_events_unpivot_counts,
        "events_user_entropy": q.q_events_user_entropy,
        "customers_fuzzy_name_pairs": q.q_customers_fuzzy_name_pairs,
        "events_daily_gapfill": q.q_events_daily_gapfill,
        "documents_winnow_fingerprints": q.q_documents_winnow_fingerprints,
        "documents_regex_tokens": q.q_documents_regex_tokens,
        "embeddings_kmeans": q.q_embeddings_kmeans,
        "events_percent_rank": q.q_events_percent_rank,
        "events_tumbling_daily": q.q_events_tumbling_daily,
        "events_hopping_2day": q.q_events_hopping_2day,
        "events_value_mode": q.q_events_value_mode,
        "region_types_grid": q.q_region_types_grid,
        "events_sessions_streaming": q.q_events_sessions_streaming,
        "documents_neardup_components": q.q_documents_neardup_components,
        "documents_train_split": q.q_documents_train_split,
        "documents_unigram_logprob": q.q_documents_unigram_logprob,
        "documents_source_kl": q.q_documents_source_kl,
        "documents_cross_source_dups": q.q_documents_cross_source_dups,
        # heavy hitters / grouped quantiles / rolling distinct /
        # co-occurrence / tf-idf similarity join
        "events_heavy_hitters": q.q_events_heavy_hitters,
        "events_grouped_quantiles": q.q_events_grouped_quantiles,
        "events_rolling_distinct": q.q_events_rolling_distinct,
        "events_cooccurrence": q.q_events_cooccurrence,
        "documents_tfidf_pairs": q.q_documents_tfidf_pairs,
        "transcripts_boilerplate": q.q_transcripts_boilerplate,
        "events_quantiles_cont": q.q_events_quantiles_cont,
        "events_value_outliers": q.q_events_value_outliers,
        "events_approx_distinct_per_type":
            q.q_events_approx_distinct_per_type,
        "documents_containment_pairs": q.q_documents_containment_pairs,
        "events_value_zscore": q.q_events_value_zscore,
        "documents_ngram_contamination":
            q.q_documents_ngram_contamination,
        "documents_ngram_contamination_scaled":
            q.q_documents_ngram_contamination_scaled,
        "documents_dup_spans": q.q_documents_dup_spans,
        "documents_dup_spans_removed": q.q_documents_dup_spans_removed,
        "documents_dsir_weights": q.q_documents_dsir_weights,
        "documents_neardup_keep_best": q.q_documents_neardup_keep_best,
        "documents_neardup_cluster_sizes":
            q.q_documents_neardup_cluster_sizes,
        "documents_char_entropy": q.q_documents_char_entropy,
        "documents_pmi_bigrams": q.q_documents_pmi_bigrams,
        "documents_gt_unseen": q.q_documents_gt_unseen,
        "documents_zipf_slope": q.q_documents_zipf_slope,
        "documents_token_budget_sample":
            q.q_documents_token_budget_sample,
        "documents_length_filter": q.q_documents_length_filter,
        "events_latest_per_user": q.q_events_latest_per_user,
        "transcripts_cluster_sample": q.q_transcripts_cluster_sample,
        "events_hour_profile": q.q_events_hour_profile,
        "orders_customer_right_join": q.q_orders_customer_right_join,
        "lineitem_weighted_avg": q.q_lineitem_weighted_avg,
        "lineitem_quantiles_tdigest": q.q_lineitem_quantiles_tdigest,
        "events_type_share": q.q_events_type_share,
        "orders_orphans": q.q_orders_orphans,
        "events_user_growth": q.q_events_user_growth,
        "transcripts_role_profile": q.q_transcripts_role_profile,
        "events_median_gap": q.q_events_median_gap,
        "revenue_by_nation": q.q_revenue_by_nation,
        "documents_gopher_gate": q.q_documents_gopher_gate,
        "documents_bm25_topk": q.q_documents_bm25_topk,
        "embeddings_covariance": q.q_embeddings_covariance,
        "embeddings_pca": q.q_embeddings_pca,
        "events_rank_gaps": q.q_events_rank_gaps,
        "embeddings_pca_project": q.q_embeddings_pca_project,
        "events_lead_next": q.q_events_lead_next,
        "events_winsorized_mean": q.q_events_winsorized_mean,
        "documents_ngram_novelty": q.q_documents_ngram_novelty,
        "documents_vocab_coverage": q.q_documents_vocab_coverage,
        "documents_source_vocab_overlap":
            q.q_documents_source_vocab_overlap,
        "documents_canary_scan": q.q_documents_canary_scan,
        "documents_data_card": q.q_documents_data_card,
        "documents_train_order": q.q_documents_train_order,
        "documents_dedup_normalized": q.q_documents_dedup_normalized,
        "documents_c4_gate": q.q_documents_c4_gate,
        "documents_temperature_mix": q.q_documents_temperature_mix,
        "documents_ngram_diversity": q.q_documents_ngram_diversity,
        "documents_source_ttest": q.q_documents_source_ttest,
        "events_theilsen_trend": q.q_events_theilsen_trend,
        "documents_line_dedup": q.q_documents_line_dedup,
        "orders_large_quantity": q.q_orders_large_quantity,
        "promo_revenue_share": q.q_promo_revenue_share,
        "orders_priority_returns": q.q_orders_priority_returns,
        "customers_idle_rich": q.q_customers_idle_rich,
        "part_revenue_share": q.q_part_revenue_share,
        "volume_shipping": q.q_volume_shipping,
        "orders_above_cust_avg": q.q_orders_above_cust_avg,
        "events_ks_test": q.q_events_ks_test,
        "documents_ppl_buckets": q.q_documents_ppl_buckets,
        "lineitem_revenue_forecast": q.q_lineitem_revenue_forecast,
        "returned_item_report": q.q_returned_item_report,
        "events_chi2_independence": q.q_events_chi2_independence,
        "events_mwu_test": q.q_events_mwu_test,
        "top_supplier": q.q_top_supplier,
        "part_supplier_counts": q.q_part_supplier_counts,
        "events_benford_digits": q.q_events_benford_digits,
        "events_daily_autocorr": q.q_events_daily_autocorr,
        "events_spearman": q.q_events_spearman,
        "customers_order_count_dist": q.q_customers_order_count_dist,
        "small_quantity_revenue": q.q_small_quantity_revenue,
        "brand_size_revenue": q.q_brand_size_revenue,
        "lineitem_priority_counts": q.q_lineitem_priority_counts,
        "national_market_share": q.q_national_market_share,
        "product_profit_by_nation": q.q_product_profit_by_nation,
        "min_balance_supplier": q.q_min_balance_supplier,
        "top_share_suppliers": q.q_top_share_suppliers,
        "sole_returning_suppliers": q.q_sole_returning_suppliers,
        "events_anova_f": q.q_events_anova_f,
        "events_kruskal_wallis": q.q_events_kruskal_wallis,
        "events_user_gini": q.q_events_user_gini,
        "events_cramers_v": q.q_events_cramers_v,
        "embeddings_hard_negatives": q.q_embeddings_hard_negatives,
        "embeddings_centroid_outliers": q.q_embeddings_centroid_outliers,
        "documents_leakage_safe_split": q.q_documents_leakage_safe_split,
        "documents_length_batches": q.q_documents_length_batches,
        "documents_bpe_pair_counts": q.q_documents_bpe_pair_counts,
        "transcripts_dup_weights": q.q_transcripts_dup_weights,
        "transcripts_dup_token_mass": q.q_transcripts_dup_token_mass,
        "documents_top_terms_per_source":
            q.q_documents_top_terms_per_source,
        "events_winsorize_values": q.q_events_winsorize_values,
        "transcripts_windowed_dedup": q.q_transcripts_windowed_dedup,
        "events_daily_ewma": q.q_events_daily_ewma,
        "customers_rfm_segments": q.q_customers_rfm_segments,
        "events_pareto_share": q.q_events_pareto_share,
        "events_new_vs_returning": q.q_events_new_vs_returning,
        "events_psi_drift": q.q_events_psi_drift,
        "lineitem_profile": q.q_lineitem_profile,
        "events_rolling_median": q.q_events_rolling_median,
        "events_ols_trend": q.q_events_ols_trend,
        "parts_copurchase_degrees": q.q_parts_copurchase_degrees,
        "parts_copurchase_triangles": q.q_parts_copurchase_triangles,
        "parts_copurchase_pagerank": q.q_parts_copurchase_pagerank,
        "parts_basket_lift": q.q_parts_basket_lift,
        "events_target_encoding": q.q_events_target_encoding,
        "events_impute_median": q.q_events_impute_median,
        "embeddings_label_noise": q.q_embeddings_label_noise,
        "events_change_point": q.q_events_change_point,
        "events_rolling_1h_sum": q.q_events_rolling_1h_sum,
        "events_session_timeout_sweep": q.q_events_session_timeout_sweep,
        "documents_jaccard_threshold_curve":
            q.q_documents_jaccard_threshold_curve,
        "customers_skyline": q.q_customers_skyline,
        "events_scd2_intervals": q.q_events_scd2_intervals,
        "customers_cdc_merge": q.q_customers_cdc_merge,
        "events_twap": q.q_events_twap,
        "events_survival_km": q.q_events_survival_km,
        "ri_audit": q.q_ri_audit,
        "customers_table_diff": q.q_customers_table_diff,
        "documents_keywords": q.q_documents_keywords,
        "dq_audit": q.q_dq_audit,
        "events_funnel_timebound": q.q_events_funnel_timebound,
        "events_top_paths": q.q_events_top_paths,
        "events_daily_anomaly": q.q_events_daily_anomaly,
        "lineitem_zorder_stats": q.q_lineitem_zorder_stats,
        "events_user_streaks": q.q_events_user_streaks,
        "events_max_concurrent": q.q_events_max_concurrent,
        "events_cume_dist": q.q_events_cume_dist,
        "lineitem_weighted_median": q.q_lineitem_weighted_median,
        "orders_budget_allocation": q.q_orders_budget_allocation,
        "events_levene_test": q.q_events_levene_test,
        "documents_prefix_dedup": q.q_documents_prefix_dedup,
        "events_wilson_ci": q.q_events_wilson_ci,
        "events_cohens_d": q.q_events_cohens_d,
        "events_weekend_ztest": q.q_events_weekend_ztest,
        "events_dow_seasonality": q.q_events_dow_seasonality,
        "events_seasonal_adjust": q.q_events_seasonal_adjust,
        "events_wow_growth": q.q_events_wow_growth,
        "documents_nb_classify": q.q_documents_nb_classify,
        "documents_js_divergence": q.q_documents_js_divergence,
        "events_markov_stationary": q.q_events_markov_stationary,
        "documents_sentence_stats": q.q_documents_sentence_stats,
        "embeddings_rrf_fusion": q.q_embeddings_rrf_fusion,
        "events_daily_holt": q.q_events_daily_holt,
        "events_logit_purchase": q.q_events_logit_purchase,
        "customers_golden_record": q.q_customers_golden_record,
        "events_hour_dow_heatmap": q.q_events_hour_dow_heatmap,
        "embeddings_silhouette": q.q_embeddings_silhouette,
        "documents_simpson_diversity": q.q_documents_simpson_diversity,
        "orders_backlog_curve": q.q_orders_backlog_curve,
        "documents_decision_stump": q.q_documents_decision_stump,
        "events_entropy_rate": q.q_events_entropy_rate,
        "events_weekly_churn": q.q_events_weekly_churn,
        "embeddings_hubness": q.q_embeddings_hubness,
        "events_mann_kendall": q.q_events_mann_kendall,
        "orders_dupe_audit": q.q_orders_dupe_audit,
        "lineitem_abc_classes": q.q_lineitem_abc_classes,
        "documents_robust_scale": q.q_documents_robust_scale,
        "events_user_lifespan": q.q_events_user_lifespan,
        "events_signup_to_purchase": q.q_events_signup_to_purchase,
        "supplier_return_rate": q.q_supplier_return_rate,
        "documents_dedup_loss_by_source":
            q.q_documents_dedup_loss_by_source,
        "orders_ltv_triangle": q.q_orders_ltv_triangle,
        "events_stickiness": q.q_events_stickiness,
        # model-evaluation family (round 4, session 10)
        "documents_stump_confusion": q.q_documents_stump_confusion,
        "documents_length_auc": q.q_documents_length_auc,
        "documents_kfold_stats": q.q_documents_kfold_stats,
        "events_poisson_bootstrap": q.q_events_poisson_bootstrap,
        "events_permutation_test": q.q_events_permutation_test,
        "lineitem_multireg": q.q_lineitem_multireg,
        "embeddings_int8_recall": q.q_embeddings_int8_recall,
        "events_user_path_agg": q.q_events_user_path_agg,
        "customers_snm_pairs": q.q_customers_snm_pairs,
        "events_temporal_split": q.q_events_temporal_split,
        "events_cuped": q.q_events_cuped,
        "events_k_anonymity": q.q_events_k_anonymity,
        "events_randomized_response": q.q_events_randomized_response,
        "events_hodges_lehmann": q.q_events_hodges_lehmann,
        "events_conformal_intervals": q.q_events_conformal_intervals,
        "documents_minhash_sql": q.q_documents_minhash_sql,
        "documents_minhash_pr": q.q_documents_minhash_pr,
        # graph family part 2 (round 4, session 11)
        "parts_copurchase_kcore": q.q_parts_copurchase_kcore,
        "parts_copurchase_bfs": q.q_parts_copurchase_bfs,
        "events_sprt": q.q_events_sprt,
        "supplier_eb_shrinkage": q.q_supplier_eb_shrinkage,
        "parts_copurchase_eigencentrality":
            q.q_parts_copurchase_eigencentrality,
        "embeddings_mmr": q.q_embeddings_mmr,
        "events_isotonic_daily": q.q_events_isotonic_daily,
        "documents_chao1": q.q_documents_chao1,
        "parts_copurchase_assortativity":
            q.q_parts_copurchase_assortativity,
        "embeddings_dbscan": q.q_embeddings_dbscan,
        "supplier_rank_rbo": q.q_supplier_rank_rbo,
        "documents_reliability_bins": q.q_documents_reliability_bins,
        "events_locf_daily": q.q_events_locf_daily,
        "embeddings_pq_recall": q.q_embeddings_pq_recall,
        "events_max_drawdown": q.q_events_max_drawdown,
        "embeddings_jl_distortion": q.q_embeddings_jl_distortion,
        # warehouse-ops wave (round 4, session 12)
        "orders_hhi_by_nation": q.q_orders_hhi_by_nation,
        "events_lorenz_deciles": q.q_events_lorenz_deciles,
        "parts_copurchase_linkpred": q.q_parts_copurchase_linkpred,
        "events_freshness": q.q_events_freshness,
        # transcripts wave (round 4, session 12)
        "transcripts_tool_stats": q.q_transcripts_tool_stats,
        "transcripts_role_transitions": q.q_transcripts_role_transitions,
        "transcripts_context_budget": q.q_transcripts_context_budget,
        "transcripts_response_latency": q.q_transcripts_response_latency,
        "parts_copurchase_adamic_adar":
            q.q_parts_copurchase_adamic_adar,
        "documents_source_cosine": q.q_documents_source_cosine,
        "events_mcnemar": q.q_events_mcnemar,
        "lineitem_branch_revenue": q.q_lineitem_branch_revenue,
        "documents_readability": q.q_documents_readability,
        "parts_discount_elasticity": q.q_parts_discount_elasticity,
        "supplier_ship_lag": q.q_supplier_ship_lag,
        "documents_hapax_by_source": q.q_documents_hapax_by_source,
        "transcripts_sft_pairs": q.q_transcripts_sft_pairs,
        "transcripts_tool_chains": q.q_transcripts_tool_chains,
        "parts_copurchase_edge_jaccard":
            q.q_parts_copurchase_edge_jaccard,
        "documents_lang_mix": q.q_documents_lang_mix,
        "documents_lexical_rank": q.q_documents_lexical_rank,
        "events_bot_audit": q.q_events_bot_audit,
        "embeddings_kcenter": q.q_embeddings_kcenter,
        "events_acf": q.q_events_acf,
        "transcripts_tool_followup": q.q_transcripts_tool_followup,
        "events_type_burstiness": q.q_events_type_burstiness,
        "documents_compression_ratio":
            q.q_documents_compression_ratio,
        "transcripts_link_density": q.q_transcripts_link_density,
        "transcripts_md_structure": q.q_transcripts_md_structure,
        "transcripts_system_prompts": q.q_transcripts_system_prompts,
        "transcripts_turn_integrity": q.q_transcripts_turn_integrity,
        "transcripts_conv_prefix_groups":
            q.q_transcripts_conv_prefix_groups,
        "transcripts_loop_runs": q.q_transcripts_loop_runs,
        "transcripts_tool_latency_quantiles":
            q.q_transcripts_tool_latency_quantiles,
        "transcripts_anchor_spans": q.q_transcripts_anchor_spans,
        "transcripts_episodes": q.q_transcripts_episodes,
        "parts_copurchase_communities":
            q.q_parts_copurchase_communities,
        "transcripts_role_balance": q.q_transcripts_role_balance,
        "embeddings_qa": q.q_embeddings_qa,
        "parts_copurchase_betweenness":
            q.q_parts_copurchase_betweenness,
        "documents_neardup_streaming":
            q.q_documents_neardup_streaming,
        "transcripts_conv_dedup": q.q_transcripts_conv_dedup,
        "parts_small_qty_revenue": q.q_parts_small_qty_revenue,
        "suppliers_sole_late": q.q_suppliers_sole_late,
        "parts_copurchase_closeness":
            q.q_parts_copurchase_closeness,
        "documents_kneser_ney": q.q_documents_kneser_ney,
        "transcripts_training_windows":
            q.q_transcripts_training_windows,
        "embeddings_mrl_recall": q.q_embeddings_mrl_recall,
        "events_cusum_changepoint": q.q_events_cusum_changepoint,
        "transcripts_training_prep":
            q.q_transcripts_training_prep,
        "events_trimmed_mean": q.q_events_trimmed_mean,
        "transcripts_role_lexical": q.q_transcripts_role_lexical,
        "flagship_backend_agreement":
            q.q_flagship_backend_agreement,
        "transcripts_preference_pairs":
            q.q_transcripts_preference_pairs,
        "transcripts_luhn_audit": q.q_transcripts_luhn_audit,
        "transcripts_encoding_audit":
            q.q_transcripts_encoding_audit,
        "transcripts_tool_transitions":
            q.q_transcripts_tool_transitions,
        "parts_copurchase_modularity":
            q.q_parts_copurchase_modularity,
        "parts_copurchase_clustering":
            q.q_parts_copurchase_clustering,
        "events_value_moments": q.q_events_value_moments,
        "transcripts_conv_turn_jaccard":
            q.q_transcripts_conv_turn_jaccard,
        "documents_query_likelihood":
            q.q_documents_query_likelihood,
        "events_bloom_filter": q.q_events_bloom_filter,
        "transcripts_outlinks": q.q_transcripts_outlinks,
        "transcripts_html_tags": q.q_transcripts_html_tags,
        "transcripts_ngram_loop": q.q_transcripts_ngram_loop,
        "embeddings_triplet_margin":
            q.q_embeddings_triplet_margin,
        "documents_rank_agreement": q.q_documents_rank_agreement,
        "events_count_min": q.q_events_count_min,
        "transcripts_verbosity_ols":
            q.q_transcripts_verbosity_ols,
        "documents_extractive_topsent":
            q.q_documents_extractive_topsent,
        "embeddings_knn_eval": q.q_embeddings_knn_eval,
        "transcripts_number_density":
            q.q_transcripts_number_density,
        "transcripts_conv_redundancy":
            q.q_transcripts_conv_redundancy,
        "transcripts_markup_overhead":
            q.q_transcripts_markup_overhead,
        "events_log2_histogram": q.q_events_log2_histogram,
        "transcripts_id_leakage": q.q_transcripts_id_leakage,
        "transcripts_depth_profile":
            q.q_transcripts_depth_profile,
        "transcripts_sft_quality_gate":
            q.q_transcripts_sft_quality_gate,
        "transcripts_dedup_yield": q.q_transcripts_dedup_yield,
        "documents_term_burstiness":
            q.q_documents_term_burstiness,
        "transcripts_length_quantiles":
            q.q_transcripts_length_quantiles,
        "transcripts_table_stats": q.q_transcripts_table_stats,
        "events_type_audience_overlap":
            q.q_events_type_audience_overlap,
        "events_wow_contribution": q.q_events_wow_contribution,
        "transcripts_md_links": q.q_transcripts_md_links,
        "parts_cf_cosine": q.q_parts_cf_cosine,
        "events_forecast_backtest":
            q.q_events_forecast_backtest,
        "events_did": q.q_events_did,
        "embeddings_isotropy": q.q_embeddings_isotropy,
        "transcripts_repeated_lines":
            q.q_transcripts_repeated_lines,
        "embeddings_fisher_ratio": q.q_embeddings_fisher_ratio,
        "parts_copurchase_richclub":
            q.q_parts_copurchase_richclub,
        "documents_vocab_growth": q.q_documents_vocab_growth,
        "transcripts_case_profile": q.q_transcripts_case_profile,
        "events_hour_entropy": q.q_events_hour_entropy,
        "transcripts_tool_retry_rate":
            q.q_transcripts_tool_retry_rate,
        "transcripts_conv_length_hist":
            q.q_transcripts_conv_length_hist,
        "transcripts_pr_length_joint":
            q.q_transcripts_pr_length_joint,
        "parts_copurchase_weight_hist":
            q.q_parts_copurchase_weight_hist,
        "events_xcorr": q.q_events_xcorr,
        "transcripts_tool_depth_profile":
            q.q_transcripts_tool_depth_profile,
        "parts_copurchase_degree_matrix":
            q.q_parts_copurchase_degree_matrix,
        "transcripts_weekly_role_mix":
            q.q_transcripts_weekly_role_mix,
        "documents_quality_census": q.q_documents_quality_census,
        "transcripts_totals_reconciliation":
            q.q_transcripts_totals_reconciliation,
        "supplier_otif": q.q_supplier_otif,
        "events_week_retention_jaccard":
            q.q_events_week_retention_jaccard,
        "orders_weekly_priority_mix":
            q.q_orders_weekly_priority_mix,
        "transcripts_amount_stats": q.q_transcripts_amount_stats,
        "events_weekly_gini": q.q_events_weekly_gini,
        "events_session_count_hist":
            q.q_events_session_count_hist,
        "orders_repeat_rate": q.q_orders_repeat_rate,
        "transcripts_start_hour_profile":
            q.q_transcripts_start_hour_profile,
        "transcripts_latency_by_depth":
            q.q_transcripts_latency_by_depth,
        "events_revenue_by_dow": q.q_events_revenue_by_dow,
        "lineitem_discount_profile":
            q.q_lineitem_discount_profile,
        "transcripts_daily_volume": q.q_transcripts_daily_volume,
        "events_cohort_matrix": q.q_events_cohort_matrix,
        "transcripts_vocab_growth":
            q.q_transcripts_vocab_growth,
        "lineitem_linenumber_profile":
            q.q_lineitem_linenumber_profile,
        "orders_totalprice_audit": q.q_orders_totalprice_audit,
    }


def oracle_sql() -> dict[str, str]:
    # The transcript-table oracles read the deterministic synthetic
    # corpus the transcript queries themselves consume.  Materializing it
    # here (pure-Python Parquet write, idempotent, no Ray needed) makes
    # the oracle valid regardless of whether the driver runs the SQL or
    # the Ray pipeline first.  The driver's correctness gate runs at
    # sf0.01, so the SQL pins that corpus.
    import os

    from ocr_engine_ray.pipelines.queries import (
        media_parquet_path, transcript_paths,
    )

    # The driver's correctness gate runs at sf0.01 (the default here);
    # tools/check_contract.py exports GRAFT_ORACLE_SF_DIR so the
    # synthetic-corpus oracles stay valid when checking other scales.
    oracle_sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR",
                                   "/root/testdata/sf0.01")
    synth_glob = os.path.join(
        os.path.dirname(transcript_paths(oracle_sf_dir)[0]), "*.parquet")
    transcripts = f"read_parquet('{synth_glob}')"
    media = f"read_parquet('{media_parquet_path(oracle_sf_dir)}')"

    # little-endian u32 out of a hex-encoded blob (DuckDB 1.0 has
    # to_hex(BLOB) but no byte indexing): per-byte nibble arithmetic
    def hexbyte(i: int) -> str:  # 1-based byte offset in the blob
        return (f"(16*(strpos('0123456789ABCDEF', substr(hx,{2 * i - 1},1))-1)"
                f" + strpos('0123456789ABCDEF', substr(hx,{2 * i},1))-1)")

    def le32(start: int) -> str:
        return " + ".join(f"{256 ** j}*{hexbyte(start + j)}" for j in range(4))

    sub_cents = _cents_sql(
        r"regexp_extract(t, '(?i)subtotal[:\s]*\$?(" + _AMT_RE + r")', 1)")
    tax_cents = _cents_sql(
        r"regexp_extract(t, '(?i)(^|[^a-z])tax(?:es)?[:\s]*\$?("
        + _AMT_RE + r")', 2)")
    tot_cents = _cents_sql(
        r"regexp_extract(t, '(?i)(^|[^a-z])total[:\s]*\$?("
        + _AMT_RE + r")', 2)")

    # vendor/address CTEs over a CTE ``n(conv_id, turn_idx, t)`` — same
    # expressions as the transcripts_vendors twin (char-exact)
    vendor_ctes = """
    l AS (SELECT conv_id, turn_idx, t,
            list_filter(string_split(t, chr(10)),
              x -> trim(x) != '' AND NOT contains(x, ' | ')
                   AND NOT regexp_matches(trim(x),
                         '^[^:|]{1,60}?\\s*:\\s*(.+)$')) AS ls
          FROM n),
    v AS (SELECT conv_id, turn_idx, t,
            trim(COALESCE(ls[1], '')) AS vendor_name,
            trim(COALESCE(ls[2], '')) AS vendor_street,
            CASE WHEN len(ls) >= 3 THEN COALESCE(trim(regexp_extract(
              ls[3], '([A-Za-z\\s]+),\\s*([A-Z]{2})', 1)), '')
              ELSE '' END AS vendor_city,
            CASE WHEN len(ls) >= 3 THEN COALESCE(regexp_extract(
              ls[3], '([A-Za-z\\s]+),\\s*([A-Z]{2})', 2), '')
              ELSE '' END AS vendor_state,
            CASE WHEN len(ls) >= 3 THEN COALESCE(regexp_extract(
              ls[3], '\\b\\d{5}(?:-\\d{4})?\\b', 0), '')
              ELSE '' END AS vendor_postal
          FROM l)
    """
    inv_chain = """
              COALESCE(
                NULLIF(regexp_extract(t,
                  '(?i)invoice\\s*number?[:\\s]*([A-Za-z0-9-]{5,})', 1), ''),
                NULLIF(regexp_extract(t,
                  '(?i)invoice\\s*#[:\\s]*([A-Za-z0-9-]{5,})', 1), ''),
                NULLIF(regexp_extract(t,
                  '(?i)inv[:\\s]*([A-Za-z0-9-]{5,})', 1), ''))
    """
    export_sql = f"""
        WITH {_items_rollup_ctes(transcripts, _NORM_EXPR)},
        {vendor_ctes},
        f AS (SELECT conv_id, turn_idx, t, vendor_name, vendor_street,
                     vendor_city, vendor_state, vendor_postal,
                     COALESCE({inv_chain}, '') AS invoice_number,
                     {_date_parse_sql('t')} AS d,
                     {sub_cents} AS gt, {tax_cents} AS tx,
                     {tot_cents} AS ft
              FROM v)
        SELECT
          f.conv_id || '#' || CAST(f.turn_idx AS VARCHAR) AS filename,
          f.invoice_number,
          f.vendor_name,
          concat_ws(', ', NULLIF(f.vendor_street, ''),
                    NULLIF(f.vendor_city, ''), NULLIF(f.vendor_state, ''),
                    NULLIF(f.vendor_postal, '')) AS address,
          CASE WHEN f.d IS NULL THEN '' ELSE printf('%04d-%02d-%02d',
               year(f.d), month(f.d), day(f.d)) END AS invoice_date,
          {_money_str_sql('f.gt')} AS grand_total,
          {_money_str_sql('f.tx')} AS taxes,
          {_money_str_sql('f.ft')} AS final_total,
          CAST(COALESCE(r.items_qty, 0) AS BIGINT) AS quantity,
          {_money_str_sql('r.items_avg_unit_price_cents')} AS unit_price,
          {_money_str_sql('COALESCE(r.items_total_cents, 0)')} AS total,
          CAST(1 AS INTEGER) AS pages
        FROM f LEFT JOIN roll r USING (conv_id, turn_idx)
    """
    unapproved_sql = f"""
        WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                   FROM {transcripts}),
        {vendor_ctes}
        SELECT conv_id, turn_idx, vendor_name,
               false AS vendor_approved
        FROM v
        WHERE vendor_name <> ''
          AND lower(vendor_name) NOT IN
              ('acme supplies inc', 'globex corporation', 'initech llc')
    """
    dates_sql = f"""
        WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                   FROM {transcripts})
        SELECT conv_id, turn_idx,
               CAST({_date_parse_sql('t')} AS TIMESTAMP) AS invoice_date
        FROM n
    """
    conv_rollup_fields_sql = f"""
        WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                   FROM {transcripts}),
        f AS (SELECT conv_id,
                     {inv_chain} AS inv,
                     {_date_parse_sql('t')} AS d,
                     {tot_cents} AS ft
              FROM n)
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT)             AS n_turns,
               CAST(COUNT(inv) AS BIGINT)           AS n_invoices,
               CAST(COUNT(d) AS BIGINT)             AS n_dated,
               CAST(COALESCE(SUM(ft), 0) AS BIGINT) AS total_cents
        FROM f GROUP BY conv_id
    """

    media_resize_sql = f"""
        WITH h AS (
          SELECT media_id, conv_id, turn_idx, to_hex(payload) AS hx
          FROM {media}
          WHERE octet_length(payload) >= 16
            AND substr(to_hex(payload), 1, 16) = '46414B45494D4731'),
        dims AS (
          SELECT media_id, conv_id, turn_idx,
                 CAST({le32(9)} AS BIGINT)  AS w,
                 CAST({le32(13)} AS BIGINT) AS h
          FROM h)
        SELECT media_id, conv_id, turn_idx, w AS width, h AS height,
               CASE WHEN greatest(w, h) > 256
                    THEN w * 256 // greatest(w, h) ELSE w END AS new_width,
               CASE WHEN greatest(w, h) > 256
                    THEN h * 256 // greatest(w, h) ELSE h END AS new_height
        FROM dims
    """
    media_frames_sql = f"""
        WITH h AS (
          SELECT media_id, conv_id, turn_idx, payload, to_hex(payload) AS hx,
                 CAST(octet_length(payload) AS BIGINT) AS plen
          FROM {media}
          WHERE octet_length(payload) >= 16
            AND substr(to_hex(payload), 1, 16) = '46414B4556494431'),
        f AS (
          SELECT media_id, conv_id, turn_idx, hx, plen,
                 CAST({le32(9)} AS BIGINT) AS nf
          FROM h),
        idx AS (
          SELECT media_id, conv_id, turn_idx, hx, plen,
                 CAST(unnest(range(0, nf, 30)) AS BIGINT) AS frame_idx
          FROM f),
        -- DuckDB 1.0 has no BLOB substring: slice the hex encoding
        -- (2 chars per byte) of the 16-byte frame directly
        sl AS (
          SELECT media_id, conv_id, turn_idx, frame_idx,
                 lower(substr(hx,
                              CAST(2 * (16 + (frame_idx * 16)
                                   % greatest(1, plen - 16)) + 1 AS BIGINT),
                              32)) AS fr
          FROM idx)
        SELECT media_id, conv_id, turn_idx, frame_idx,
               CASE WHEN fr = '' THEN repeat('00', 16) ELSE fr END
                   AS frame_hex
        FROM sl
    """
    media_audio_sql = f"""
        WITH h AS (
          SELECT media_id, conv_id, turn_idx, to_hex(payload) AS hx
          FROM {media}
          WHERE octet_length(payload) >= 16
            AND substr(to_hex(payload), 1, 16) = '46414B4541554431'),
        f AS (SELECT media_id, conv_id, turn_idx,
                     CAST({le32(9)} AS BIGINT)  AS sr,
                     CAST({le32(13)} AS BIGINT) AS ns
              FROM h),
        g AS (SELECT *, sr * 10 AS win,
                     (ns + sr * 10 - 1) // (sr * 10) AS n_seg
              FROM f WHERE sr > 0 AND ns > 0),
        seg AS (SELECT media_id, conv_id, turn_idx, sr, ns, win,
                       CAST(unnest(range(0, n_seg)) AS BIGINT) AS seg_idx
                FROM g)
        SELECT media_id, conv_id, turn_idx, seg_idx,
               seg_idx * win AS start_sample,
               least(win, ns - seg_idx * win) AS n_samples,
               least(win, ns - seg_idx * win) * 1000 // sr
                   AS duration_ms
        FROM seg
    """
    media_sql = f"""
        WITH h AS (
          SELECT media_id, conv_id, turn_idx, kind, mime,
                 CAST(octet_length(payload) AS BIGINT) AS payload_bytes,
                 to_hex(payload) AS hx
          FROM {media})
        SELECT media_id, conv_id, turn_idx, kind, mime, payload_bytes,
               CASE substr(hx, 1, 16)
                 WHEN '46414B45494D4731' THEN 'image'
                 WHEN '46414B4541554431' THEN 'audio'
                 WHEN '46414B4556494431' THEN 'video'
                 ELSE 'unknown' END AS decoded_kind,
               CAST({le32(9)} AS BIGINT)  AS dim_a,
               CAST({le32(13)} AS BIGINT) AS dim_b,
               ''                          AS decode_error
        FROM h
    """
    # textstats twin: replays detect_lang (first-2000-char sample, ≤200
    # lowered tokens, stopword-hit argmax with fixed en>de>fr>es tie
    # order, hits≥2 floor, CJK density gate) and quality_score (token /
    # punct / upper counts as regex strips; composite gates multiplied
    # in the Python order; DuckDB-ROUND 4-decimal parity on both sides).
    # ASCII-corpus twin (like _NORM_EXPR): RE2's \w/\s/[A-Z] are ASCII
    # while Python's \w, str.split and isupper are Unicode — identical
    # on this printable-ASCII corpus, divergent on non-ASCII text.
    def _sw_list(lang):
        sws = {
            "en": "'the','and','of','to','a','in','is','it','that','for'",
            "de": "'der','die','das','und','ist','nicht','ein','eine','zu','mit'",
            "fr": "'le','la','les','et','est','une','un','pour','que','dans'",
            "es": "'el','la','los','las','es','una','un','para','que','con'",
        }
        return sws[lang]

    def _hits(lang):
        return (f"len(list_filter(ltoks, x -> x IN ({_sw_list(lang)}))) "
                f"AS h_{lang}")

    textstats_sql = f"""
        WITH base AS (
          SELECT doc_id, COALESCE(text, '') AS t,
                 substr(COALESCE(text, ''), 1, 2000) AS smp
          FROM documents),
        tok AS (
          SELECT doc_id, t, smp,
                 list_filter(regexp_split_to_array(t, '\\s+'),
                             x -> x <> '') AS toks,
                 list_transform(
                   list_filter(regexp_split_to_array(smp, '\\s+'),
                               x -> x <> '')[1:200],
                   x -> lower(x)) AS ltoks
          FROM base),
        feat AS (
          SELECT doc_id, t, smp, toks,
                 CAST(length(t) AS BIGINT) AS n_chars,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 CAST(length(regexp_replace(t, '\\s', '', 'g')) AS BIGINT)
                     AS n_tokchars,
                 CAST(length(regexp_replace(t, '[\\w\\s]', '', 'g')) AS BIGINT)
                     AS n_punct,
                 CAST(length(regexp_replace(t, '[^A-Z]', '', 'g')) AS BIGINT)
                     AS n_upper,
                 CAST(len(list_filter(toks,
                     x -> lower(x) IN ({_sw_list('en')}))) AS BIGINT)
                     AS n_stop,
                 CAST(len(regexp_extract_all(t, '\\w+|[^\\w\\s]')) AS BIGINT)
                     AS n_subtokens,
                 CAST(len(regexp_extract_all(smp,
                     '[\\x{{4e00}}-\\x{{9fff}}\\x{{3040}}-\\x{{30ff}}'
                     || '\\x{{ac00}}-\\x{{d7af}}]')) AS BIGINT) AS n_cjk,
                 {_hits('en')}, {_hits('de')}, {_hits('fr')}, {_hits('es')}
          FROM tok),
        ratio AS (
          SELECT *,
                 CASE WHEN n_tokens = 0 THEN 0.0
                      ELSE n_tokchars * 1.0 / n_tokens END AS mean_len,
                 CASE WHEN n_tokens = 0 THEN 0.0
                      ELSE n_punct * 1.0 / greatest(1, n_chars) END AS punct,
                 CASE WHEN n_tokens = 0 THEN 0.0
                      ELSE n_stop * 1.0 / n_tokens END AS stop,
                 CASE WHEN n_tokens = 0 THEN 0.0
                      ELSE n_upper * 1.0 / greatest(1, n_chars) END AS upper_r,
                 greatest(h_en, h_de, h_fr, h_es) AS best_hits
          FROM feat)
        SELECT doc_id,
               CASE WHEN length(smp) > 0
                         AND n_cjk >= greatest(1, length(smp) // 20)
                    THEN 'zh'
                    WHEN len(toks) = 0 OR length(t) = 0 THEN 'und'
                    WHEN best_hits < 2 THEN 'und'
                    WHEN h_en = best_hits THEN 'en'
                    WHEN h_de = best_hits THEN 'de'
                    WHEN h_fr = best_hits THEN 'fr'
                    ELSE 'es' END AS lang_pred,
               n_chars, n_tokens,
               ROUND(mean_len, 4) AS mean_token_len,
               ROUND(punct, 4)    AS punct_ratio,
               ROUND(stop, 4)     AS stopword_ratio,
               ROUND(upper_r, 4)  AS upper_ratio,
               CASE WHEN n_tokens = 0 THEN 0.0 ELSE ROUND(
                 (CASE WHEN mean_len >= 3 AND mean_len <= 12
                       THEN 1.0 ELSE 0.5 END)
                 * (CASE WHEN n_tokens < 5 THEN 0.3 ELSE 1.0 END)
                 * (CASE WHEN punct > 0.3 THEN 0.5 ELSE 1.0 END)
                 * (CASE WHEN upper_r > 0.3 THEN 0.7 ELSE 1.0 END)
                 * least(1.0, 0.4 + stop * 3), 4) END AS quality,
               n_subtokens
        FROM ratio
    """
    return {
        "documents_textstats_sql": textstats_sql,
        "transcripts_dates": dates_sql,
        "transcripts_conv_rollup_fields": conv_rollup_fields_sql,
        "export_rows": export_sql,
        "unapproved_vendors": unapproved_sql,
        "media_decode": media_sql,
        "media_resize_plan": media_resize_sql,
        "media_audio_segments": media_audio_sql,
        "media_frame_sample": media_frames_sql,
        "transcripts_dedup_exact": f"""
            SELECT conv_id, turn_idx, ANY_VALUE(role) AS role, text,
                   ANY_VALUE(tool) AS tool, MIN(ts) AS ts
            FROM {transcripts}
            GROUP BY conv_id, turn_idx, text
        """,
        # duplicates in the corpus are exact full-row copies, so the
        # streaming (any-winner) dedup output equals keep-first
        "transcripts_dedup_streaming": f"""
            SELECT conv_id, turn_idx, ANY_VALUE(role) AS role, text,
                   ANY_VALUE(tool) AS tool, MIN(ts) AS ts
            FROM {transcripts}
            GROUP BY conv_id, turn_idx, text
        """,
        "transcripts_normalize": f"""
            SELECT conv_id, turn_idx, {_NORM_EXPR} AS norm_text
            FROM {transcripts}
        """,
        "transcripts_invoice_numbers": f"""
            WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                       FROM {transcripts})
            SELECT conv_id, turn_idx,
              COALESCE(
                NULLIF(regexp_extract(t,
                  '(?i)invoice\\s*number?[:\\s]*([A-Za-z0-9-]{{5,}})', 1), ''),
                NULLIF(regexp_extract(t,
                  '(?i)invoice\\s*#[:\\s]*([A-Za-z0-9-]{{5,}})', 1), ''),
                NULLIF(regexp_extract(t,
                  '(?i)inv[:\\s]*([A-Za-z0-9-]{{5,}})', 1), '')
              ) AS invoice_number
            FROM n
        """,
        "transcripts_totals": f"""
            WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                       FROM {transcripts})
            SELECT conv_id, turn_idx,
              {sub_cents} AS grand_total_cents,
              {tax_cents} AS taxes_cents,
              {tot_cents} AS final_total_cents
            FROM n
        """,
        "transcripts_vendors": f"""
            WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                       FROM {transcripts}),
            l AS (SELECT conv_id, turn_idx,
                    list_filter(string_split(t, chr(10)),
                      x -> trim(x) != '' AND NOT contains(x, ' | ')
                           AND NOT regexp_matches(trim(x),
                                 '^[^:|]{{1,60}}?\\s*:\\s*(.+)$')) AS ls
                  FROM n)
            SELECT conv_id, turn_idx,
              trim(COALESCE(ls[1], '')) AS vendor_name,
              trim(COALESCE(ls[2], '')) AS vendor_street,
              CASE WHEN len(ls) >= 3 THEN COALESCE(trim(regexp_extract(
                ls[3], '([A-Za-z\\s]+),\\s*([A-Z]{{2}})', 1)), '')
                ELSE '' END AS vendor_city,
              CASE WHEN len(ls) >= 3 THEN COALESCE(regexp_extract(
                ls[3], '([A-Za-z\\s]+),\\s*([A-Z]{{2}})', 2), '')
                ELSE '' END AS vendor_state,
              CASE WHEN len(ls) >= 3 THEN COALESCE(regexp_extract(
                ls[3], '\\b\\d{{5}}(?:-\\d{{4}})?\\b', 0), '')
                ELSE '' END AS vendor_postal
            FROM l
        """,
        "transcripts_raw_rollup": f"""
            SELECT conv_id,
                   COUNT(*)                              AS n_turns,
                   MIN(ts)                               AS first_ts,
                   MAX(ts)                               AS last_ts,
                   CAST(SUM(length(text)) AS BIGINT)     AS total_chars
            FROM {transcripts} GROUP BY conv_id
        """,
        "transcripts_assemble_raw": f"""
            SELECT conv_id, COUNT(*) AS n_turns,
                   string_agg(text, chr(10) || chr(10)
                              ORDER BY turn_idx, ts, text) AS doc_text
            FROM {transcripts} GROUP BY conv_id
        """,
        "transcripts_stratified_sample": f"""
            SELECT conv_id, turn_idx, role FROM {transcripts}
            WHERE substr(md5(conv_id || chr(31) || turn_idx::VARCHAR
                             || chr(31) || '42'), 1, 8) <= '4ccccccc'
        """,
        "events_sample": """
            SELECT event_id, user_id FROM events
            WHERE substr(md5(event_id::VARCHAR || chr(31) || '42'), 1, 8)
                  <= '19999999'
        """,
        "lineitem_quantiles": """
            SELECT col, q25, q50, q75 FROM (
              SELECT 'l_quantity' AS col,
                     quantile_disc(l_quantity, 0.25) AS q25,
                     quantile_disc(l_quantity, 0.5)  AS q50,
                     quantile_disc(l_quantity, 0.75) AS q75 FROM lineitem
              UNION ALL
              SELECT 'l_discount',
                     quantile_disc(l_discount, 0.25),
                     quantile_disc(l_discount, 0.5),
                     quantile_disc(l_discount, 0.75) FROM lineitem
              UNION ALL
              SELECT 'l_tax',
                     quantile_disc(l_tax, 0.25),
                     quantile_disc(l_tax, 0.5),
                     quantile_disc(l_tax, 0.75) FROM lineitem) t
        """,
        "events_running_total": """
            SELECT event_id, user_id, ts,
                   ROUND(SUM(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING), 2) AS running_value
            FROM events
        """,
        "lineitem_rollup_levels": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)    AS sum_qty,
                   CAST(COUNT(*) AS BIGINT)     AS n_items
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "lineitem_cube_levels": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)    AS sum_qty,
                   CAST(COUNT(*) AS BIGINT)     AS n_items
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "customers_with_urgent_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN
                  (SELECT o_custkey FROM orders
                   WHERE o_orderpriority = '1-URGENT')
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
                  (SELECT o_custkey FROM orders
                   WHERE o_orderpriority = '1-URGENT')
        """,
        "events_pivot_types": """
            SELECT user_id,
                   COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                       AS n_click,
                   COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                       AS n_error,
                   COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                       AS n_purchase,
                   COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                       AS n_signup,
                   COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                       AS n_view
            FROM events GROUP BY user_id
        """,
        "events_distinct_users_per_type": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_ntile": """
            SELECT event_id, event_type, value,
                   CAST(NTILE(4) OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS BIGINT) AS quartile
            FROM events
        """,
        "events_top_values": """
            SELECT event_id, user_id, value FROM events
            ORDER BY value DESC, event_id ASC LIMIT 100
        """,
        "events_props_json": """
            SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY k
        """,
        "transcripts_scrub": f"""
            SELECT conv_id, turn_idx, {_scrub_expr()} AS scrubbed
            FROM {transcripts}
        """,
        "events_dense_rank": """
            SELECT event_id, event_type, value,
                   CAST(DENSE_RANK() OVER (PARTITION BY event_type
                        ORDER BY value DESC) AS BIGINT) AS rnk
            FROM events
        """,
        "customer_orders_left_join": """
            SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        """,
        "documents_chunk_windows": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            s AS (SELECT doc_id, w,
                         unnest(generate_series(1, greatest(len(w), 1), 24))
                             AS start
                  FROM t)
            SELECT doc_id,
                   CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
                   CAST(least(32, len(w) - start + 1) AS BIGINT) AS n_tokens,
                   array_to_string(w[start:start+31], ' ') AS chunk
            FROM s
        """,
        "documents_term_df": """
            WITH n AS (SELECT COUNT(*) AS nd FROM documents),
            toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                     FROM documents),
            agg AS (SELECT term,
                           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                           CAST(COUNT(*) AS BIGINT) AS tf
                    FROM toks GROUP BY term),
            r AS (SELECT term, df, tf,
                         ROUND(ln(nd * 1.0 / df), 6) AS idf,
                         CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term)
                              AS BIGINT) AS term_id
                  FROM agg, n)
            SELECT * FROM r WHERE term_id <= 100
        """,
        "documents_top_bigrams": """
            WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
            bg AS (SELECT unnest(list_transform(
                       list_zip(w[:len(w)-1], w[2:len(w)]),
                       z -> z[1] || ' ' || z[2])) AS bigram
                   FROM t WHERE len(w) > 1)
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
            FROM bg GROUP BY bigram
            ORDER BY n DESC, bigram ASC LIMIT 50
        """,
        "documents_pack_bins": """
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(SUM(len(string_split(text, ' ')))
                            OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) // 4096
                        AS BIGINT) AS bin_idx
            FROM documents
        """,
        "documents_posting_lists": """
            WITH p AS (SELECT DISTINCT doc_id, term
                       FROM (SELECT doc_id,
                                    unnest(string_split(text, ' ')) AS term
                             FROM documents))
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM p GROUP BY term
        """,
        "events_value_histogram": """
            SELECT CAST(CAST(round(value * 100) AS BIGINT) // 1000
                        AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY bin
        """,
        "events_funnel": """
            WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            t2 AS (SELECT e.user_id, MIN(e.ts) AS t2
                   FROM events e JOIN t1 ON e.user_id = t1.user_id
                   WHERE e.event_type = 'click' AND e.ts > t1.t1
                   GROUP BY e.user_id),
            t3 AS (SELECT e.user_id, MIN(e.ts) AS t3
                   FROM events e JOIN t2 ON e.user_id = t2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > t2.t2
                   GROUP BY e.user_id)
            SELECT 'view' AS stage,
                   CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_users
            UNION ALL SELECT 'view_click',
                   CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
            UNION ALL SELECT 'view_click_purchase',
                   CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
        """,
        "events_retention": """
            WITH p AS (SELECT DISTINCT user_id,
                              date_trunc('day', ts) AS day FROM events),
            c AS (SELECT user_id, MIN(day) AS cohort_day
                  FROM p GROUP BY user_id)
            SELECT c.cohort_day,
                   CAST(date_diff('day', c.cohort_day, p.day) AS BIGINT)
                       AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM p JOIN c ON p.user_id = c.user_id
            GROUP BY 1, 2
        """,
        "orders_shipping_priority": """
            WITH r AS (
              SELECT o.o_orderkey, o.o_orderdate,
                     SUM(CAST(round(l.l_extendedprice
                                    * (1 - l.l_discount) * 10000)
                         AS BIGINT)) AS r
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND year(o.o_orderdate) < 1997
                AND year(l.l_shipdate) >= 1997
              GROUP BY 1, 2)
            SELECT o_orderkey, o_orderdate,
                   ROUND(CAST(r AS DOUBLE) / 10000.0, 2) AS revenue
            FROM r
            ORDER BY r DESC, o_orderdate ASC, o_orderkey ASC
            LIMIT 10
        """,
        "events_except_days": """
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT DISTINCT user_id, date_trunc('day', ts)
            FROM events WHERE event_type = 'error'
        """,
        "lineitem_corr": """
            WITH m AS (
              SELECT l_returnflag,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(y * y) AS BIGINT) AS syy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy
              FROM (SELECT l_returnflag,
                           CAST(round(l_quantity) AS BIGINT) AS x,
                           CAST(round(l_extendedprice) AS BIGINT) AS y
                    FROM lineitem)
              GROUP BY l_returnflag)
            SELECT l_returnflag, n AS n_items,
                   ROUND((CAST(n AS DOUBLE) * sxy
                          - CAST(sx AS DOUBLE) * sy) /
                         (sqrt(CAST(n AS DOUBLE) * sxx
                               - CAST(sx AS DOUBLE) * sx) *
                          sqrt(CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy)), 6)
                       AS corr_qty_price
            FROM m
        """,
        "events_intersect_days": """
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT DISTINCT user_id, date_trunc('day', ts)
            FROM events WHERE event_type = 'purchase'
        """,
        "events_unpivot_counts": """
            WITH p AS (
              SELECT user_id,
                     COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                         AS n_click,
                     COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                         AS n_error,
                     COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                         AS n_purchase,
                     COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                         AS n_signup,
                     COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                         AS n_view
              FROM events GROUP BY user_id)
            SELECT user_id, 'click' AS event_type,
                   CAST(n_click AS BIGINT) AS n FROM p
            UNION ALL SELECT user_id, 'error', CAST(n_error AS BIGINT)
            FROM p
            UNION ALL SELECT user_id, 'purchase',
                   CAST(n_purchase AS BIGINT) FROM p
            UNION ALL SELECT user_id, 'signup', CAST(n_signup AS BIGINT)
            FROM p
            UNION ALL SELECT user_id, 'view', CAST(n_view AS BIGINT)
            FROM p
        """,
        "events_user_entropy": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            u AS (SELECT user_id,
                         CAST(SUM(n) AS BIGINT) AS n,
                         CAST(SUM(CAST(round(CAST(n AS DOUBLE)
                                             * ln(CAST(n AS DOUBLE))
                                             * 1000000) AS BIGINT))
                              AS BIGINT) AS sq
                  FROM c GROUP BY 1)
            SELECT user_id, n AS n_events,
                   ROUND(ln(CAST(n AS DOUBLE))
                         - (CAST(sq AS DOUBLE) / 1000000.0)
                           / CAST(n AS DOUBLE), 6) AS entropy
            FROM u
        """,
        "customers_fuzzy_name_pairs": """
            SELECT a.c_name AS name_a, b.c_name AS name_b
            FROM (SELECT DISTINCT c_name FROM customer) a,
                 (SELECT DISTINCT c_name FROM customer) b
            WHERE a.c_name < b.c_name
              AND levenshtein(a.c_name, b.c_name) = 1
        """,
        "events_daily_gapfill": """
            WITH c AS (SELECT event_type, date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM c),
            g AS (SELECT t.event_type, d.day
                  FROM (SELECT DISTINCT event_type FROM events) t
                  CROSS JOIN (SELECT unnest(generate_series(
                                  b.mn, b.mx, INTERVAL 1 DAY)) AS day
                              FROM b) d)
            SELECT g.event_type, g.day,
                   COALESCE(c.n, 0) AS n_events
            FROM g LEFT JOIN c USING (event_type, day)
        """,
        "documents_winnow_fingerprints": """
            WITH t AS (SELECT doc_id, text, length(text) AS n
                       FROM documents),
            p AS (SELECT doc_id, text,
                         unnest(generate_series(1, n - 4)) AS i
                  FROM t WHERE n >= 5),
            h AS (SELECT doc_id, i,
                         (ascii(substr(text, i, 1)) * 4362470401
                          + ascii(substr(text, i + 1, 1)) * 16974593
                          + ascii(substr(text, i + 2, 1)) * 66049
                          + ascii(substr(text, i + 3, 1)) * 257
                          + ascii(substr(text, i + 4, 1)))
                             % 1000000007 AS hv
                  FROM p),
            wmin AS (SELECT doc_id,
                            MIN(hv) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW
                                AND 3 FOLLOWING) AS fp,
                            COUNT(*) OVER (PARTITION BY doc_id ORDER BY i
                                ROWS BETWEEN CURRENT ROW
                                AND 3 FOLLOWING) AS cnt
                     FROM h)
            SELECT DISTINCT doc_id, CAST(fp AS BIGINT) AS fp
            FROM wmin WHERE cnt = 4
        """,
        "documents_regex_tokens": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '''?\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+'))
                       AS BIGINT) AS n_tokens
            FROM documents
        """,
        "events_percent_rank": """
            SELECT event_id, event_type, value,
                   ROUND(PERCENT_RANK() OVER (PARTITION BY event_type
                                              ORDER BY value), 6) AS pr
            FROM events
        """,
        "events_tumbling_daily": """
            -- floor-to-window via positive mod: DuckDB's // and %
            -- truncate toward zero, but event-time windows floor
            -- (a pre-1970 ts belongs to the window BELOW zero)
            SELECT CAST(epoch_us(ts)
                        - ((epoch_us(ts) % 86400000000) + 86400000000)
                          % 86400000000 AS BIGINT) AS win_start,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "events_hopping_2day": """
            -- each event belongs to the two 2-day windows (1-day
            -- slide) covering it: starts s_hi and s_hi - 1 day, where
            -- s_hi floors ts to the slide via positive mod
            WITH e AS (SELECT event_type, epoch_us(ts) AS t
                       FROM events),
            w AS (SELECT event_type,
                         unnest(generate_series(
                             t - ((t % 86400000000) + 86400000000)
                               % 86400000000 - 86400000000,
                             t - ((t % 86400000000) + 86400000000)
                               % 86400000000,
                             86400000000)) AS win_start
                  FROM e)
            SELECT CAST(win_start AS BIGINT) AS win_start, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM w GROUP BY 1, 2
        """,
        "events_value_mode": """
            WITH c AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS cents,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY event_type
                      ORDER BY n DESC, cents ASC) AS rn
                  FROM c)
            SELECT event_type,
                   ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS mode_value,
                   n AS n_occurrences
            FROM r WHERE rn = 1
        """,
        "region_types_grid": """
            SELECT r.r_regionkey, r.r_name, t.event_type
            FROM region r
            CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        """,
        "events_sessions_streaming": """
            WITH o AS (SELECT user_id, epoch_us(ts) AS t FROM events),
            d AS (SELECT user_id, t,
                         CASE WHEN t - LAG(t) OVER (
                                  PARTITION BY user_id ORDER BY t)
                              > 1800000000
                              THEN 1 ELSE 0 END AS brk
                  FROM o),
            g AS (SELECT user_id, t,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS sid
                  FROM d)
            SELECT user_id,
                   CAST(MIN(t) AS BIGINT) AS session_start,
                   CAST(MAX(t) AS BIGINT) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM g GROUP BY user_id, sid
        """,
        "documents_training_prep": """
            WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
                       FROM documents),
            bg AS (SELECT doc_id,
                          unnest(list_transform(
                              list_zip(w[:len(w)-1], w[2:len(w)]),
                              z -> z[1] || ' ' || z[2])) AS b
                   FROM t WHERE len(w) > 1),
            c AS (SELECT doc_id, b, COUNT(*) AS nn
                  FROM bg GROUP BY doc_id, b),
            mx AS (SELECT doc_id, MAX(nn) AS mx FROM c GROUP BY doc_id),
            kept AS (
              SELECT t.doc_id, t.text
              FROM t LEFT JOIN mx ON t.doc_id = mx.doc_id
              WHERE len(w) >= 5
                AND len(list_filter(w, x -> x IN ('the', 'a')))
                    / GREATEST(len(w), 1) >= 0.02
                AND len(list_distinct(w)) / len(w) >= 0.45
                AND (CASE WHEN len(w) > 1
                     THEN COALESCE(mx.mx, 0) / (len(w) - 1)
                     ELSE 0.0 END) <= 0.08),
            ded AS (SELECT MIN(doc_id) AS doc_id, text
                    FROM kept GROUP BY text),
            s AS (SELECT doc_id, string_split(text, ' ') AS w FROM ded),
            u AS (SELECT doc_id, w,
                         unnest(generate_series(1, greatest(len(w), 1), 24))
                             AS start
                  FROM s)
            SELECT doc_id,
                   CAST((start - 1) // 24 AS BIGINT) AS chunk_idx,
                   CAST(least(32, len(w) - start + 1) AS BIGINT) AS n_tokens,
                   array_to_string(w[start:start+31], ' ') AS chunk
            FROM u
        """,
        "events_full_outer_days": """
            WITH p AS (SELECT user_id, date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n_purchases
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY 1, 2),
            v AS (SELECT user_id AS user_id_r,
                         date_trunc('day', ts) AS day_r,
                         CAST(COUNT(*) AS BIGINT) AS n_errors
                  FROM events WHERE event_type = 'error'
                  GROUP BY 1, 2)
            SELECT COALESCE(p.user_id, v.user_id_r) AS user_id,
                   COALESCE(p.day, v.day_r) AS day,
                   p.n_purchases, v.n_errors
            FROM p FULL JOIN v
              ON p.user_id = v.user_id_r AND p.day = v.day_r
        """,
        "documents_source_mixture": """
            WITH a AS (SELECT source,
                              CAST(COUNT(*) AS BIGINT) AS n_docs,
                              CAST(SUM(len(string_split(text, ' ')))
                                   AS BIGINT) AS n_tokens
                       FROM documents GROUP BY source),
            t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot,
                         COUNT(*) AS ns FROM a)
            SELECT source, n_docs, n_tokens,
                   n_tokens / tot AS token_share,
                   (1.0 / ns) / (n_tokens / tot) AS weight_uniform
            FROM a, t
        """,
        "documents_balance_classes": """
            SELECT doc_id, lang, n_chars FROM (
              SELECT doc_id, lang, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY lang
                        ORDER BY md5(doc_id::VARCHAR || chr(31) || '42'),
                                 doc_id::VARCHAR) AS rn
              FROM documents) t
            WHERE rn <= 30
        """,
        "embeddings_label_centroids": """
            WITH u AS (SELECT label, unnest(embedding) AS v,
                              unnest(generate_series(1, 64)) AS dim
                       FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   ROUND(SUM(CAST(round(CAST(v AS DOUBLE) * 1073741824)
                                  AS BIGINT))
                         / COUNT(*) / 1073741824.0, 6) AS centroid
            FROM u GROUP BY label, dim
        """,
        "documents_repetition": """
            WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
            bg AS (SELECT doc_id,
                          unnest(list_transform(
                              list_zip(w[:len(w)-1], w[2:len(w)]),
                              z -> z[1] || ' ' || z[2])) AS b
                   FROM t WHERE len(w) > 1),
            c AS (SELECT doc_id, b, COUNT(*) AS nn
                  FROM bg GROUP BY doc_id, b),
            m AS (SELECT doc_id, MAX(nn) AS mx FROM c GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
                   len(list_distinct(w)) / len(w) AS distinct_ratio,
                   CASE WHEN len(w) > 1
                        THEN COALESCE(m.mx, 0) / (len(w) - 1)
                        ELSE 0.0 END AS top_bigram_frac,
                   CAST(CASE WHEN len(list_distinct(w)) / len(w) >= 0.5
                             AND (CASE WHEN len(w) > 1
                                  THEN COALESCE(m.mx, 0) / (len(w) - 1)
                                  ELSE 0.0 END) <= 0.05
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM t LEFT JOIN m ON t.doc_id = m.doc_id
        """,
        "events_value_variance": """
            WITH m AS (
              SELECT event_type,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(c) AS BIGINT) AS s,
                     CAST(SUM(c * c) AS BIGINT) AS s2
              FROM (SELECT event_type,
                           CAST(round(value * 100) AS BIGINT) AS c
                    FROM events)
              GROUP BY event_type)
            SELECT event_type, n AS n_events,
                   ROUND((n * s2 - s * s) * 1.0 / (n * n) / 10000, 6)
                       AS var_value,
                   ROUND(sqrt((n * s2 - s * s) * 1.0 / (n * n) / 10000), 6)
                       AS std_value
            FROM m
        """,
        "events_hot_users": """
            WITH t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM events)
            SELECT user_id FROM events, t
            GROUP BY user_id, t.total
            HAVING CAST(COUNT(*) AS DOUBLE) >= 0.008 * t.total
        """,
        "events_moving_avg": """
            SELECT event_id, user_id, ts,
                   ROUND(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
                         * 1.0 / COUNT(*) OVER w / 100, 4) AS moving_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "events_lag_delta": """
            SELECT event_id, user_id, ts,
                   LAG(ts) OVER w AS prev_ts,
                   date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_type_transitions": """
            WITH w AS (SELECT user_id, event_type,
                              LAG(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_type
                       FROM events),
            c AS (SELECT prev_type, event_type AS next_type,
                         CAST(COUNT(*) AS BIGINT) AS n_trans
                  FROM w WHERE prev_type IS NOT NULL
                  GROUP BY 1, 2)
            SELECT prev_type, next_type, n_trans,
                   CAST(n_trans AS DOUBLE) /
                   CAST(SUM(n_trans) OVER (PARTITION BY prev_type)
                        AS DOUBLE) AS p
            FROM c
        """,
        "events_value_trend": """
            WITH t AS (SELECT event_type,
                              (epoch_us(ts) // 86400000000) - 19723 AS x,
                              CAST(round(value * 100) AS BIGINT) AS y
                       FROM events WHERE value IS NOT NULL),
            s AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x * x) AS BIGINT) AS sxx,
                         CAST(SUM(x * y) AS BIGINT) AS sxy
                  FROM t GROUP BY 1),
            f AS (SELECT event_type, n, sx, sy,
                         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             AS slope
                  FROM s)
            SELECT event_type, n AS n_events,
                   slope AS slope_cents_per_day,
                   (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept_cents
            FROM f
        """,
        "lineitem_grouping_sets": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   CAST(COUNT(*) AS BIGINT)  AS n_items
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """,
        "documents_decontaminate": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            b AS (SELECT doc_id AS bench_id, sh FROM s
                  WHERE substr(md5(doc_id::VARCHAR || chr(31) || '7'),
                               1, 8) <= '0ccccccc'),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id, b.bench_id,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN b
                        ON a.sh = b.sh AND a.doc_id <> b.bench_id
                      GROUP BY a.doc_id, b.bench_id)
            SELECT inter.doc_id, bench_id,
                   ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM inter JOIN sizes sa ON inter.doc_id = sa.doc_id
                       JOIN sizes sb ON inter.bench_id = sb.doc_id
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
        """,
        "documents_lsh_join_exact": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            b AS (SELECT doc_id + 10000000 AS bench_id, sh FROM s
                  WHERE substr(md5(doc_id::VARCHAR || chr(31) || '11'),
                               1, 8) <= '3fffffff'),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id, b.bench_id,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN b ON a.sh = b.sh
                      GROUP BY a.doc_id, b.bench_id)
            SELECT inter.doc_id, bench_id,
                   ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM inter JOIN sizes sa ON inter.doc_id = sa.doc_id
                       JOIN sizes sb
                         ON inter.bench_id - 10000000 = sb.doc_id
            WHERE c = sa.n AND c = sb.n
        """,
        "documents_jaccard_pairs": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN s b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id)
            SELECT id_a, id_b,
                   ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                       JOIN sizes sb ON inter.id_b = sb.doc_id
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
        """,
        "documents_neardup_components": """
            WITH RECURSIVE
            d AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN s b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id),
            p AS (SELECT id_a, id_b
                  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                             JOIN sizes sb ON inter.id_b = sb.doc_id
                  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            r AS (SELECT doc_id AS id, doc_id AS reach FROM documents
                  UNION
                  SELECT r.id, e.b FROM r JOIN e ON r.reach = e.a)
            SELECT id AS doc_id, CAST(MIN(reach) AS BIGINT) AS rep
            FROM r GROUP BY id
        """,
        "documents_train_split": """
            SELECT doc_id, source,
                   CASE WHEN substr(md5(doc_id::VARCHAR || chr(31)
                                        || '42'), 1, 8) <= 'cccccccc'
                        THEN 'train'
                        WHEN substr(md5(doc_id::VARCHAR || chr(31)
                                        || '42'), 1, 8) <= 'e6666665'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "documents_unigram_logprob": """
            WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM t GROUP BY tok),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
            d AS (SELECT t.doc_id,
                         CAST(SUM(CAST(round(ln(CAST(tf.tf AS DOUBLE))
                                             * 1000000) AS BIGINT))
                              AS BIGINT) AS sq,
                         CAST(COUNT(*) AS BIGINT) AS n_tokens
                  FROM t JOIN tf USING (tok) GROUP BY t.doc_id)
            SELECT doc_id, n_tokens,
                   ROUND((CAST(sq AS DOUBLE) / 1000000.0)
                         / CAST(n_tokens AS DOUBLE)
                         - ln(CAST((SELECT n_total FROM n) AS DOUBLE)),
                         6) AS avg_logprob
            FROM d
        """,
        "documents_source_kl": """
            WITH t AS (SELECT source, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
                   FROM t GROUP BY 1, 2),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_t
                   FROM t GROUP BY tok),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
            g AS (SELECT st.source,
                         CAST(SUM(st.c_st * CAST(round(
                             ln(CAST(st.c_st AS DOUBLE)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s1,
                         CAST(SUM(st.c_st * CAST(round(
                             ln(CAST(tf.c_t AS DOUBLE)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s2,
                         CAST(SUM(st.c_st) AS BIGINT) AS n_s
                  FROM st JOIN tf USING (tok) GROUP BY st.source)
            SELECT source, n_s AS n_tokens,
                   ROUND((CAST(s1 AS DOUBLE) - CAST(s2 AS DOUBLE))
                         / 1000000.0 / CAST(n_s AS DOUBLE)
                         - ln(CAST(n_s AS DOUBLE))
                         + ln(CAST((SELECT n_total FROM n) AS DOUBLE)),
                         6) AS kl_vs_corpus
            FROM g
        """,
        "documents_cross_source_dups": """
            WITH d AS (SELECT DISTINCT text, source FROM documents)
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM d a JOIN d b
              ON a.text = b.text AND a.source < b.source
            GROUP BY 1, 2
        """,
        "events_weighted_sample": """
            WITH t AS (
              SELECT event_id, user_id, value,
                     CAST(round(value * 100) AS BIGINT) AS w,
                     (('0x' || substr(md5(event_id::VARCHAR || chr(31)
                                          || '42'), 1, 8))::UBIGINT)::HUGEINT
                         AS u
              FROM events),
            s AS (SELECT CAST(SUM(w) AS HUGEINT) AS S,
                         CAST(COUNT(*) AS HUGEINT) AS n FROM t)
            SELECT event_id, user_id, value FROM t, s
            WHERE u * S * 10 < w::HUGEINT * n * 4294967296::HUGEINT
        """,
        "events_reservoir_per_user": """
            SELECT event_id, user_id, value FROM (
              SELECT event_id, user_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY md5(event_id::VARCHAR || chr(31) || '42'),
                                 event_id::VARCHAR) AS rn
              FROM events) t
            WHERE rn <= 3
        """,
        "events_range_join": """
            SELECT p.event_id, p.user_id, p.ts,
                   CAST(COUNT(v.event_id) AS BIGINT) AS n_views_1h
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id
                 AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
            GROUP BY p.event_id, p.user_id, p.ts
        """,
        "events_conv_rollup": """
            SELECT user_id,
                   COUNT(*)            AS n_events,
                   ROUND(SUM(value),2) AS sum_value,
                   MIN(ts)             AS first_ts,
                   MAX(ts)             AS last_ts
            FROM events GROUP BY user_id
        """,
        "events_filter_purchases": """
            SELECT event_id, user_id, ts, value
            FROM events WHERE event_type = 'purchase' AND value > 50.0
        """,
        "events_first_last": """
            -- tie-break pinned: order by the same packed
            -- (zero-padded ts, event_type) string the Ray side mins/maxes,
            -- so duplicate (user_id, ts) rows cannot diverge by scan order
            SELECT user_id,
                   arg_min(event_type, lpad(epoch_us(ts)::VARCHAR, 19, '0')
                           || chr(31) || event_type) AS first_event,
                   arg_max(event_type, lpad(epoch_us(ts)::VARCHAR, 19, '0')
                           || chr(31) || event_type) AS last_event,
                   COUNT(*)                          AS n_events
            FROM events GROUP BY user_id
        """,
        "documents_dedup_exact": """
            SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "documents_token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_filter(string_split(text, ' '),
                                   x -> x IN ('the', 'a'))) AS n_stopwords,
                   len(list_filter(string_split(text, ' '),
                                   x -> x IN ('the', 'a')))
                       / GREATEST(len(string_split(text, ' ')), 1)
                       AS stopword_ratio
            FROM documents
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2)      AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                                                  AS sum_disc_price,
                   COUNT(*)                       AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT o_custkey,
                   ROUND(SUM(o_totalprice), 2) AS total_spent,
                   ANY_VALUE(c_name)           AS c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY o_custkey
            ORDER BY total_spent DESC, o_custkey ASC
            LIMIT 10
        """,
        "events_daily": """
            SELECT date_trunc('day', ts) AS day,
                   COUNT(*)              AS n_events,
                   ROUND(SUM(value), 2)  AS sum_value
            FROM events GROUP BY 1
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events
        """,
        "nation_region_join": """
            SELECT n_nationkey, n_name, r_name
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "embeddings_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.4
        """,
        "embeddings_semantic_dedup": """
            WITH RECURSIVE
            p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                  FROM embeddings a JOIN embeddings b
                    ON a.vec_id < b.vec_id
                  WHERE list_cosine_similarity(
                            a.embedding::DOUBLE[],
                            b.embedding::DOUBLE[]) >= 0.4),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            r AS (SELECT vec_id AS id, vec_id AS reach FROM embeddings
                  UNION
                  SELECT r.id, e.b FROM r JOIN e ON r.reach = e.a)
            SELECT id AS vec_id, CAST(MIN(reach) AS BIGINT) AS rep,
                   (MIN(reach) = id) AS keep
            FROM r GROUP BY id
        """,
        "events_sessionize": """
            WITH gaps AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                               OR LAG(ts) OVER w IS NULL
                          THEN 1 ELSE 0 END AS new_sess
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              SELECT user_id, ts, value,
                     CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              FROM gaps
            )
            SELECT user_id, session_id,
                   COUNT(*)             AS n_events,
                   MIN(ts)              AS session_start,
                   MAX(ts)              AS session_end,
                   ROUND(SUM(value), 2) AS sum_value
            FROM sess GROUP BY user_id, session_id
        """,
        "orders_lineitem_join": """
            SELECT o_orderpriority,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   COUNT(*) AS n_items
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority
        """,
        "documents_quality_filter": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
            WHERE len(string_split(text, ' ')) >= 5
              AND len(list_filter(string_split(text, ' '),
                                  x -> x IN ('the', 'a')))
                  / GREATEST(len(string_split(text, ' ')), 1) >= 0.02
        """,
        "events_value_stats": """
            SELECT event_type,
                   COUNT(*)                       AS n_events,
                   MIN(value)                     AS min_value,
                   MAX(value)                     AS max_value,
                   ROUND(SUM(value) / COUNT(*), 4) AS mean_value
            FROM events GROUP BY event_type
        """,
        "events_asof_join": """
            SELECT p.event_id, p.user_id, p.ts,
                   v.event_id AS prior_view_event_id,
                   v.ts       AS prior_view_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON p.user_id = v.user_id AND p.ts >= v.ts
        """,
        "events_top2_per_user": """
            SELECT event_id, user_id, value FROM (
              SELECT event_id, user_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY value DESC, event_id ASC) AS rn
              FROM events) t
            WHERE rn <= 2
        """,
        "events_union_distinct": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
            UNION
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        """,
        "embeddings_ann_topk": """
            SELECT query_id, vec_id, cosine, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]), 6)
                         AS cosine,
                     ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                                         c.embedding::DOUBLE[])
                                  DESC, c.vec_id ASC) AS rank
              FROM embeddings q CROSS JOIN embeddings c
              WHERE q.vec_id < 8) t
            WHERE rank <= 5
        """,
        "events_heavy_hitters": """
            WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
            c AS (SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
                         CAST(COUNT(*) AS BIGINT) AS n_occurrences
                  FROM events GROUP BY 1)
            SELECT bucket, n_occurrences FROM c, tot
            WHERE n_occurrences * 300 >= tot.n
        """,
        "events_grouped_quantiles": """
            SELECT event_type,
                   quantile_disc(value, 0.25) AS q25,
                   quantile_disc(value, 0.5)  AS q50,
                   quantile_disc(value, 0.9)  AS q90
            FROM events GROUP BY event_type
        """,
        "events_rolling_distinct": """
            WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                        FROM events),
            days AS (SELECT DISTINCT d FROM ud)
            SELECT days.d AS day,
                   CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS n_users_7d
            FROM days JOIN ud
              ON ud.d <= days.d AND ud.d >= days.d - INTERVAL 6 DAY
            GROUP BY 1
        """,
        "events_cooccurrence": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "documents_tfidf_pairs": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS term
                   FROM d, unnest(range(1, len(toks))) AS u(i)
                   WHERE len(toks) >= 2),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
                   FROM bg GROUP BY 1, 2),
            df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
            nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
            w AS (SELECT tf.doc_id, tf.term, tf.n,
                         CAST(round(ln(CAST(nd.n AS DOUBLE) / df.df)
                                    * 1000) AS BIGINT) AS qi
                  FROM tf JOIN df ON tf.term = df.term, nd
                  WHERE df.df * 20 <= nd.n AND df.df <= 2000)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(SUM(a.n * b.n * a.qi * a.qi) AS BIGINT) AS dot
            FROM w a JOIN w b
              ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING SUM(a.n * b.n * a.qi * a.qi) >= 50000000
        """,
        "transcripts_boilerplate": f"""
            WITH r AS (SELECT text, row_number() OVER () AS rid
                       FROM {transcripts}),
            l AS (SELECT rid, trim(unnest(string_split(text, chr(10))),
                                   ' ') AS line
                  FROM r),
            d AS (SELECT DISTINCT rid, line FROM l WHERE line <> ''),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r)
            SELECT line, CAST(COUNT(*) AS BIGINT) AS n_turns
            FROM d, tot GROUP BY line, tot.n
            HAVING CAST(COUNT(*) AS BIGINT) * 100 >= tot.n
        """,
        "events_quantiles_cont": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS q50,
                   quantile_cont(value, 0.9) AS q90
            FROM events GROUP BY event_type
        """,
        "events_value_outliers": """
            WITH med AS (SELECT event_type,
                                quantile_disc(value, 0.5) AS m
                         FROM events GROUP BY 1),
            dev AS (SELECT e.event_id, e.event_type, e.value,
                           abs(e.value - med.m) AS d
                    FROM events e JOIN med USING (event_type)),
            mad AS (SELECT event_type, quantile_disc(d, 0.5) AS md
                    FROM dev GROUP BY 1)
            SELECT dev.event_id, dev.event_type, dev.value
            FROM dev JOIN mad USING (event_type)
            WHERE dev.d > 3 * mad.md
        """,
        "documents_containment_pairs": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN s b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            j AS (SELECT inter.*, sa.n AS n_a, sb.n AS n_b
                  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                             JOIN sizes sb ON inter.id_b = sb.doc_id)
            SELECT id_a AS sub_id, id_b AS super_id, c AS n_shared
            FROM j WHERE c = n_a
            UNION ALL
            SELECT id_b, id_a, c FROM j WHERE c = n_b
        """,
        "events_value_zscore": """
            WITH m AS (SELECT event_type,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS s,
                              CAST(SUM(CAST(round(value * 100) AS BIGINT)
                                       * CAST(round(value * 100) AS BIGINT))
                                   AS BIGINT) AS s2
                       FROM events WHERE value IS NOT NULL GROUP BY 1),
            st AS (SELECT event_type, s / n / 100.0 AS mean,
                          sqrt((n * s2 - s * s) / n / n / 10000.0) AS std
                   FROM m)
            SELECT e.event_id, e.event_type,
                   (e.value - st.mean) / st.std AS z
            FROM events e JOIN st USING (event_type)
            WHERE e.value IS NOT NULL AND st.std > 0.0
        """,
        "documents_ngram_contamination": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 3),
                    i -> list_aggregate(toks[i:i+4], 'string_agg', ' '))))
                    AS sh
                  FROM d WHERE len(toks) >= 5),
            b AS (SELECT doc_id AS bench_id, sh FROM s
                  WHERE substr(md5(doc_id::VARCHAR || chr(31) || '7'),
                               1, 8) <= '0ccccccc')
            SELECT a.doc_id, CAST(COUNT(DISTINCT b.bench_id) AS BIGINT)
                       AS n_bench
            FROM s a JOIN b ON a.sh = b.sh AND a.doc_id <> b.bench_id
            GROUP BY a.doc_id
        """,
        "documents_ngram_contamination_scaled": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 3),
                    i -> list_aggregate(toks[i:i+4], 'string_agg', ' '))))
                    AS sh
                  FROM d WHERE len(toks) >= 5),
            keep AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(*) <= 2),
            b AS (SELECT doc_id AS bench_id, sh FROM s
                  WHERE substr(md5(doc_id::VARCHAR || chr(31) || '7'),
                               1, 8) <= '0ccccccc')
            SELECT a.doc_id, CAST(COUNT(DISTINCT b.bench_id) AS BIGINT)
                       AS n_bench
            FROM s a JOIN keep USING (sh)
                     JOIN b ON a.sh = b.sh AND a.doc_id <> b.bench_id
            GROUP BY a.doc_id
        """,
        "documents_dup_spans": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            p AS (SELECT doc_id, i - 1 AS pos,
                         list_aggregate(toks[i:i+9], 'string_agg', ' ')
                             AS sh
                  FROM d, UNNEST(range(1, len(toks) - 8)) AS t(i)
                  WHERE len(toks) >= 10),
            dup AS (SELECT sh FROM p GROUP BY sh HAVING COUNT(*) >= 2),
            hits AS (SELECT doc_id, pos FROM p JOIN dup USING (sh)),
            g AS (SELECT doc_id, pos,
                         CASE WHEN pos - LAG(pos) OVER w <= 10
                              THEN 0 ELSE 1 END AS brk
                  FROM hits
                  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
            isl AS (SELECT doc_id, pos,
                           SUM(brk) OVER (PARTITION BY doc_id
                                          ORDER BY pos
                                          ROWS UNBOUNDED PRECEDING)
                               AS grp
                    FROM g),
            sp AS (SELECT doc_id, grp, MIN(pos) AS s, MAX(pos) AS e
                   FROM isl GROUP BY doc_id, grp)
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(e - s + 10) AS BIGINT) AS dup_tokens
            FROM sp GROUP BY doc_id
        """,
        "documents_neardup_cluster_sizes": """
            WITH RECURSIVE
            d AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN s b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id),
            p AS (SELECT id_a, id_b
                  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                             JOIN sizes sb ON inter.id_b = sb.doc_id
                  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            r AS (SELECT doc_id AS id, doc_id AS reach FROM documents
                  UNION
                  SELECT r.id, e.b FROM r JOIN e ON r.reach = e.a),
            comp AS (SELECT id AS doc_id,
                            CAST(MIN(reach) AS BIGINT) AS rep
                     FROM r GROUP BY id),
            m AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS n_members
                  FROM comp GROUP BY rep)
            SELECT n_members AS cluster_size,
                   CAST(COUNT(*) AS BIGINT) AS n_clusters,
                   CAST(SUM(n_members) AS BIGINT) AS n_docs
            FROM m GROUP BY n_members
        """,
        "documents_dup_spans_removed": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            p AS (SELECT doc_id, i - 1 AS pos,
                         list_aggregate(toks[i:i+9], 'string_agg', ' ')
                             AS sh
                  FROM d, UNNEST(range(1, len(toks) - 8)) AS t(i)
                  WHERE len(toks) >= 10),
            dup AS (SELECT sh FROM p GROUP BY sh HAVING COUNT(*) >= 2),
            hits AS (SELECT doc_id, pos FROM p JOIN dup USING (sh)),
            cov AS (SELECT DISTINCT doc_id, pos + j AS cpos
                    FROM hits, UNNEST(range(0, 10)) AS u(j)),
            tokpos AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
                       FROM d, UNNEST(range(1, len(toks) + 1)) AS t(i)),
            kept AS (SELECT t.doc_id, t.pos, t.tok
                     FROM tokpos t LEFT JOIN cov c
                       ON t.doc_id = c.doc_id AND t.pos = c.cpos
                     WHERE c.doc_id IS NULL),
            agg AS (SELECT doc_id,
                           string_agg(tok, ' ' ORDER BY pos)
                               AS clean_text,
                           CAST(COUNT(*) AS BIGINT) AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(a.clean_text, '') AS clean_text,
                   CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(len(d.toks) - COALESCE(a.n_kept, 0) AS BIGINT)
                       AS n_removed
            FROM d LEFT JOIN agg a USING (doc_id)
        """,
        "documents_neardup_keep_best": """
            WITH RECURSIVE
            d AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN s b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id),
            p AS (SELECT id_a, id_b
                  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                             JOIN sizes sb ON inter.id_b = sb.doc_id
                  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
            e AS (SELECT id_a AS a, id_b AS b FROM p
                  UNION ALL SELECT id_b, id_a FROM p),
            r AS (SELECT doc_id AS id, doc_id AS reach FROM documents
                  UNION
                  SELECT r.id, e.b FROM r JOIN e ON r.reach = e.a),
            comp AS (SELECT id AS doc_id,
                            CAST(MIN(reach) AS BIGINT) AS rep
                     FROM r GROUP BY id),
            w AS (SELECT c2.doc_id, c2.rep, dd.n_chars,
                         ROW_NUMBER() OVER (
                             PARTITION BY c2.rep
                             ORDER BY dd.n_chars DESC, c2.doc_id)
                             AS rn
                  FROM comp c2 JOIN documents dd USING (doc_id))
            SELECT doc_id, rep, n_chars, (rn = 1) AS keep FROM w
        """,
        "documents_char_entropy": """
            WITH c AS (SELECT doc_id,
                              unnest(string_split(text, '')) AS ch
                       FROM documents),
            cc AS (SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS k
                   FROM c GROUP BY 1, 2),
            d AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n,
                         CAST(SUM(k * CAST(round(
                             ln(CAST(k AS DOUBLE)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s
                  FROM cc GROUP BY doc_id)
            SELECT doc_id, n AS n_chars,
                   ROUND(ln(CAST(n AS DOUBLE))
                         - (CAST(s AS DOUBLE) / 1000000.0)
                           / CAST(n AS DOUBLE), 6) AS char_entropy
            FROM d
        """,
        "documents_dsir_weights": """
            WITH tok AS (SELECT doc_id, source,
                                unnest(string_split(text, ' ')) AS tok
                         FROM documents),
            b AS (SELECT doc_id, source,
                         CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
                             % 1024 AS bucket
                  FROM tok),
            cnt AS (SELECT bucket,
                           CAST(SUM(CASE WHEN source = 'src0'
                                         THEN 1 ELSE 0 END)
                                AS BIGINT) AS tn,
                           CAST(SUM(CASE WHEN source = 'src0'
                                         THEN 0 ELSE 1 END)
                                AS BIGINT) AS rn
                    FROM b GROUP BY bucket),
            tot AS (SELECT CAST(SUM(tn) AS BIGINT) AS tt,
                           CAST(SUM(rn) AS BIGINT) AS rr FROM cnt),
            llr AS (SELECT bucket,
                           CAST(round(ln(CAST(tn + 1 AS DOUBLE))
                                      * 1000000) AS BIGINT)
                         - CAST(round(ln(CAST(rn + 1 AS DOUBLE))
                                      * 1000000) AS BIGINT) AS q
                    FROM cnt),
            d AS (SELECT b.doc_id, CAST(SUM(llr.q) AS BIGINT) AS sq,
                         CAST(COUNT(*) AS BIGINT) AS n_tokens
                  FROM b JOIN llr USING (bucket) GROUP BY b.doc_id),
            cq AS (SELECT CAST(round(ln(CAST(rr + 1024 AS DOUBLE))
                                     * 1000000) AS BIGINT)
                        - CAST(round(ln(CAST(tt + 1024 AS DOUBLE))
                                     * 1000000) AS BIGINT) AS v
                   FROM tot)
            SELECT d.doc_id, d.n_tokens,
                   ROUND(CAST(d.sq + d.n_tokens * (SELECT v FROM cq)
                              AS DOUBLE) / 1000000.0, 6)
                       AS dsir_logweight
            FROM d
        """,
        "documents_pmi_bigrams": """
            WITH dd AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents),
            t AS (SELECT unnest(toks) AS tok FROM dd),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM t),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM t GROUP BY tok),
            bg AS (SELECT toks[i] AS tok_a, toks[i + 1] AS tok_b
                   FROM dd, UNNEST(range(1, len(toks))) AS r(i)),
            pcnt AS (SELECT tok_a, tok_b,
                            CAST(COUNT(*) AS BIGINT) AS n_pair
                     FROM bg GROUP BY 1, 2),
            p AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_bg FROM pcnt),
            sel AS (SELECT * FROM pcnt WHERE n_pair >= 5)
            SELECT s.tok_a, s.tok_b, s.n_pair,
                   ROUND(CAST(
                       CAST(round(ln(CAST(s.n_pair AS DOUBLE))
                                  * 1000000) AS BIGINT)
                     - CAST(round(ln(CAST(fa.c AS DOUBLE))
                                  * 1000000) AS BIGINT)
                     - CAST(round(ln(CAST(fb.c AS DOUBLE))
                                  * 1000000) AS BIGINT)
                     + 2 * CAST(round(ln(CAST((SELECT n_tok FROM n)
                                              AS DOUBLE))
                                      * 1000000) AS BIGINT)
                     - CAST(round(ln(CAST((SELECT n_bg FROM p)
                                          AS DOUBLE))
                                  * 1000000) AS BIGINT)
                       AS DOUBLE) / 1000000.0, 6) AS pmi
            FROM sel s
            JOIN tf fa ON s.tok_a = fa.tok
            JOIN tf fb ON s.tok_b = fb.tok
        """,
        "documents_gt_unseen": """
            WITH t AS (SELECT source,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            tf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM t GROUP BY 1, 2)
            SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hapax,
                   ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
                       AS gt_unseen_mass
            FROM tf GROUP BY source
        """,
        "documents_zipf_slope": """
            WITH t AS (SELECT source,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            tf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM t GROUP BY 1, 2),
            rk AS (SELECT source, c,
                          ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY c DESC, tok)
                              AS r
                   FROM tf),
            q AS (SELECT source,
                         CAST(round(ln(CAST(r AS DOUBLE)) * 1000)
                              AS BIGINT) AS x,
                         CAST(round(ln(CAST(c AS DOUBLE)) * 1000)
                              AS BIGINT) AS y
                  FROM rk),
            g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x * x) AS BIGINT) AS sxx,
                         CAST(SUM(x * y) AS BIGINT) AS sxy
                  FROM q GROUP BY source),
            s AS (SELECT source, n,
                         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             AS slope,
                         CAST(sx AS DOUBLE) AS sxf,
                         CAST(sy AS DOUBLE) AS syf
                  FROM g)
            SELECT source, n AS n_types,
                   ROUND(slope, 6) AS zipf_slope,
                   ROUND((syf - slope * sxf) / CAST(n AS DOUBLE)
                         / 1000.0, 6) AS zipf_intercept
            FROM s
        """,
        "documents_token_budget_sample": """
            WITH t AS (SELECT doc_id, source,
                              CAST(len(string_split(text, ' ')) AS BIGINT)
                                  AS n_tokens,
                              md5(doc_id::VARCHAR || chr(31) || '11') AS h
                       FROM documents),
            w AS (SELECT *, SUM(n_tokens) OVER (
                      PARTITION BY source ORDER BY h, doc_id) AS cum
                  FROM t)
            SELECT doc_id, source, n_tokens FROM w WHERE cum <= 800
        """,
        "documents_length_filter": """
            WITH t AS (SELECT doc_id, source,
                              CAST(len(string_split(text, ' ')) AS BIGINT)
                                  AS n_tokens
                       FROM documents),
            qs AS (SELECT source,
                          quantile_disc(n_tokens, 0.05) AS lo,
                          quantile_disc(n_tokens, 0.95) AS hi
                   FROM t GROUP BY 1)
            SELECT t.doc_id, t.source, t.n_tokens
            FROM t JOIN qs USING (source)
            WHERE t.n_tokens >= qs.lo AND t.n_tokens <= qs.hi
        """,
        "events_latest_per_user": """
            SELECT user_id, ts, event_id, event_type, value FROM (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id
                  ORDER BY ts DESC, event_id DESC) AS rn
              FROM events) t
            WHERE rn = 1
        """,
        "transcripts_cluster_sample": f"""
            SELECT conv_id, turn_idx, role, text FROM {transcripts}
            WHERE substr(md5(conv_id || chr(31) || '13'), 1, 8)
                  <= '33333333'
        """,
        "events_hour_profile": """
            SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT))
                              AS DOUBLE) / 100.0, 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "orders_customer_right_join": """
            SELECT c.c_custkey, c.c_name, agg.n_orders
            FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
                  FROM orders GROUP BY 1) agg
            RIGHT JOIN customer c ON agg.o_custkey = c.c_custkey
        """,
        "lineitem_weighted_avg": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)
                            * CAST(round(l_quantity) AS BIGINT))
                        AS BIGINT)
                   / SUM(CAST(round(l_quantity) AS BIGINT)) / 100.0
                       AS w_avg_discount
            FROM lineitem GROUP BY 1
        """,
        "events_type_share": """
            WITH c AS (SELECT event_type,
                              CAST(COUNT(*) AS BIGINT) AS n_events
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM c)
            SELECT event_type, n_events,
                   CAST(n_events AS DOUBLE) / t.total AS share
            FROM c, t
        """,
        "orders_orphans": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)
        """,
        "events_user_growth": """
            WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS d
                       FROM events GROUP BY 1),
            nw AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_new
                   FROM f GROUP BY 1),
            days AS (SELECT DISTINCT date_trunc('day', ts) AS d
                     FROM events)
            SELECT days.d AS day,
                   COALESCE(nw.n_new, 0) AS n_new_users,
                   CAST(SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY days.d)
                        AS BIGINT) AS cum_users
            FROM days LEFT JOIN nw ON days.d = nw.d
        """,
        "transcripts_role_profile": f"""
            SELECT role, CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(COALESCE(length(text), 0)) AS BIGINT)
                       AS total_chars,
                   CAST(SUM(COALESCE(length(text), 0)) AS DOUBLE)
                   / COUNT(*) AS mean_chars
            FROM {transcripts} GROUP BY 1
        """,
        "events_median_gap": """
            WITH g AS (SELECT user_id,
                              epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS gap
                       FROM events)
            SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps,
                   CAST(quantile_disc(gap, 0.5) AS BIGINT)
                       AS median_gap_us
            FROM g GROUP BY 1 HAVING COUNT(gap) > 0
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice
                                       * (1 - l_discount) * 10000)
                                 AS BIGINT)) AS DOUBLE)
                       / 10000.0 AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "documents_gopher_gate": """
            WITH d AS (SELECT doc_id, text,
                              string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id,
                         CAST(len(toks) AS BIGINT) AS n_words,
                         CAST(length(replace(text, ' ', '')) AS BIGINT)
                             AS sum_len,
                         CAST(len(list_filter(toks,
                              t -> regexp_matches(t, '[a-z]')))
                             AS BIGINT) AS n_alpha,
                         CAST(len(list_filter(
                              ['the','a','of','and','to','in','be',
                               'that'],
                              w -> list_contains(toks, w)))
                             AS BIGINT) AS n_stop
                  FROM d)
            SELECT doc_id, n_words,
                   CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
                   CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
                   n_stop,
                   (n_words >= 30 AND n_words <= 100000
                    AND CAST(sum_len AS DOUBLE) / n_words >= 3.0
                    AND CAST(sum_len AS DOUBLE) / n_words <= 10.0
                    AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
                    AND n_stop >= 2) AS keep
            FROM s
        """,
        "documents_bm25_topk": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl
                   FROM d),
            tfc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
                    GROUP BY doc_id, tok),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
            q AS (SELECT doc_id AS qid FROM documents
                  ORDER BY md5(doc_id::VARCHAR || chr(31) || '11'),
                           doc_id
                  LIMIT 24),
            qt AS (SELECT DISTINCT q.qid, tfc.tok
                   FROM q JOIN tfc ON tfc.doc_id = q.qid),
            df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
                   FROM tfc
                   WHERE tok IN (SELECT DISTINCT tok FROM qt)
                   GROUP BY tok),
            idf AS (SELECT tok,
                           CAST(ROUND(LN(((n - df) + 0.5) / (df + 0.5)
                                         + 1.0) * 1000000.0) AS BIGINT)
                               AS qidf
                    FROM df, stats),
            sc AS (SELECT qt.qid, tfc.doc_id,
                          CAST(SUM(CAST(ROUND(idf.qidf * (tfc.tf * 2.2)
                               / (tfc.tf + 1.2 * ((1.0 - 0.75)
                                  + 0.75 * (dl.dl / (stats.tot
                                                     / stats.n)))))
                              AS BIGINT)) AS BIGINT) AS score
                   FROM qt
                   JOIN tfc ON qt.tok = tfc.tok
                   JOIN idf ON idf.tok = qt.tok
                   JOIN dl ON dl.doc_id = tfc.doc_id, stats
                   WHERE tfc.doc_id <> qt.qid
                     AND idf.qidf <> 0
                   GROUP BY qt.qid, tfc.doc_id),
            r AS (SELECT qid, doc_id, score,
                         ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY score DESC, doc_id) AS rn
                  FROM sc)
            SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank,
                   doc_id, score
            FROM r WHERE rn <= 5
        """,
        "embeddings_covariance": """
            WITH u AS (SELECT vec_id, i,
                              CAST(ROUND(embedding[i] * 1048576.0)
                                   AS BIGINT) AS q
                       FROM embeddings,
                            UNNEST(range(1, len(embedding) + 1))
                                AS t(i)),
            p AS (SELECT a.i AS dim_i, b.i AS dim_j,
                         CAST(SUM(a.q * b.q) AS BIGINT) AS sxy
                  FROM u a JOIN u b
                    ON a.vec_id = b.vec_id AND a.i <= b.i
                  GROUP BY a.i, b.i),
            m AS (SELECT i, CAST(SUM(q) AS BIGINT) AS s
                  FROM u GROUP BY i),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                  FROM embeddings)
            SELECT CAST(p.dim_i AS BIGINT) AS dim_i,
                   CAST(p.dim_j AS BIGINT) AS dim_j,
                   (CAST(p.sxy AS DOUBLE) / n
                    - (CAST(mi.s AS DOUBLE) / n)
                      * (CAST(mj.s AS DOUBLE) / n))
                   / (1048576.0 * 1048576.0) AS cov
            FROM p
            JOIN m mi ON mi.i = p.dim_i
            JOIN m mj ON mj.i = p.dim_j, c
        """,
        "events_rank_gaps": """
            SELECT event_id, event_type, value,
                   CAST(RANK() OVER (PARTITION BY event_type
                        ORDER BY value DESC) AS BIGINT) AS rnk
            FROM events
        """,
        "events_lead_next": """
            SELECT event_id, user_id, ts,
                   LEAD(ts) OVER w AS next_ts,
                   date_diff('microsecond', ts, LEAD(ts) OVER w)
                       AS next_gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_winsorized_mean": """
            WITH b AS (SELECT event_type,
                              CAST(ROUND(quantile_disc(value, 0.05)
                                         * 100) AS BIGINT) AS lo,
                              CAST(ROUND(quantile_disc(value, 0.95)
                                         * 100) AS BIGINT) AS hi
                       FROM events GROUP BY event_type),
            c AS (SELECT e.event_type,
                         LEAST(GREATEST(CAST(ROUND(e.value * 100)
                                             AS BIGINT), b.lo),
                               b.hi) AS cents
                  FROM events e JOIN b USING (event_type))
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0
                       AS winsorized_mean
            FROM c GROUP BY event_type
        """,
        "documents_ngram_novelty": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 3),
                    i -> list_aggregate(toks[i:i+4], 'string_agg', ' '))))
                    AS sh
                  FROM d WHERE len(toks) >= 5),
            df AS (SELECT sh, COUNT(*) AS c FROM s GROUP BY sh),
            nov AS (SELECT s.doc_id,
                           CAST(COUNT(*) AS BIGINT) AS n_grams,
                           CAST(COUNT(*) FILTER (WHERE df.c = 1)
                                AS BIGINT) AS n_novel
                    FROM s JOIN df USING (sh) GROUP BY s.doc_id)
            SELECT doc_id, n_grams, n_novel,
                   CAST(n_novel AS DOUBLE) / n_grams AS novelty
            FROM nov
        """,
        "documents_vocab_coverage": """
            WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM t GROUP BY tok),
            r AS (SELECT tok, cnt,
                         ROW_NUMBER() OVER (ORDER BY cnt DESC, tok)
                             AS rn
                  FROM c),
            tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
            ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS k)
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(COALESCE(SUM(r.cnt)
                        FILTER (WHERE r.rn <= ks.k), 0) AS BIGINT)
                       AS covered_tokens,
                   CAST(COALESCE(SUM(r.cnt)
                        FILTER (WHERE r.rn <= ks.k), 0) AS DOUBLE)
                   / MAX(tot.total) AS coverage
            FROM ks, r, tot
            GROUP BY ks.k
        """,
        "documents_source_vocab_overlap": """
            WITH st AS (SELECT DISTINCT source, tok
                        FROM (SELECT source,
                                     unnest(string_split(text, ' '))
                                         AS tok
                              FROM documents)),
            n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv
                  FROM st GROUP BY source),
            i AS (SELECT a.source AS sa, b.source AS sb,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM st a JOIN st b
                    ON a.tok = b.tok AND a.source < b.source
                  GROUP BY a.source, b.source)
            SELECT i.sa AS source_a, i.sb AS source_b,
                   na.nv AS vocab_a, nb.nv AS vocab_b,
                   i.c AS shared,
                   CAST(i.c AS DOUBLE) / (na.nv + nb.nv - i.c)
                       AS jaccard
            FROM i
            JOIN n na ON na.source = i.sa
            JOIN n nb ON nb.source = i.sb
        """,
        "documents_canary_scan": """
            WITH c AS (SELECT doc_id AS canary_id,
                              array_to_string(
                                  (string_split(text, ' '))[1:8], ' ')
                                  AS pat
                       FROM documents
                       ORDER BY md5(doc_id::VARCHAR || chr(31)
                                    || '13'), doc_id
                       LIMIT 16)
            SELECT c.canary_id, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM c JOIN documents d ON contains(d.text, c.pat)
            GROUP BY c.canary_id
        """,
        "documents_data_card": """
            WITH s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                              CAST(SUM(len(string_split(text, ' ')))
                                   AS BIGINT) AS n_tokens,
                              CAST(COUNT(DISTINCT lang) AS BIGINT)
                                  AS n_langs,
                              CAST(COUNT(DISTINCT source) AS BIGINT)
                                  AS n_sources
                       FROM documents),
            d AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT)
                      AS dup_docs
                  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
                        FROM documents GROUP BY text
                        HAVING COUNT(*) >= 2))
            SELECT s.n_docs, s.n_tokens, s.n_langs, s.n_sources,
                   CAST(s.n_tokens AS DOUBLE) / s.n_docs
                       AS mean_doc_tokens,
                   d.dup_docs
            FROM s, d
        """,
        "documents_train_order": """
            SELECT doc_id,
                   md5(doc_id::VARCHAR || chr(31) || '17') AS h,
                   CAST(ROW_NUMBER() OVER (
                        ORDER BY md5(doc_id::VARCHAR || chr(31)
                                     || '17'), doc_id) AS BIGINT)
                       AS train_rank
            FROM documents
        """,
        "documents_dedup_normalized": """
            WITH k AS (SELECT doc_id,
                              trim(regexp_replace(regexp_replace(
                                   lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS k
                       FROM documents)
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM k GROUP BY k
        """,
        "documents_c4_gate": """
            SELECT doc_id,
                   CAST(len(text)
                        - len(regexp_replace(text, '[.!?]', '', 'g'))
                        AS BIGINT) AS n_sentences,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, '{') AS has_brace,
                   (len(text)
                    - len(regexp_replace(text, '[.!?]', '', 'g')) >= 3)
                   AND NOT contains(lower(text), 'lorem ipsum')
                   AND NOT contains(text, '{') AS keep
            FROM documents
        """,
        "documents_temperature_mix": """
            WITH a AS (SELECT source,
                              CAST(SUM(len(string_split(text, ' ')))
                                   AS BIGINT) AS n_tokens
                       FROM documents GROUP BY source),
            t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot FROM a),
            qv AS (SELECT source, n_tokens,
                          n_tokens / tot AS token_share,
                          CAST(round(power(n_tokens / tot, 0.7)
                                     * 1099511627776) AS BIGINT) AS qw
                   FROM a, t),
            s AS (SELECT CAST(SUM(qw) AS BIGINT) AS qs FROM qv)
            SELECT source, n_tokens, token_share,
                   CAST(qw AS DOUBLE) / CAST(qs AS DOUBLE) AS mix_weight
            FROM qv, s
        """,
        "documents_ngram_diversity": """
            WITH d AS (SELECT source, string_split(text, ' ') AS toks
                       FROM documents),
            g AS (SELECT source,
                         unnest(list_transform(
                             range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' '
                                  || toks[i+2])) AS sh
                  FROM d WHERE len(toks) >= 3)
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_trigrams,
                   CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct,
                   CAST(COUNT(DISTINCT sh) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS ttr
            FROM g GROUP BY source
        """,
        "documents_source_ttest": """
            WITH a AS (SELECT source,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(n_chars) AS BIGINT) AS sx,
                              CAST(SUM(n_chars * n_chars) AS BIGINT)
                                  AS sxx
                       FROM documents GROUP BY source)
            SELECT a1.source AS source_a, a2.source AS source_b,
                   a1.n AS n_a, a2.n AS n_b,
                   CAST(a1.sx AS DOUBLE) / a1.n AS mean_a,
                   CAST(a2.sx AS DOUBLE) / a2.n AS mean_b,
                   (CAST(a1.sx AS DOUBLE) / a1.n
                    - CAST(a2.sx AS DOUBLE) / a2.n)
                   / sqrt(((CAST(a1.sxx AS DOUBLE)
                            - (CAST(a1.sx AS DOUBLE)
                               * CAST(a1.sx AS DOUBLE)) / a1.n)
                           / (a1.n - 1)) / a1.n
                        + ((CAST(a2.sxx AS DOUBLE)
                            - (CAST(a2.sx AS DOUBLE)
                               * CAST(a2.sx AS DOUBLE)) / a2.n)
                           / (a2.n - 1)) / a2.n) AS t_welch
            FROM a a1 JOIN a a2 ON a1.source < a2.source
            WHERE a1.n > 1 AND a2.n > 1
        """,
        "events_theilsen_trend": """
            WITH p AS (SELECT user_id, epoch_us(ts) AS t,
                              CAST(round(value * 100) AS BIGINT)
                                  AS cents
                       FROM events WHERE event_type = 'purchase'),
            pr AS (SELECT a.user_id,
                          CAST(b.cents - a.cents AS DOUBLE)
                              / (b.t - a.t) AS slope
                   FROM p a JOIN p b
                     ON a.user_id = b.user_id AND a.t < b.t)
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_slopes,
                   quantile_cont(slope, 0.5) AS theil_sen
            FROM pr GROUP BY user_id
        """,
        "documents_line_dedup": """
            WITH d AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                       FROM documents),
            l AS (SELECT doc_id, i, ls[i] AS line
                  FROM d, UNNEST(range(1, len(ls) + 1)) AS r(i)),
            df AS (SELECT line FROM l
                   GROUP BY line
                   HAVING COUNT(DISTINCT doc_id) >= 2),
            kept AS (SELECT l.doc_id, l.i, l.line
                     FROM l LEFT JOIN df ON l.line = df.line
                     WHERE df.line IS NULL),
            agg AS (SELECT doc_id,
                           string_agg(line, chr(10) ORDER BY i)
                               AS clean_text,
                           CAST(COUNT(*) AS BIGINT) AS n_kept
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id,
                   COALESCE(a.clean_text, '') AS clean_text,
                   COALESCE(a.n_kept, 0) AS n_kept,
                   CAST(len(d.ls) AS BIGINT) - COALESCE(a.n_kept, 0)
                       AS n_removed
            FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
        """,
        "orders_large_quantity": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   o_totalprice,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS sum_qty
            FROM customer, orders, lineitem
            WHERE o_orderkey IN (
                      SELECT l_orderkey FROM lineitem
                      GROUP BY l_orderkey
                      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
              AND c_custkey = o_custkey AND o_orderkey = l_orderkey
            GROUP BY 1, 2, 3, 4, 5
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 100
        """,
        "promo_revenue_share": """
            WITH l AS (SELECT date_trunc('month', l_shipdate) AS month,
                              CAST(round(l_extendedprice
                                         * (1 - l_discount) * 10000)
                                   AS BIGINT) AS r,
                              (p_type = 'PROMO') AS promo
                       FROM lineitem JOIN part
                         ON l_partkey = p_partkey)
            SELECT month,
                   CAST(SUM(CASE WHEN promo THEN r ELSE 0 END)
                        AS DOUBLE) * 100.0 / CAST(SUM(r) AS DOUBLE)
                       AS promo_share,
                   CAST(SUM(r) AS DOUBLE) / 10000.0 AS revenue
            FROM l GROUP BY month
        """,
        "orders_priority_returns": """
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY 1
        """,
        "customers_idle_rich": """
            WITH pos AS (SELECT CAST(SUM(CAST(round(c_acctbal * 100)
                                              AS BIGINT)) AS BIGINT) s,
                                CAST(COUNT(*) AS BIGINT) n
                         FROM customer WHERE c_acctbal > 0.0)
            SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS n_custs,
                   CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS total_acctbal
            FROM customer, pos
            WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderstatus = 'F')
            GROUP BY 1
        """,
        "part_revenue_share": """
            WITH pr AS (SELECT l_partkey AS p_partkey,
                               CAST(SUM(CAST(round(l_extendedprice
                                             * (1 - l_discount) * 10000)
                                        AS BIGINT)) AS BIGINT) AS r
                        FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(SUM(r) AS BIGINT) AS tot,
                         CAST(COUNT(*) AS BIGINT) AS np FROM pr)
            SELECT p_partkey, CAST(r AS DOUBLE) / 10000.0 AS revenue
            FROM pr, t
            WHERE 2 * r * np > 3 * tot
        """,
        "volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(round(l_extendedprice
                                       * (1 - l_discount) * 10000)
                                 AS BIGINT)) AS DOUBLE) / 10000.0
                       AS revenue
            FROM supplier, lineitem, orders, customer,
                 nation n1, nation n2
            WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              AND c_custkey = o_custkey
              AND s_nationkey = n1.n_nationkey
              AND c_nationkey = n2.n_nationkey
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "orders_above_cust_avg": """
            WITH o AS (SELECT o_custkey,
                              CAST(round(o_totalprice * 100) AS BIGINT)
                                  AS cents
                       FROM orders),
            a AS (SELECT o_custkey, CAST(SUM(cents) AS BIGINT) AS s,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM o GROUP BY 1)
            SELECT o.o_custkey AS c_custkey, a.n AS n_orders,
                   CAST(SUM(CASE WHEN o.cents * a.n > a.s
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_above
            FROM o JOIN a ON o.o_custkey = a.o_custkey
            GROUP BY 1, 2
        """,
        "events_ks_test": """
            WITH h AS (SELECT value,
                              CAST(COUNT(*) FILTER (
                                  WHERE event_type = 'purchase')
                                  AS BIGINT) AS n1,
                              CAST(COUNT(*) FILTER (
                                  WHERE event_type = 'click')
                                  AS BIGINT) AS n2
                       FROM events
                       WHERE event_type IN ('purchase', 'click')
                       GROUP BY value),
            c AS (SELECT SUM(n1) OVER (ORDER BY value) AS c1,
                         SUM(n2) OVER (ORDER BY value) AS c2
                  FROM h),
            t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
                         CAST(SUM(n2) AS BIGINT) AS t2 FROM h)
            SELECT CAST(MAX(ABS(c1 * t2 - c2 * t1)) AS DOUBLE)
                       / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE))
                       AS ks,
                   t1 AS n_purchase, t2 AS n_click
            FROM c, t GROUP BY t1, t2
        """,
        "documents_ppl_buckets": """
            WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM t GROUP BY tok),
            d AS (SELECT t.doc_id,
                         CAST(SUM(CAST(round(ln(CAST(tf.tf AS DOUBLE))
                                             * 1000000) AS BIGINT))
                              AS BIGINT) AS sq,
                         CAST(COUNT(*) AS BIGINT) AS n_tokens
                  FROM t JOIN tf USING (tok) GROUP BY t.doc_id)
            SELECT d.doc_id, doc.source, d.n_tokens,
                   CAST(NTILE(3) OVER (
                            PARTITION BY doc.source
                            ORDER BY CAST(d.sq AS DOUBLE)
                                     / CAST(d.n_tokens AS DOUBLE) DESC,
                                     d.doc_id) AS BIGINT) AS ppl_bucket
            FROM d JOIN documents doc ON d.doc_id = doc.doc_id
        """,
        "lineitem_revenue_forecast": """
            SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount
                                       * 10000) AS BIGINT))
                        AS DOUBLE) / 10000.0 AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "returned_item_report": """
            SELECT c_custkey, c_name,
                   CAST(SUM(CAST(round(l_extendedprice
                                       * (1 - l_discount) * 10000)
                                 AS BIGINT)) AS DOUBLE) / 10000.0
                       AS revenue
            FROM customer, orders, lineitem
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
            GROUP BY 1, 2
            ORDER BY SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                    * 10000) AS BIGINT)) DESC,
                     c_custkey
            LIMIT 20
        """,
        "events_chi2_independence": """
            WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rn
                  FROM c GROUP BY 1),
            cl AS (SELECT h, CAST(SUM(n) AS BIGINT) AS cn
                   FROM c GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c),
            grid AS (SELECT r.event_type, cl.h, r.rn, cl.cn
                     FROM r CROSS JOIN cl),
            cells AS (SELECT COALESCE(c.n, 0) AS n,
                             CAST(g.rn AS DOUBLE) * CAST(g.cn AS DOUBLE)
                                 / CAST(t.nt AS DOUBLE) AS e
                      FROM grid g
                      LEFT JOIN c ON c.event_type = g.event_type
                                 AND c.h = g.h, t)
            SELECT CAST(SUM(CAST(round(
                       (CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e)
                       / e * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
                       AS chi2,
                   CAST(((SELECT COUNT(*) FROM r) - 1)
                        * ((SELECT COUNT(*) FROM cl) - 1) AS BIGINT)
                       AS dof,
                   (SELECT nt FROM t) AS n_events
            FROM cells
        """,
        "events_mwu_test": """
            WITH h AS (SELECT value,
                              CAST(COUNT(*) FILTER (
                                  WHERE event_type = 'purchase')
                                  AS BIGINT) AS n1,
                              CAST(COUNT(*) FILTER (
                                  WHERE event_type = 'click')
                                  AS BIGINT) AS n2
                       FROM events
                       WHERE event_type IN ('purchase', 'click')
                       GROUP BY value),
            o AS (SELECT n1, n2, n1 + n2 AS nv,
                         SUM(n1 + n2) OVER (ORDER BY value) - (n1 + n2)
                             AS cb
                  FROM h),
            t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
                         CAST(SUM(n2) AS BIGINT) AS t2,
                         CAST(SUM(n1 * (2 * cb + nv + 1)) AS BIGINT)
                             AS r2x,
                         CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS ties
                  FROM o)
            SELECT CAST(r2x - t1 * (t1 + 1) AS DOUBLE) / 2.0 AS u,
                   (CAST(r2x - t1 * (t1 + 1) AS DOUBLE)
                    - CAST(t1 * t2 AS DOUBLE))
                   / (2.0 * sqrt(
                       (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE) / 12.0)
                       * (CAST(t1 + t2 + 1 AS DOUBLE)
                          - CAST(ties AS DOUBLE)
                            / (CAST(t1 + t2 AS DOUBLE)
                               * CAST(t1 + t2 - 1 AS DOUBLE)))))
                       AS z,
                   t1 AS n_purchase, t2 AS n_click
            FROM t
        """,
        "top_supplier": """
            WITH sr AS (SELECT l_suppkey AS s_suppkey,
                               CAST(SUM(CAST(round(l_extendedprice
                                             * (1 - l_discount) * 10000)
                                        AS BIGINT)) AS BIGINT) AS r
                        FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                          AND l_shipdate < TIMESTAMP '1996-04-01'
                        GROUP BY 1)
            SELECT sr.s_suppkey, s.s_name,
                   CAST(r AS DOUBLE) / 10000.0 AS revenue
            FROM sr JOIN supplier s ON sr.s_suppkey = s.s_suppkey
            WHERE r = (SELECT MAX(r) FROM sr)
        """,
        "part_supplier_counts": """
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
                       AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#1'
            GROUP BY 1, 2, 3
        """,
        "events_benford_digits": """
            WITH c AS (SELECT CAST(abs(round(value * 100)) AS BIGINT)
                              AS cents
                       FROM events),
            d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1)
                              AS BIGINT) AS digit
                  FROM c WHERE cents > 0),
            g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
                  FROM d GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g)
            SELECT digit, n,
                   CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share
            FROM g, t
        """,
        "events_daily_autocorr": """
            WITH g AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            p AS (SELECT n AS y, LAG(n) OVER (ORDER BY day) AS x,
                         epoch_us(day) - LAG(epoch_us(day))
                             OVER (ORDER BY day) AS gap
                  FROM g),
            q AS (SELECT x, y FROM p WHERE gap = 86400000000),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x * x) AS BIGINT) AS sxx,
                         CAST(SUM(y * y) AS BIGINT) AS syy,
                         CAST(SUM(x * y) AS BIGINT) AS sxy
                  FROM q)
            SELECT CAST(np * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                          * CAST(np * syy - sy * sy AS DOUBLE))
                       AS autocorr,
                   np AS n_pairs
            FROM s WHERE np > 0
        """,
        "events_spearman": """
            WITH e AS (SELECT value, epoch_us(ts) AS t FROM events
                       WHERE event_type = 'purchase'),
            hx AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS nv
                   FROM e GROUP BY 1),
            ox AS (SELECT value,
                          2 * (SUM(nv) OVER (ORDER BY value) - nv)
                          + nv + 1 AS rx2
                   FROM hx),
            hy AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS nv
                   FROM e GROUP BY 1),
            oy AS (SELECT t,
                          2 * (SUM(nv) OVER (ORDER BY t) - nv)
                          + nv + 1 AS ry2
                   FROM hy),
            p AS (SELECT rx2, ry2
                  FROM e JOIN ox USING (value) JOIN oy USING (t)),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(rx2) AS BIGINT) AS sx,
                         CAST(SUM(ry2) AS BIGINT) AS sy,
                         CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
                         CAST(SUM(ry2 * ry2) AS BIGINT) AS syy,
                         CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy
                  FROM p)
            SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE)) AS rho,
                   n
            FROM s WHERE n > 0
        """,
        "customers_order_count_dist": """
            WITH oc AS (SELECT o_custkey,
                               CAST(COUNT(*) AS BIGINT) AS c_count
                        FROM orders GROUP BY o_custkey),
            per AS (SELECT c_custkey,
                           COALESCE(c_count, 0) AS c_count
                    FROM customer LEFT OUTER JOIN oc
                      ON c_custkey = o_custkey)
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM per GROUP BY c_count
        """,
        "small_quantity_revenue": """
            WITH st AS (SELECT l_partkey,
                               CAST(SUM(CAST(l_quantity AS BIGINT))
                                    AS BIGINT) AS sq,
                               CAST(COUNT(*) AS BIGINT) AS cq
                        FROM lineitem JOIN part
                          ON l_partkey = p_partkey
                        WHERE p_brand = 'Brand#23'
                        GROUP BY l_partkey)
            SELECT COALESCE(CAST(SUM(CAST(round(l_extendedprice * 100)
                                          AS BIGINT)) AS DOUBLE)
                            / 100.0, 0.0) AS small_qty_revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN st USING (l_partkey)
            WHERE 5 * CAST(l_quantity AS BIGINT) * cq < sq
        """,
        "brand_size_revenue": """
            SELECT COALESCE(CAST(SUM(CAST(round(l_extendedprice
                                               * (1 - l_discount)
                                               * 10000) AS BIGINT))
                                 AS DOUBLE) / 10000.0, 0.0) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 15)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 25)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 35)
        """,
        "lineitem_priority_counts": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_returnflag
        """,
        "national_market_share": """
            WITH asia AS (SELECT n_nationkey
                          FROM nation JOIN region
                            ON n_regionkey = r_regionkey
                          WHERE r_name = 'ASIA'),
            tgt AS (SELECT s_suppkey FROM supplier
                    WHERE s_nationkey = 2),
            li AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                          CAST(round(l_extendedprice * (1 - l_discount)
                                     * 10000) AS BIGINT) AS r,
                          CASE WHEN l_suppkey IN (SELECT * FROM tgt)
                               THEN CAST(round(l_extendedprice
                                               * (1 - l_discount)
                                               * 10000) AS BIGINT)
                               ELSE 0 END AS tr
                   FROM lineitem
                   JOIN orders ON l_orderkey = o_orderkey
                   JOIN customer ON o_custkey = c_custkey
                   JOIN part ON p_partkey = l_partkey
                   WHERE p_type = 'STANDARD'
                     AND c_nationkey IN (SELECT * FROM asia))
            SELECT o_year,
                   CAST(SUM(tr) AS DOUBLE) / CAST(SUM(r) AS DOUBLE)
                       AS mkt_share,
                   CAST(SUM(r) AS DOUBLE) / 10000.0 AS market_revenue
            FROM li GROUP BY o_year
        """,
        "product_profit_by_nation": """
            SELECT n_name AS nation,
                   CAST(year(l_shipdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(round(l_extendedprice
                                       * (1 - l_discount) * 10000)
                                 AS BIGINT)
                            - CAST(round(p_retailprice * 100)
                                   AS BIGINT)
                              * CAST(l_quantity AS BIGINT) * 100)
                        AS DOUBLE) / 10000.0 AS profit
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%bolt%'
            GROUP BY 1, 2
        """,
        "min_balance_supplier": """
            WITH eu AS (SELECT n_nationkey, n_name
                        FROM nation JOIN region
                          ON n_regionkey = r_regionkey
                        WHERE r_name = 'EUROPE'),
            ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            cand AS (SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
                            p_name, s_suppkey, s_name, s_acctbal,
                            n_name
                     FROM ps
                     JOIN part ON p_partkey = l_partkey
                     JOIN supplier ON s_suppkey = l_suppkey
                     JOIN eu ON s_nationkey = n_nationkey
                     WHERE p_type = 'SMALL' AND p_size <= 10),
            best AS (SELECT *, ROW_NUMBER() OVER (
                         PARTITION BY p_partkey
                         ORDER BY CAST(round(s_acctbal * 100)
                                       AS BIGINT), s_suppkey) AS rn
                     FROM cand)
            SELECT s_acctbal, s_name, n_name, p_partkey, p_name
            FROM best WHERE rn = 1
            ORDER BY s_acctbal DESC, p_partkey
            LIMIT 100
        """,
        "top_share_suppliers": """
            WITH keys AS (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%'),
            pair AS (SELECT l_partkey, l_suppkey,
                            CAST(SUM(CAST(l_quantity AS BIGINT))
                                 AS BIGINT) AS sq
                     FROM lineitem JOIN keys
                       ON p_partkey = l_partkey
                     GROUP BY 1, 2),
            tot AS (SELECT l_partkey, CAST(SUM(sq) AS BIGINT) AS tq
                    FROM pair GROUP BY 1)
            SELECT s_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM pair
            JOIN tot USING (l_partkey)
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE 8 * sq > tq
            GROUP BY 1, 2
        """,
        "sole_returning_suppliers": """
            WITH pair AS (SELECT l_orderkey, l_suppkey,
                                 MAX(CASE WHEN l_returnflag = 'R'
                                          THEN 1 ELSE 0 END) AS ret
                          FROM lineitem GROUP BY 1, 2),
            o AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(ret) AS BIGINT) AS nr,
                         CAST(SUM(ret * l_suppkey) AS BIGINT) AS rsk
                  FROM pair GROUP BY 1)
            SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM o JOIN supplier ON s_suppkey = rsk
            WHERE n > 1 AND nr = 1
            GROUP BY 1
        """,
        "events_anova_f": """
            WITH g AS (SELECT
                   CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'click') AS BIGINT) AS s_click,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'click') AS BIGINT) AS ss_click,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'error') AS BIGINT) AS s_error,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'error') AS BIGINT) AS ss_error,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s_purchase,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS ss_purchase,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'signup') AS BIGINT) AS s_signup,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'signup') AS BIGINT) AS ss_signup,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'view') AS BIGINT) AS s_view,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) FILTER (WHERE event_type = 'view') AS BIGINT) AS ss_view
                   FROM events),
            a AS (SELECT *, n_click + n_error + n_purchase + n_signup + n_view AS nn, s_click + s_error + s_purchase + s_signup + s_view AS s_all,
                         ss_click + ss_error + ss_purchase + ss_signup + ss_view AS ss_all,
                         ((((CAST(s_click AS DOUBLE) * CAST(s_click AS DOUBLE) / CAST(n_click AS DOUBLE) + CAST(s_error AS DOUBLE) * CAST(s_error AS DOUBLE) / CAST(n_error AS DOUBLE)) + CAST(s_purchase AS DOUBLE) * CAST(s_purchase AS DOUBLE) / CAST(n_purchase AS DOUBLE)) + CAST(s_signup AS DOUBLE) * CAST(s_signup AS DOUBLE) / CAST(n_signup AS DOUBLE)) + CAST(s_view AS DOUBLE) * CAST(s_view AS DOUBLE) / CAST(n_view AS DOUBLE)) AS sb
                  FROM g),
            b AS (SELECT *,
                         sb - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                              / CAST(nn AS DOUBLE) AS ssb,
                         CAST(ss_all AS DOUBLE) - sb AS ssw
                  FROM a)
            SELECT (ssb / 4.0) / (ssw / CAST(nn - 5 AS DOUBLE)) AS f_stat,
                   CAST(4 AS BIGINT) AS dof_between,
                   CAST(nn - 5 AS BIGINT) AS dof_within,
                   CAST(nn AS BIGINT) AS n_events
            FROM b
        """,
        "events_kruskal_wallis": """
            WITH h AS (SELECT value,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
                   CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
                   FROM events GROUP BY value),
            o AS (SELECT *, n_click + n_error + n_purchase + n_signup + n_view AS nv,
                         SUM(n_click + n_error + n_purchase + n_signup + n_view) OVER (ORDER BY value)
                         - (n_click + n_error + n_purchase + n_signup + n_view) AS cb
                  FROM h),
            t AS (SELECT CAST(SUM(n_click) AS BIGINT) AS tn_click,
                         CAST(SUM(n_click * (2 * cb + nv + 1)) AS BIGINT) AS r2_click,
                         CAST(SUM(n_error) AS BIGINT) AS tn_error,
                         CAST(SUM(n_error * (2 * cb + nv + 1)) AS BIGINT) AS r2_error,
                         CAST(SUM(n_purchase) AS BIGINT) AS tn_purchase,
                         CAST(SUM(n_purchase * (2 * cb + nv + 1)) AS BIGINT) AS r2_purchase,
                         CAST(SUM(n_signup) AS BIGINT) AS tn_signup,
                         CAST(SUM(n_signup * (2 * cb + nv + 1)) AS BIGINT) AS r2_signup,
                         CAST(SUM(n_view) AS BIGINT) AS tn_view,
                         CAST(SUM(n_view * (2 * cb + nv + 1)) AS BIGINT) AS r2_view,
                         CAST(SUM(nv * nv * nv - nv) AS BIGINT) AS ties
                  FROM o),
            s AS (SELECT *, tn_click + tn_error + tn_purchase + tn_signup + tn_view AS nn, (((((CAST(r2_click AS DOUBLE) / 2.0) * (CAST(r2_click AS DOUBLE) / 2.0) / CAST(tn_click AS DOUBLE) + (CAST(r2_error AS DOUBLE) / 2.0) * (CAST(r2_error AS DOUBLE) / 2.0) / CAST(tn_error AS DOUBLE)) + (CAST(r2_purchase AS DOUBLE) / 2.0) * (CAST(r2_purchase AS DOUBLE) / 2.0) / CAST(tn_purchase AS DOUBLE)) + (CAST(r2_signup AS DOUBLE) / 2.0) * (CAST(r2_signup AS DOUBLE) / 2.0) / CAST(tn_signup AS DOUBLE)) + (CAST(r2_view AS DOUBLE) / 2.0) * (CAST(r2_view AS DOUBLE) / 2.0) / CAST(tn_view AS DOUBLE)) AS sb FROM t),
            f AS (SELECT *,
                         12.0 / (CAST(nn AS DOUBLE)
                                 * CAST(nn + 1 AS DOUBLE)) * sb
                         - 3.0 * CAST(nn + 1 AS DOUBLE) AS h_stat,
                         1.0 - CAST(ties AS DOUBLE)
                               / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                                  * CAST(nn AS DOUBLE)
                                  - CAST(nn AS DOUBLE)) AS corr
                  FROM s)
            SELECT h_stat AS h, h_stat / corr AS h_corrected,
                   CAST(nn AS BIGINT) AS n_events
            FROM f
        """,
        "events_user_gini": """
            WITH uc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
                        FROM events GROUP BY 1),
            h AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m
                  FROM uc GROUP BY 1),
            o AS (SELECT c, m,
                         SUM(m) OVER (ORDER BY c) - m AS i0
                  FROM h),
            s AS (SELECT CAST(SUM(c * (m * i0 + m * (m + 1) // 2))
                              AS BIGINT) AS a,
                         CAST(SUM(c * m) AS BIGINT) AS tot,
                         CAST(SUM(m) AS BIGINT) AS n
                  FROM o)
            SELECT CAST(2 * a - (n + 1) * tot AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE)) AS gini,
                   n AS n_users, tot AS n_events
            FROM s
        """,
        "events_cramers_v": """
            WITH c AS (SELECT event_type,
                              CAST(isodow(ts) AS BIGINT) AS d,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rn
                  FROM c GROUP BY 1),
            cl AS (SELECT d, CAST(SUM(n) AS BIGINT) AS cn
                   FROM c GROUP BY 1),
            t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c),
            grid AS (SELECT r.event_type, cl.d, r.rn, cl.cn
                     FROM r CROSS JOIN cl),
            cells AS (SELECT COALESCE(c.n, 0) AS n,
                             CAST(g.rn AS DOUBLE) * CAST(g.cn AS DOUBLE)
                                 / CAST(t.nt AS DOUBLE) AS e
                      FROM grid g
                      LEFT JOIN c ON c.event_type = g.event_type
                                 AND c.d = g.d, t),
            x AS (SELECT CAST(SUM(CAST(round(
                       (CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e)
                       / e * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
                       AS chi2
                  FROM cells)
            SELECT sqrt(chi2 / (CAST((SELECT nt FROM t) AS DOUBLE)
                        * CAST(LEAST((SELECT COUNT(*) FROM r) - 1,
                                     (SELECT COUNT(*) FROM cl) - 1)
                               AS DOUBLE))) AS cramers_v,
                   chi2,
                   (SELECT nt FROM t) AS n_events
            FROM x
        """,
        "embeddings_hard_negatives": """
            SELECT query_id, vec_id, cosine, rank FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]),
                           6) AS cosine,
                     ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_cosine_similarity(
                                      q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]) DESC,
                                  c.vec_id ASC) AS rank
              FROM embeddings q CROSS JOIN embeddings c
              WHERE q.vec_id < 8 AND c.label <> q.label) t
            WHERE rank <= 5
        """,
        "embeddings_centroid_outliers": """
            WITH u AS (SELECT label, unnest(embedding) AS v,
                              unnest(generate_series(1, 64)) AS dim
                       FROM embeddings),
            cd AS (SELECT label, dim,
                          SUM(CAST(round(CAST(v AS DOUBLE) * 1073741824)
                                   AS BIGINT)) AS s,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM u GROUP BY label, dim),
            cent AS (SELECT label,
                            list(s / n / 1073741824.0 ORDER BY dim) AS cvec
                     FROM cd GROUP BY label),
            r AS (SELECT e.label, e.vec_id,
                         list_cosine_similarity(e.embedding::DOUBLE[],
                                                cent.cvec) AS cos_raw
                  FROM embeddings e JOIN cent ON e.label = cent.label)
            SELECT CAST(label AS BIGINT) AS label, vec_id,
                   ROUND(cos_raw, 6) AS cosine, rank
            FROM (SELECT label, vec_id, cos_raw,
                         ROW_NUMBER() OVER (PARTITION BY label
                             ORDER BY cos_raw ASC, vec_id ASC) AS rank
                  FROM r) t
            WHERE rank <= 3
        """,
        "documents_leakage_safe_split": """
            SELECT doc_id, source,
                   CASE WHEN substr(md5(text || chr(31) || '42'),
                               1, 8) <= 'cccccccc'
                        THEN 'train'
                        WHEN substr(md5(text || chr(31) || '42'),
                               1, 8) <= 'e6666665'
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "documents_length_batches": """
            WITH t AS (SELECT doc_id, source,
                              CAST(len(string_split(text, ' '))
                                   AS BIGINT) AS nt
                       FROM documents),
            b AS (SELECT doc_id, source, nt,
                         (nt + 127) // 128 AS bucket FROM t),
            r AS (SELECT source, bucket, nt,
                         ROW_NUMBER() OVER (PARTITION BY source, bucket
                             ORDER BY doc_id) AS rn
                  FROM b)
            SELECT source, CAST(bucket AS BIGINT) AS bucket,
                   CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(MAX(nt) AS BIGINT) AS pad_len,
                   CAST(COUNT(*) * MAX(nt) - SUM(nt) AS BIGINT)
                       AS waste_tokens
            FROM r GROUP BY 1, 2, 3
        """,
        "documents_bpe_pair_counts": """
            WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM documents),
            p AS (SELECT substr(word, i, 2) AS pair
                  FROM w, unnest(range(1, len(word))) AS u(i)
                  WHERE len(word) >= 2)
            SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
            FROM p GROUP BY 1
            ORDER BY n DESC, pair ASC LIMIT 20
        """,
        "transcripts_dup_weights": f"""
            WITH c AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS n
                       FROM {transcripts} GROUP BY text)
            SELECT t.conv_id, t.turn_idx, c.n AS n_copies,
                   ROUND(1.0 / c.n, 6) AS weight
            FROM {transcripts} t JOIN c USING (text)
        """,
        "transcripts_dup_token_mass": f"""
            WITH g AS (SELECT text,
                              CAST(len(string_split(text, ' '))
                                   AS BIGINT) AS nt,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM {transcripts} GROUP BY text)
            SELECT CAST(SUM(nt * n) AS BIGINT) AS total_tokens,
                   CAST(SUM(nt * (n - 1)) AS BIGINT) AS dup_tokens,
                   ROUND(CAST(SUM(nt * (n - 1)) AS DOUBLE)
                         / CAST(SUM(nt * n) AS DOUBLE), 6) AS dup_frac
            FROM g
        """,
        "documents_top_terms_per_source": """
            WITH tok AS (SELECT source,
                                unnest(string_split(text, ' ')) AS tok
                         FROM documents),
            c AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n
                  FROM tok GROUP BY 1, 2)
            SELECT source, tok, n, rank FROM (
              SELECT source, tok, n,
                     ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY n DESC, tok ASC) AS rank
              FROM c) t
            WHERE rank <= 5
        """,
        "events_winsorize_values": """
            WITH q AS (SELECT event_type,
                              quantile_disc(value, 0.05) AS lo,
                              quantile_disc(value, 0.95) AS hi
                       FROM events GROUP BY 1)
            SELECT e.event_id, e.event_type,
                   LEAST(GREATEST(e.value, q.lo), q.hi) AS value_w
            FROM events e JOIN q USING (event_type)
        """,
        "transcripts_windowed_dedup": f"""
            WITH o AS (SELECT conv_id, turn_idx, ts,
                              LAG(ts) OVER (PARTITION BY text
                                  ORDER BY ts, conv_id, turn_idx) AS prev
                       FROM {transcripts})
            SELECT conv_id, turn_idx, ts FROM o
            WHERE prev IS NULL OR ts - prev > INTERVAL 7 DAY
        """,
        "events_daily_ewma": """
            WITH d AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            r AS (SELECT day, n,
                         CAST(ROW_NUMBER() OVER (ORDER BY day)
                              AS BIGINT) AS rn
                  FROM d)
            SELECT t.day, t.n AS n_events,
                   CAST(SUM(CAST(round(
                        CAST(s.n AS DOUBLE)
                        * power(0.5, CAST(t.rn - s.rn
                              + CASE WHEN s.rn = 1 THEN 0 ELSE 1 END
                              AS DOUBLE))
                        * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
                       AS ewma
            FROM r t JOIN r s ON s.rn <= t.rn
            GROUP BY t.day, t.n
        """,
        "customers_rfm_segments": """
            WITH m AS (SELECT o_custkey AS c,
                              MAX(o_orderdate) AS last_order,
                              CAST(COUNT(*) AS BIGINT) AS n_orders,
                              CAST(SUM(CAST(round(o_totalprice * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS monetary_cents
                       FROM orders GROUP BY 1),
            j AS (SELECT cu.c_custkey,
                         CAST(cu.c_nationkey AS BIGINT) AS c_nationkey,
                         m.last_order, m.n_orders, m.monetary_cents
                  FROM m JOIN customer cu ON m.c = cu.c_custkey)
            SELECT c_custkey, c_nationkey, last_order, n_orders,
                   monetary_cents,
                   CAST(NTILE(5) OVER (PARTITION BY c_nationkey
                        ORDER BY last_order DESC, c_custkey ASC)
                        AS BIGINT) AS r_score,
                   CAST(NTILE(5) OVER (PARTITION BY c_nationkey
                        ORDER BY n_orders DESC, c_custkey ASC)
                        AS BIGINT) AS f_score,
                   CAST(NTILE(5) OVER (PARTITION BY c_nationkey
                        ORDER BY monetary_cents DESC, c_custkey ASC)
                        AS BIGINT) AS m_score
            FROM j
        """,
        "events_pareto_share": """
            WITH u AS (SELECT user_id,
                              CAST(SUM(CAST(round(value * 100)
                                            AS BIGINT)) AS BIGINT)
                                  AS cents
                       FROM events WHERE value IS NOT NULL
                       GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                         CAST(SUM(cents) AS BIGINT) AS tot FROM u),
            r AS (SELECT cents,
                         ROW_NUMBER() OVER (ORDER BY cents DESC,
                                            user_id ASC) AS rn
                  FROM u)
            SELECT n.nu AS n_users,
                   CAST(CEIL(n.nu / 10.0) AS BIGINT) AS top_users,
                   CAST(SUM(CASE WHEN r.rn <= CEIL(n.nu / 10.0)
                                 THEN r.cents ELSE 0 END) AS BIGINT)
                       AS top_cents,
                   n.tot AS total_cents,
                   ROUND(CAST(SUM(CASE WHEN r.rn <= CEIL(n.nu / 10.0)
                                       THEN r.cents ELSE 0 END)
                              AS DOUBLE)
                         / CAST(n.tot AS DOUBLE), 6) AS top_share
            FROM r, n GROUP BY n.nu, n.tot
        """,
        "events_new_vs_returning": """
            WITH ud AS (SELECT user_id, date_trunc('day', ts) AS d,
                               CAST(COUNT(*) AS BIGINT) AS n
                        FROM events GROUP BY 1, 2),
            f AS (SELECT user_id, MIN(d) AS fd FROM ud GROUP BY 1)
            SELECT ud.d AS day,
                   CAST(COUNT(CASE WHEN ud.d = f.fd THEN 1 END)
                        AS BIGINT) AS n_new_users,
                   CAST(COUNT(CASE WHEN ud.d > f.fd THEN 1 END)
                        AS BIGINT) AS n_returning_users,
                   CAST(SUM(CASE WHEN ud.d = f.fd THEN ud.n ELSE 0 END)
                        AS BIGINT) AS new_events,
                   CAST(SUM(CASE WHEN ud.d > f.fd THEN ud.n ELSE 0 END)
                        AS BIGINT) AS returning_events
            FROM ud JOIN f USING (user_id) GROUP BY 1
        """,
        "events_psi_drift": """
            WITH b AS (SELECT event_type,
                              CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                                   AS BIGINT) AS d
                       FROM events),
            r AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM b),
            c AS (SELECT event_type,
                         CAST(SUM(CASE WHEN d < mn + (mx - mn + 1) // 2
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS c_ref,
                         CAST(SUM(CASE WHEN d >= mn + (mx - mn + 1) // 2
                                       THEN 1 ELSE 0 END) AS BIGINT)
                             AS c_cur
                  FROM b, r GROUP BY 1),
            n AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n1,
                         CAST(SUM(c_cur) AS BIGINT) AS n2 FROM c),
            p AS (SELECT event_type, c_ref, c_cur,
                         CAST(c_ref AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                         CAST(c_cur AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
                  FROM c, n WHERE c_ref > 0 AND c_cur > 0)
            SELECT event_type, c_ref, c_cur,
                   ROUND(p1, 6) AS share_ref,
                   ROUND(p2, 6) AS share_cur,
                   ROUND((p2 - p1) * ln(p2 / p1), 6) AS psi_term
            FROM p
        """,
        "lineitem_profile": """
            SELECT 'l_orderkey' AS col,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
                   CAST(MIN(l_orderkey) AS BIGINT) AS min_int,
                   CAST(MAX(l_orderkey) AS BIGINT) AS max_int,
                   CAST(NULL AS DOUBLE) AS min_num,
                   CAST(NULL AS DOUBLE) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str
            FROM lineitem
            UNION ALL
            SELECT 'l_partkey', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_partkey) AS BIGINT),
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
                   CAST(MIN(l_partkey) AS BIGINT),
                   CAST(MAX(l_partkey) AS BIGINT),
                   NULL, NULL, NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_suppkey', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_suppkey) AS BIGINT),
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
                   CAST(MIN(l_suppkey) AS BIGINT),
                   CAST(MAX(l_suppkey) AS BIGINT),
                   NULL, NULL, NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_linenumber', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_linenumber) AS BIGINT),
                   CAST(COUNT(DISTINCT l_linenumber) AS BIGINT),
                   CAST(MIN(l_linenumber) AS BIGINT),
                   CAST(MAX(l_linenumber) AS BIGINT),
                   NULL, NULL, NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT),
                   CAST(COUNT(DISTINCT l_quantity) AS BIGINT),
                   NULL, NULL, MIN(l_quantity), MAX(l_quantity),
                   NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
                   CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
                   NULL, NULL, MIN(l_extendedprice), MAX(l_extendedprice),
                   NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_discount', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
                   CAST(COUNT(DISTINCT l_discount) AS BIGINT),
                   NULL, NULL, MIN(l_discount), MAX(l_discount),
                   NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_tax) AS BIGINT),
                   CAST(COUNT(DISTINCT l_tax) AS BIGINT),
                   NULL, NULL, MIN(l_tax), MAX(l_tax),
                   NULL, NULL
            FROM lineitem
            UNION ALL
            SELECT 'l_returnflag', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
                   CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
                   NULL, NULL, NULL, NULL,
                   MIN(l_returnflag), MAX(l_returnflag)
            FROM lineitem
            UNION ALL
            SELECT 'l_linestatus', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_linestatus) AS BIGINT),
                   CAST(COUNT(DISTINCT l_linestatus) AS BIGINT),
                   NULL, NULL, NULL, NULL,
                   MIN(l_linestatus), MAX(l_linestatus)
            FROM lineitem
            UNION ALL
            SELECT 'l_shipdate', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
                   CAST(COUNT(DISTINCT l_shipdate) AS BIGINT),
                   CAST(epoch_us(MIN(l_shipdate)) AS BIGINT),
                   CAST(epoch_us(MAX(l_shipdate)) AS BIGINT),
                   NULL, NULL, NULL, NULL
            FROM lineitem
        """,
        "events_rolling_median": """
            SELECT event_id, user_id,
                   median(CAST(round(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                       / 100.0 AS rolling_med
            FROM events WHERE value IS NOT NULL
        """,
        "events_ols_trend": """
            WITH d AS (SELECT event_type,
                              CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                                   AS BIGINT) AS d,
                              CAST(SUM(CAST(round(value * 100)
                                            AS BIGINT)) AS BIGINT) AS y
                       FROM events WHERE value IS NOT NULL
                       GROUP BY 1, 2),
            m AS (SELECT MIN(d) AS x0 FROM d),
            s AS (SELECT event_type,
                         CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(d - x0) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM((d - x0) * (d - x0)) AS HUGEINT) AS sxx,
                         CAST(SUM((d - x0) * y) AS HUGEINT) AS sxy
                  FROM d, m GROUP BY 1)
            SELECT event_type, CAST(n AS BIGINT) AS n_days,
                   ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
                   ROUND((CAST(sy AS DOUBLE)
                          - (CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * sxx - sx * sx AS DOUBLE))
                            * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 6) AS intercept
            FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
        """,
        "parts_copurchase_degrees": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS degree
                    FROM (SELECT p1 AS p FROM e
                          UNION ALL SELECT p2 FROM e)
                    GROUP BY 1)
            SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM deg GROUP BY 1
        """,
        "parts_copurchase_triangles": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT p1 AS p FROM e
                          UNION ALL SELECT p2 FROM e)
                    GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
                  FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
                       JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
            w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT)
                      AS n_wedges FROM deg)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg)
                       AS n_nodes,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
                   w.n_wedges,
                   t.n_tri AS n_triangles,
                   ROUND(CAST(3 * t.n_tri AS DOUBLE)
                         / CAST(w.n_wedges AS DOUBLE), 6) AS clustering
            FROM t, w
        """,
        "embeddings_jl_distortion": """
            WITH dims AS (SELECT i FROM range(1, 65) t(i)),
            outs AS (SELECT j FROM range(0, 16) t(j)),
            sgn AS (SELECT d.i, o.j,
                           CASE WHEN strpos('01234567',
                                    substr(md5((d.i - 1)::VARCHAR
                                               || ':' || o.j::VARCHAR
                                               || ':jl'), 1, 1)) > 0
                                THEN 1 ELSE -1 END AS s
                    FROM dims d CROSS JOIN outs o),
            v AS (SELECT e.vec_id, d.i,
                         CAST(round(list_extract(e.embedding, d.i)
                                    * 1000000) AS BIGINT) AS q
                  FROM embeddings e CROSS JOIN dims d),
            pairs AS (SELECT a.vec_id // 2 AS t, a.i,
                             a.q - b.q AS diff
                      FROM v a JOIN v b
                        ON b.vec_id = a.vec_id + 1 AND a.i = b.i
                      WHERE a.vec_id % 2 = 0),
            dorig AS (SELECT t, CAST(SUM(diff * diff) AS BIGINT)
                                   AS d2
                      FROM pairs GROUP BY 1),
            proj AS (SELECT p.t, sgn.j,
                            CAST(SUM(sgn.s * p.diff) AS BIGINT)
                                AS pd
                     FROM pairs p JOIN sgn ON sgn.i = p.i
                     GROUP BY 1, 2),
            dproj AS (SELECT t, CAST(SUM(pd * pd) AS BIGINT) AS p2
                      FROM proj GROUP BY 1),
            ratio AS (SELECT CAST(CAST(dproj.p2 AS HUGEINT)
                                  * 1000000
                                  // (16 * CAST(dorig.d2 AS HUGEINT))
                                  AS BIGINT) AS ratio_q
                      FROM dproj JOIN dorig USING (t)
                      WHERE dorig.d2 > 0)
            SELECT ratio_q // 100000 AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM ratio GROUP BY 1 ORDER BY 1
        """,
        "events_max_drawdown": """
            WITH daily AS (SELECT date_trunc('day', ts) AS day,
                                  CAST(SUM(CAST(round(value * 100)
                                                AS BIGINT)) AS BIGINT)
                                      AS cents
                           FROM events GROUP BY 1),
            w AS (SELECT day,
                         CAST(SUM(cents) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum
                  FROM daily),
            w2 AS (SELECT day, cum,
                          CAST(MAX(cum) OVER (ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              AS peak
                   FROM w),
            mx AS (SELECT CAST(MAX(peak - cum) AS BIGINT) AS mdd
                   FROM w2)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily)
                       AS n_days,
                   (SELECT cum FROM w2 ORDER BY day DESC LIMIT 1)
                       AS final_cents,
                   (SELECT peak FROM w2 ORDER BY day DESC LIMIT 1)
                       AS peak_cents,
                   mx.mdd AS max_drawdown_cents,
                   (SELECT MIN(day) FROM w2, mx
                    WHERE peak - cum = mx.mdd) AS trough_day
            FROM mx
        """,
        "events_locf_daily": """
            WITH obs AS (SELECT user_id, date_trunc('day', ts) AS day,
                                CAST(SUM(CAST(round(value * 100)
                                              AS BIGINT)) AS BIGINT)
                                    AS cents
                         FROM events GROUP BY 1, 2),
            span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM obs),
            days AS (SELECT UNNEST(generate_series(lo, hi,
                                   INTERVAL 1 DAY)) AS day
                     FROM span),
            users AS (SELECT DISTINCT user_id FROM obs),
            grid AS (SELECT u.user_id, d.day
                     FROM users u CROSS JOIN days d)
            SELECT g.user_id, g.day,
                   obs.cents AS observed,
                   CAST(last_value(obs.cents IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.day
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS filled
            FROM grid g LEFT JOIN obs
              ON obs.user_id = g.user_id AND obs.day = g.day
            ORDER BY 1, 2
        """,
        "documents_reliability_bins": """
            WITH b AS (SELECT n_chars // 100 AS band,
                              CASE WHEN lang = 'en' THEN 1 ELSE 0 END
                                  AS y
                       FROM documents),
            g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(y) AS BIGINT) AS n_pos
                  FROM b GROUP BY 1)
            SELECT band, n_docs, n_pos,
                   CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE)
                       AS rate,
                   n_pos * (n_docs - n_pos) * 1000000000000 // n_docs
                       AS brier_q
            FROM g ORDER BY band
        """,
        "supplier_rank_rbo": """
            WITH per AS (SELECT l_suppkey AS s,
                                CAST(COUNT(*) AS BIGINT) AS n,
                                CAST(SUM(CASE WHEN l_returnflag = 'R'
                                              THEN 1 ELSE 0 END)
                                     AS BIGINT) AS k
                         FROM lineitem GROUP BY 1),
            q AS (SELECT s, n, k, k * 1000000 // n AS r_q FROM per),
            mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sup,
                          CAST(SUM(r_q) AS BIGINT) AS sum_r,
                          CAST(SUM(r_q * r_q) AS BIGINT) AS sum_r2
                   FROM q),
            pr AS (SELECT
                       CAST(sum_r AS DOUBLE) / CAST(n_sup AS DOUBLE)
                           / 1000000.0 AS m_f,
                       (CAST(sum_r2 AS DOUBLE) / CAST(n_sup AS DOUBLE)
                        - (CAST(sum_r AS DOUBLE)
                           / CAST(n_sup AS DOUBLE))
                          * (CAST(sum_r AS DOUBLE)
                             / CAST(n_sup AS DOUBLE)))
                           / 1000000000000.0 AS v_f
                   FROM mo),
            ab AS (SELECT m_f * (1.0 - m_f) / v_f - 1.0 AS k0,
                          m_f FROM pr),
            ab2 AS (SELECT m_f * k0 AS alpha,
                           (1.0 - m_f) * k0 AS beta FROM ab),
            ranked AS (SELECT q.s,
                           ROW_NUMBER() OVER (ORDER BY q.r_q DESC,
                                              q.s) AS ra,
                           ROW_NUMBER() OVER (ORDER BY
                               (CAST(q.k AS DOUBLE) + ab2.alpha)
                               / (CAST(q.n AS DOUBLE) + ab2.alpha
                                  + ab2.beta) DESC, q.s) AS rb
                       FROM q, ab2),
            dd AS (SELECT t.d AS d,
                          (SELECT CAST(COUNT(*) AS BIGINT)
                           FROM ranked
                           WHERE ra <= t.d AND rb <= t.d) AS x
                   FROM range(1, 21) t(d)),
            tq AS (SELECT d, x,
                          CAST(round(0.5 * POWER(0.5, d - 1)
                                     * (CAST(x AS DOUBLE)
                                        / CAST(d AS DOUBLE))
                                     * 1000000000000000.0)
                               AS BIGINT) AS term_q
                   FROM dd)
            SELECT CAST(20 AS BIGINT) AS depth,
                   (SELECT x FROM tq WHERE d = 20) AS overlap_at_depth,
                   CAST(SUM(term_q) AS BIGINT) AS rbo_q,
                   CAST(SUM(term_q) AS DOUBLE)
                       / 1000000000000000.0 AS rbo
            FROM tq
        """,
        "embeddings_dbscan": """
            WITH RECURSIVE p AS (
              SELECT a.vec_id AS ia, b.vec_id AS ib
              FROM embeddings a JOIN embeddings b
                ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[])
                    >= 0.35),
            e AS (SELECT ia AS s, ib AS t FROM p
                  UNION ALL SELECT ib, ia FROM p),
            d AS (SELECT s AS id, CAST(COUNT(*) + 1 AS BIGINT) AS nn
                  FROM e GROUP BY 1),
            core AS (SELECT id FROM d WHERE nn >= 4),
            ce AS (SELECT e.s, e.t FROM e
                   WHERE e.s IN (SELECT id FROM core)
                     AND e.t IN (SELECT id FROM core)),
            r(id, reach) AS (
              SELECT id, id FROM core
              UNION
              SELECT r.id, ce.t FROM r JOIN ce ON ce.s = r.reach),
            lab AS (SELECT id, CAST(MIN(reach) AS BIGINT) AS cluster
                    FROM r GROUP BY 1),
            border AS (SELECT e.s AS id,
                              CAST(MIN(e.t) AS BIGINT) AS near_core
                       FROM e
                       WHERE e.s NOT IN (SELECT id FROM core)
                         AND e.t IN (SELECT id FROM core)
                       GROUP BY 1)
            SELECT em.vec_id,
                   CASE WHEN lab.id IS NOT NULL THEN 'core'
                        WHEN border.id IS NOT NULL THEN 'border'
                        ELSE 'noise' END AS role,
                   CASE WHEN lab.id IS NOT NULL THEN lab.cluster
                        ELSE lab2.cluster END AS cluster
            FROM embeddings em
            LEFT JOIN lab ON lab.id = em.vec_id
            LEFT JOIN border ON border.id = em.vec_id
            LEFT JOIN lab lab2 ON lab2.id = border.near_core
            ORDER BY em.vec_id
        """,
        "parts_copurchase_assortativity": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            de AS (SELECT p1 AS s, p2 AS t FROM e
                   UNION ALL SELECT p2, p1 FROM e),
            deg AS (SELECT s AS p, CAST(COUNT(*) AS BIGINT) AS d
                    FROM de GROUP BY 1),
            mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                          CAST(SUM(da.d) AS BIGINT) AS sx,
                          CAST(SUM(da.d * da.d) AS BIGINT) AS sxx,
                          CAST(SUM(da.d * db.d) AS BIGINT) AS sxy
                   FROM de JOIN deg da ON da.p = de.s
                           JOIN deg db ON db.p = de.t)
            SELECT m // 2 AS n_edges,
                   ROUND(CAST(m * sxy - sx * sx AS DOUBLE)
                         / CAST(m * sxx - sx * sx AS DOUBLE), 6)
                       AS assortativity
            FROM mo
        """,
        "documents_chao1": """
            WITH t AS (SELECT source,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            tf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM t GROUP BY 1, 2),
            s AS (SELECT source,
                         CAST(COUNT(*) AS BIGINT) AS v_obs,
                         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS f1,
                         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                              AS BIGINT) AS f2
                  FROM tf GROUP BY source)
            SELECT source, v_obs, f1, f2,
                   ROUND(CAST(v_obs AS DOUBLE)
                         + CAST(f1 * (f1 - 1) AS DOUBLE)
                           / CAST(2 * (f2 + 1) AS DOUBLE), 6) AS chao1
            FROM s
        """,
        "events_isotonic_daily": """
            WITH RECURSIVE daily AS (
              SELECT date_trunc('day', ts) AS day,
                     CAST(SUM(CAST(round(value * 100) AS BIGINT))
                          AS BIGINT) AS sy,
                     CAST(1 AS BIGINT) AS n
              FROM events GROUP BY 1),
            pav(iter, s_day, sy, n) AS (
              SELECT 0, day, sy, n FROM daily
              UNION ALL
              SELECT iter + 1, new_s, CAST(SUM(sy) AS BIGINT),
                     CAST(SUM(n) AS BIGINT)
              FROM (
                SELECT iter, sy, n,
                       CASE WHEN (rn + iter) % 2 = 0
                                 AND psy IS NOT NULL
                                 AND psy * n > sy * pn
                            THEN ps ELSE s_day END AS new_s
                FROM (SELECT iter, s_day, sy, n,
                             ROW_NUMBER() OVER (ORDER BY s_day)
                                 AS rn,
                             LAG(sy) OVER (ORDER BY s_day) AS psy,
                             LAG(n) OVER (ORDER BY s_day) AS pn,
                             LAG(s_day) OVER (ORDER BY s_day) AS ps
                      FROM pav))
              GROUP BY 1, 2
              HAVING iter + 1 <= 80
            )
            SELECT s_day AS start_day, n AS n_days, sy AS sum_cents,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS fitted
            FROM pav WHERE iter = 80 ORDER BY 1
        """,
        "embeddings_mmr": """
            WITH RECURSIVE rel0 AS (
              SELECT c.vec_id,
                     ROUND(list_cosine_similarity(
                         (SELECT embedding FROM embeddings
                          WHERE vec_id = 0)::DOUBLE[],
                         c.embedding::DOUBLE[]), 6) AS rel
              FROM embeddings c WHERE c.vec_id <> 0),
            pool AS (SELECT vec_id, rel FROM rel0
                     ORDER BY rel DESC, vec_id LIMIT 30),
            pw AS (SELECT a.vec_id AS av, b.vec_id AS bv,
                          ROUND(list_cosine_similarity(
                              ea.embedding::DOUBLE[],
                              eb.embedding::DOUBLE[]), 6) AS s
                   FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
                        JOIN embeddings ea ON ea.vec_id = a.vec_id
                        JOIN embeddings eb ON eb.vec_id = b.vec_id),
            mmr(step, sel, vec_id, rel, maxsim, score) AS (
              SELECT 1, [vec_id], vec_id, rel,
                     CAST(NULL AS DOUBLE), rel
              FROM pool
              QUALIFY ROW_NUMBER() OVER (ORDER BY rel DESC,
                                         vec_id) = 1
              UNION ALL
              SELECT step + 1, list_append(sel, vec_id), vec_id,
                     rel, maxsim, score
              FROM (SELECT m.step AS step, m.sel AS sel,
                           p.vec_id AS vec_id, p.rel AS rel,
                           MAX(pw.s) AS maxsim,
                           0.5 * p.rel - 0.5 * MAX(pw.s) AS score
                    FROM mmr m
                         JOIN pool p
                           ON NOT list_contains(m.sel, p.vec_id)
                         JOIN pw ON pw.av = p.vec_id
                                AND list_contains(m.sel, pw.bv)
                    GROUP BY m.step, m.sel, p.vec_id, p.rel)
              WHERE step < 10
              QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC,
                                         vec_id) = 1
            )
            SELECT CAST(step AS BIGINT) AS step, vec_id, rel,
                   maxsim, score
            FROM mmr ORDER BY step
        """,
        "parts_copurchase_eigencentrality": """
            WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o,
                                                  l_partkey AS p
                                  FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            de AS (SELECT p1 AS s, p2 AS t FROM e
                   UNION ALL SELECT p2, p1 FROM e),
            init AS (SELECT DISTINCT s AS p,
                            CAST(1000000000 AS BIGINT) AS x
                     FROM de),
            it(iter, p, x) AS (
                SELECT 0, p, x FROM init
                UNION ALL
                SELECT iter + 1, p,
                       CAST(CAST(sx AS HUGEINT) * 1000000000
                            // MAX(sx) OVER () AS BIGINT)
                FROM (SELECT it.iter AS iter, de.t AS p,
                             CAST(SUM(it.x) AS BIGINT) AS sx
                      FROM it JOIN de ON de.s = it.p
                      GROUP BY 1, 2)
                WHERE iter < 8
            )
            SELECT p, x AS score_ppb FROM it WHERE iter = 8
            ORDER BY x DESC, p LIMIT 20
        """,
        "events_sprt": """
            WITH b AS (SELECT event_type, ts, event_id,
                              CASE WHEN CAST(round(value * 100)
                                             AS BIGINT) > 10000
                                   THEN 693147 ELSE -405465 END AS inc
                       FROM events),
            w AS (SELECT event_type, inc,
                         CAST(SUM(inc) OVER (
                             PARTITION BY event_type
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum,
                         CAST(ROW_NUMBER() OVER (
                             PARTITION BY event_type
                             ORDER BY ts, event_id) AS BIGINT) AS rn
                  FROM b),
            n AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS n_events,
                         CAST(SUM(CASE WHEN inc = 693147 THEN 1
                                       ELSE 0 END) AS BIGINT)
                             AS n_success,
                         CAST(SUM(inc) AS BIGINT) AS cum_final
                  FROM b GROUP BY 1),
            st AS (SELECT event_type, CAST(MIN(rn) AS BIGINT)
                              AS stop_n
                   FROM w WHERE cum >= 2944439 OR cum <= -2944439
                   GROUP BY 1),
            sc AS (SELECT w.event_type, w.cum AS stop_llr
                   FROM w JOIN st ON w.event_type = st.event_type
                                 AND w.rn = st.stop_n)
            SELECT n.event_type, n.n_events, n.n_success,
                   CASE WHEN sc.stop_llr IS NULL THEN 'continue'
                        WHEN sc.stop_llr >= 2944439 THEN 'accept_h1'
                        ELSE 'accept_h0' END AS decision,
                   CAST(COALESCE(st.stop_n, 0) AS BIGINT) AS stop_n,
                   CAST(COALESCE(sc.stop_llr, n.cum_final) AS BIGINT)
                       AS llr_q
            FROM n LEFT JOIN st ON n.event_type = st.event_type
                   LEFT JOIN sc ON n.event_type = sc.event_type
            ORDER BY 1
        """,
        "supplier_eb_shrinkage": """
            WITH per AS (SELECT l_suppkey AS s,
                                CAST(COUNT(*) AS BIGINT) AS n,
                                CAST(SUM(CASE WHEN l_returnflag = 'R'
                                              THEN 1 ELSE 0 END)
                                     AS BIGINT) AS k
                         FROM lineitem GROUP BY 1),
            q AS (SELECT s, n, k, k * 1000000 // n AS r_q FROM per),
            mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sup,
                          CAST(SUM(r_q) AS BIGINT) AS sum_r,
                          CAST(SUM(r_q * r_q) AS BIGINT) AS sum_r2
                   FROM q),
            pr AS (SELECT
                       CAST(sum_r AS DOUBLE) / CAST(n_sup AS DOUBLE)
                           / 1000000.0 AS m_f,
                       (CAST(sum_r2 AS DOUBLE) / CAST(n_sup AS DOUBLE)
                        - (CAST(sum_r AS DOUBLE)
                           / CAST(n_sup AS DOUBLE))
                          * (CAST(sum_r AS DOUBLE)
                             / CAST(n_sup AS DOUBLE)))
                           / 1000000000000.0 AS v_f
                   FROM mo),
            ab AS (SELECT m_f * (1.0 - m_f) / v_f - 1.0 AS k0,
                          m_f FROM pr),
            ab2 AS (SELECT m_f * k0 AS alpha,
                           (1.0 - m_f) * k0 AS beta FROM ab)
            SELECT q.s AS suppkey, q.n AS n_items, q.k AS n_returns,
                   q.r_q AS rate_ppm, ab2.alpha, ab2.beta,
                   (CAST(q.k AS DOUBLE) + ab2.alpha)
                       / (CAST(q.n AS DOUBLE) + ab2.alpha + ab2.beta)
                       AS shrunk_rate
            FROM q, ab2
            ORDER BY shrunk_rate DESC, suppkey
            LIMIT 20
        """,
        "parts_copurchase_kcore": """
            WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o,
                                                  l_partkey AS p
                                  FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            de AS (SELECT p1 AS s, p2 AS t FROM e
                   UNION ALL SELECT p2, p1 FROM e),
            peel(iter, s, t) AS (
                SELECT 0, s, t FROM de
                UNION ALL
                SELECT iter + 1, s, t FROM (
                    SELECT iter, s, t,
                           COUNT(*) OVER (PARTITION BY s) AS ds,
                           COUNT(*) OVER (PARTITION BY t) AS dt
                    FROM peel)
                WHERE ds >= 75 AND dt >= 75 AND iter < 16
            )
            SELECT s AS p, CAST(COUNT(*) AS BIGINT) AS core_degree
            FROM peel WHERE iter = 16 GROUP BY 1 ORDER BY 1
        """,
        "parts_copurchase_bfs": """
            WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS o,
                                                  l_partkey AS p
                                  FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            de AS (SELECT p1 AS s, p2 AS t FROM e
                   UNION ALL SELECT p2, p1 FROM e),
            seed AS (SELECT MIN(s) AS p FROM de),
            bfs(p, dist) AS (
                SELECT p, 0 FROM seed
                UNION
                SELECT de.t, bfs.dist + 1
                FROM bfs JOIN de ON de.s = bfs.p
                WHERE bfs.dist < 12
            ),
            md AS (SELECT p, CAST(MIN(dist) AS BIGINT) AS dist
                   FROM bfs GROUP BY 1),
            nodes AS (SELECT COUNT(DISTINCT s) AS n FROM de)
            SELECT dist AS hops, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM md GROUP BY 1
            UNION ALL
            SELECT CAST(-1 AS BIGINT),
                   CAST(nodes.n - (SELECT COUNT(*) FROM md) AS BIGINT)
            FROM nodes
            WHERE nodes.n > (SELECT COUNT(*) FROM md)
            ORDER BY 1
        """,
        "parts_basket_lift": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT)
                        AS n_ord FROM op),
            pcnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n
                     FROM op GROUP BY 1),
            e AS (SELECT a.p AS id_a, b.p AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS w
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p
                  GROUP BY 1, 2)
            SELECT id_a, id_b, w AS n_both, ca.n AS n_a, cb.n AS n_b,
                   ROUND(CAST(w AS DOUBLE) / CAST(n_ord AS DOUBLE),
                         6) AS support,
                   ROUND(CAST(w AS DOUBLE) / CAST(ca.n AS DOUBLE), 6)
                       AS conf_a_b,
                   ROUND(CAST(w AS DOUBLE) / CAST(cb.n AS DOUBLE), 6)
                       AS conf_b_a,
                   ROUND(CAST(w * n_ord AS DOUBLE)
                         / CAST(ca.n * cb.n AS DOUBLE), 6) AS lift
            FROM e JOIN pcnt ca ON ca.p = e.id_a
                   JOIN pcnt cb ON cb.p = e.id_b, tot
            WHERE w >= 2
        """,
        "events_target_encoding": """
            WITH c AS (SELECT event_type,
                              CAST(SUM(CAST(round(value * 100)
                                            AS BIGINT)) AS BIGINT) AS s,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events WHERE value IS NOT NULL GROUP BY 1),
            t AS (SELECT CAST(SUM(s) AS HUGEINT) AS ts,
                         CAST(SUM(n) AS HUGEINT) AS tn FROM c)
            SELECT event_type, n,
                   ROUND(CAST(s * tn + 10 * ts AS DOUBLE)
                         / CAST((n + 10) * tn AS DOUBLE) / 100.0, 6)
                       AS enc
            FROM c, t
        """,
        "events_impute_median": """
            WITH m AS (SELECT event_type, median(value) AS med
                       FROM events WHERE value IS NOT NULL GROUP BY 1)
            SELECT e.event_id,
                   COALESCE(e.value, m.med) AS value_filled,
                   e.value IS NULL AS was_null
            FROM events e LEFT JOIN m USING (event_type)
        """,
        "embeddings_label_noise": """
            WITH q AS (SELECT vec_id, embedding, label
                       FROM embeddings WHERE vec_id < 16),
            nn AS (SELECT q.vec_id AS query_id,
                          CAST(q.label AS BIGINT) AS own_label,
                          CAST(c.label AS BIGINT) AS clab,
                          ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(
                                  q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) DESC,
                                  c.vec_id ASC) AS rank
                   FROM q CROSS JOIN embeddings c
                   WHERE c.vec_id <> q.vec_id)
            SELECT query_id, own_label,
                   CAST(COUNT(*) AS BIGINT) AS n_neighbors,
                   CAST(SUM(CASE WHEN clab <> own_label
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_disagree,
                   ROUND(CAST(SUM(CASE WHEN clab <> own_label
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS noise_frac
            FROM nn WHERE rank <= 10 GROUP BY 1, 2
        """,
        "events_change_point": """
            WITH c AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                                   AS BIGINT) AS d,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                         CAST(SUM(n) AS BIGINT) AS tot FROM c),
            r AS (SELECT d,
                         CAST(SUM(n) OVER (ORDER BY d) AS BIGINT)
                             AS cum,
                         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT)
                             AS i
                  FROM c)
            SELECT CAST(DATE '1970-01-01' + r.d * INTERVAL 1 DAY
                        AS TIMESTAMP) AS change_day,
                   ABS(r.cum * t.nd - r.i * t.tot) AS max_dev,
                   t.nd AS n_days,
                   t.tot AS total_events
            FROM r, t
            ORDER BY ABS(r.cum * t.nd - r.i * t.tot) DESC, r.d ASC
            LIMIT 1
        """,
        "events_rolling_1h_sum": """
            SELECT event_id, user_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                        AND CURRENT ROW)
                        AS BIGINT) AS sum_cents_1h
            FROM events WHERE value IS NOT NULL
        """,
        "events_session_timeout_sweep": """
            WITH g AS (SELECT user_id,
                              CAST(epoch_us(ts - LAG(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id)) AS BIGINT)
                                  AS gap
                       FROM events),
            u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
                  FROM events)
            SELECT CAST(t.t AS BIGINT) AS timeout_minutes,
                   CAST(u.nu + (SELECT COUNT(*) FROM g
                                WHERE gap > CAST(t.t AS BIGINT)
                                            * 60000000) AS BIGINT)
                       AS n_sessions
            FROM (VALUES (5), (15), (30), (60)) t(t), u
        """,
        "documents_jaccard_threshold_curve": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                    AS sh
                  FROM d WHERE len(toks) >= 3),
            sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM s a JOIN s b
                        ON a.sh = b.sh AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id),
            p AS (SELECT (10 * c) // (sa.n + sb.n - c) AS tier
                  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
                             JOIN sizes sb ON inter.id_b = sb.doc_id)
            SELECT CAST(t.t AS DOUBLE) / 10.0 AS threshold,
                   CAST((SELECT COUNT(*) FROM p WHERE p.tier >= t.t)
                        AS BIGINT) AS n_pairs
            FROM range(1, 11) AS t(t)
        """,
        "customers_skyline": """
            WITH a AS (SELECT c.c_custkey,
                              CAST(c.c_nationkey AS BIGINT)
                                  AS c_nationkey,
                              CAST(COUNT(o.o_orderkey) AS BIGINT)
                                  AS n_orders,
                              CAST(COALESCE(SUM(CAST(round(
                                   o.o_totalprice * 100) AS BIGINT)), 0)
                                   AS BIGINT) AS monetary_cents
                       FROM customer c
                       LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                       GROUP BY 1, 2)
            SELECT p.c_custkey, p.c_nationkey, p.n_orders,
                   p.monetary_cents
            FROM a p WHERE NOT EXISTS (
                SELECT 1 FROM a q
                WHERE q.c_nationkey = p.c_nationkey
                  AND q.n_orders >= p.n_orders
                  AND q.monetary_cents >= p.monetary_cents
                  AND (q.n_orders > p.n_orders
                       OR q.monetary_cents > p.monetary_cents))
        """,
        "events_scd2_intervals": """
            WITH s AS (SELECT user_id, event_type, ts, event_id,
                              CASE WHEN LAG(event_type) OVER (
                                       PARTITION BY user_id
                                       ORDER BY ts, event_id)
                                   IS DISTINCT FROM event_type
                                   THEN 1 ELSE 0 END AS chg
                       FROM events),
            i AS (SELECT user_id, event_type, ts,
                         SUM(chg) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS isl
                  FROM s),
            r AS (SELECT user_id, event_type,
                         CAST(isl AS BIGINT) AS run_idx,
                         MIN(ts) AS valid_from,
                         CAST(COUNT(*) AS BIGINT) AS n_events
                  FROM i GROUP BY 1, 2, 3)
            SELECT user_id, event_type, run_idx, valid_from,
                   LEAD(valid_from) OVER (PARTITION BY user_id
                       ORDER BY run_idx) AS valid_to,
                   n_events
            FROM r
        """,
        "customers_cdc_merge": """
            WITH l AS (SELECT o_custkey, o_orderstatus, o_totalprice,
                              ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
                       FROM orders)
            SELECT c.c_custkey, c.c_name,
                   CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
                   CASE WHEN l.o_custkey IS NULL THEN c.c_acctbal
                        ELSE l.o_totalprice END AS c_acctbal,
                   c.c_mktsegment
            FROM customer c
            LEFT JOIN (SELECT * FROM l WHERE rn = 1) l
                 ON c.c_custkey = l.o_custkey
            WHERE l.o_custkey IS NULL OR l.o_orderstatus <> 'F'
        """,
        "events_twap": """
            WITH s AS (SELECT user_id,
                              CAST(round(value * 100) AS BIGINT)
                                  AS cents,
                              (epoch_us(LEAD(ts) OVER (
                                   PARTITION BY user_id
                                   ORDER BY ts, event_id))
                               - epoch_us(ts)) // 1000000 AS dt_s
                       FROM events WHERE value IS NOT NULL)
            SELECT user_id,
                   CAST(SUM(cents * dt_s) AS BIGINT) AS num_cents_s,
                   CAST(SUM(dt_s) AS BIGINT) AS den_s,
                   CAST(SUM(cents * dt_s) AS DOUBLE)
                       / CAST(SUM(dt_s) AS DOUBLE) AS twap_cents
            FROM s WHERE dt_s IS NOT NULL
            GROUP BY user_id HAVING SUM(dt_s) > 0
        """,
        "events_survival_km": """
            WITH per AS (SELECT user_id,
                                MIN(epoch_us(ts)) AS t0,
                                MIN(CASE WHEN event_type = 'purchase'
                                    THEN epoch_us(ts) END) AS tp,
                                MAX(epoch_us(ts)) AS tl
                         FROM events GROUP BY user_id),
            t AS (SELECT CASE WHEN tp IS NOT NULL
                              THEN (tp - t0) // 86400000000
                              ELSE (tl - t0) // 86400000000 END
                              AS t_days,
                         (tp IS NOT NULL) AS ev
                  FROM per),
            g AS (SELECT t_days,
                         CAST(COUNT(*) FILTER (ev) AS BIGINT)
                             AS n_event,
                         CAST(COUNT(*) FILTER (NOT ev) AS BIGINT)
                             AS n_censored
                  FROM t GROUP BY t_days)
            SELECT t_days,
                   CAST(SUM(n_event + n_censored) OVER (
                        ORDER BY t_days DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS n_risk,
                   n_event, n_censored
            FROM g QUALIFY n_event > 0
        """,
        "ri_audit": """
            SELECT 'lineitem.l_orderkey->orders' AS relation,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER (p.o_orderkey IS NULL)
                        AS BIGINT) AS n_orphan_rows,
                   CAST(COUNT(DISTINCT CASE WHEN p.o_orderkey IS NULL
                        THEN c.l_orderkey END) AS BIGINT)
                        AS n_orphan_keys
            FROM lineitem c LEFT JOIN orders p
                 ON c.l_orderkey = p.o_orderkey
            UNION ALL
            SELECT 'lineitem.l_partkey->part',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (p.p_partkey IS NULL)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN p.p_partkey IS NULL
                        THEN c.l_partkey END) AS BIGINT)
            FROM lineitem c LEFT JOIN part p
                 ON c.l_partkey = p.p_partkey
            UNION ALL
            SELECT 'lineitem.l_suppkey->supplier',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (p.s_suppkey IS NULL)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN p.s_suppkey IS NULL
                        THEN c.l_suppkey END) AS BIGINT)
            FROM lineitem c LEFT JOIN supplier p
                 ON c.l_suppkey = p.s_suppkey
            UNION ALL
            SELECT 'orders.o_custkey->customer',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (p.c_custkey IS NULL)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN p.c_custkey IS NULL
                        THEN c.o_custkey END) AS BIGINT)
            FROM orders c LEFT JOIN customer p
                 ON c.o_custkey = p.c_custkey
            UNION ALL
            SELECT 'customer.c_nationkey->nation',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (p.n_nationkey IS NULL)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN p.n_nationkey IS NULL
                        THEN c.c_nationkey END) AS BIGINT)
            FROM customer c LEFT JOIN nation p
                 ON c.c_nationkey = p.n_nationkey
            UNION ALL
            SELECT 'supplier.s_nationkey->nation',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (p.n_nationkey IS NULL)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN p.n_nationkey IS NULL
                        THEN c.s_nationkey END) AS BIGINT)
            FROM supplier c LEFT JOIN nation p
                 ON c.s_nationkey = p.n_nationkey
            UNION ALL
            SELECT 'nation.n_regionkey->region',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (p.r_regionkey IS NULL)
                        AS BIGINT),
                   CAST(COUNT(DISTINCT CASE WHEN p.r_regionkey IS NULL
                        THEN c.n_regionkey END) AS BIGINT)
            FROM nation c LEFT JOIN region p
                 ON c.n_regionkey = p.r_regionkey
        """,
        "customers_table_diff": """
            WITH l AS (SELECT o_custkey, o_orderstatus, o_totalprice,
                              ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
                       FROM orders),
            m AS (SELECT c.c_custkey,
                         CASE WHEN l.o_custkey IS NULL THEN c.c_acctbal
                              ELSE l.o_totalprice END AS new_acctbal
                  FROM customer c
                  LEFT JOIN (SELECT * FROM l WHERE rn = 1) l
                       ON c.c_custkey = l.o_custkey
                  WHERE l.o_custkey IS NULL OR l.o_orderstatus <> 'F')
            SELECT c.c_custkey,
                   CASE WHEN m.c_custkey IS NULL THEN 'deleted'
                        WHEN m.new_acctbal IS DISTINCT FROM c.c_acctbal
                             THEN 'updated'
                        ELSE 'unchanged' END AS change_type,
                   c.c_acctbal AS old_acctbal,
                   m.new_acctbal
            FROM customer c LEFT JOIN m ON m.c_custkey = c.c_custkey
        """,
        "documents_keywords": """
            WITH tok AS (SELECT doc_id,
                                unnest(string_split(text, ' ')) AS term
                         FROM documents),
            tf AS (SELECT doc_id, term,
                          CAST(COUNT(*) AS BIGINT) AS tf
                   FROM tok GROUP BY 1, 2),
            df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                   FROM tf GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                  FROM documents),
            s AS (SELECT tf.doc_id, tf.term,
                         tf.tf * CAST(round(ln(CAST(n.n AS DOUBLE)
                             / CAST(df.df AS DOUBLE)) * 1000000)
                             AS BIGINT) AS score_q
                  FROM tf, df, n WHERE tf.term = df.term),
            r AS (SELECT doc_id, term, score_q,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score_q DESC, term ASC) AS rk
                  FROM s)
            SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, score_q
            FROM r WHERE rk <= 3
        """,
        "dq_audit": """
            SELECT 'orders.o_orderkey unique' AS check_name,
                   CAST(COUNT(*) AS BIGINT) AS n_checked,
                   CAST(COUNT(*) - COUNT(DISTINCT o_orderkey)
                        AS BIGINT) AS n_violations
            FROM orders
            UNION ALL
            SELECT 'customer.c_custkey unique',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
            FROM customer
            UNION ALL
            SELECT 'lineitem.(l_orderkey,l_linenumber) unique',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(DISTINCT
                        (l_orderkey, l_linenumber)) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'orders.o_orderstatus accepted_values',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (o_orderstatus NOT IN
                        ('O', 'F', 'P')) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'lineitem.l_returnflag accepted_values',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (l_returnflag NOT IN
                        ('A', 'N', 'R')) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.l_discount range_0_1',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (l_discount < 0
                        OR l_discount > 1) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.l_quantity positive',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (l_quantity <= 0
                        OR l_quantity IS NULL) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'events.value not_null',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (value IS NULL) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'events.ts not_null',
                   CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) FILTER (ts IS NULL) AS BIGINT)
            FROM events
        """,
        "events_funnel_timebound": """
            WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view
                       FROM events WHERE event_type = 'view'
                       GROUP BY 1),
            c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
                  FROM events e JOIN v ON v.user_id = e.user_id
                  WHERE e.event_type = 'click'
                    AND epoch_us(e.ts) > v.t_view
                    AND epoch_us(e.ts) <= v.t_view + 3600000000
                  GROUP BY 1),
            p AS (SELECT e.user_id
                  FROM events e JOIN c ON c.user_id = e.user_id
                  WHERE e.event_type = 'purchase'
                    AND epoch_us(e.ts) > c.t_click
                    AND epoch_us(e.ts) <= c.t_click + 86400000000
                  GROUP BY e.user_id)
            SELECT 'view' AS stage,
                   CAST(COUNT(*) AS BIGINT) AS n_users FROM v
            UNION ALL
            SELECT 'click_1h', CAST(COUNT(*) AS BIGINT) FROM c
            UNION ALL
            SELECT 'purchase_24h', CAST(COUNT(*) AS BIGINT) FROM p
        """,
        "events_top_paths": """
            WITH o AS (SELECT user_id, event_type,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
            p AS (SELECT user_id,
                         string_agg(event_type, '>' ORDER BY rn)
                             AS path
                  FROM o WHERE rn <= 3 GROUP BY user_id),
            c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
                  FROM p GROUP BY path)
            SELECT path, n_users FROM c
            ORDER BY n_users DESC, path LIMIT 10
        """,
        "events_daily_anomaly": """
            WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day_idx,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            w AS (SELECT day_idx, n,
                         CAST(SUM(n) OVER f AS BIGINT) AS sum7,
                         CAST(SUM(n * n) OVER f AS BIGINT) AS sumsq7,
                         COUNT(*) OVER f AS n_win
                  FROM d WINDOW f AS (ORDER BY day_idx
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
            SELECT day_idx, n, sum7, sumsq7,
                   CAST(7 * n - sum7 AS DOUBLE)
                       / (7 * sqrt(CAST(7 * sumsq7 - sum7 * sum7
                                        AS DOUBLE) / 42)) AS z
            FROM w
            WHERE n_win = 7 AND 7 * sumsq7 > sum7 * sum7
        """,
        "lineitem_zorder_stats": """
            WITH s0 AS (SELECT l_partkey % 65536 AS a,
                               l_suppkey % 65536 AS b
                        FROM lineitem),
            s1 AS (SELECT (a | (a << 8)) & 16711935 AS a,
                          (b | (b << 8)) & 16711935 AS b FROM s0),
            s2 AS (SELECT (a | (a << 4)) & 252645135 AS a,
                          (b | (b << 4)) & 252645135 AS b FROM s1),
            s3 AS (SELECT (a | (a << 2)) & 858993459 AS a,
                          (b | (b << 2)) & 858993459 AS b FROM s2),
            s4 AS (SELECT (a | (a << 1)) & 1431655765 AS a,
                          (b | (b << 1)) & 1431655765 AS b FROM s3),
            z AS (SELECT a | (b << 1) AS zval FROM s4)
            SELECT zval >> 24 AS zbucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(MIN(zval) AS BIGINT) AS zmin,
                   CAST(MAX(zval) AS BIGINT) AS zmax
            FROM z GROUP BY 1
        """,
        "events_user_streaks": """
            WITH d AS (SELECT DISTINCT user_id,
                              epoch_us(ts) // 86400000000 AS day
                       FROM events),
            r AS (SELECT user_id, day,
                         day - ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY day) AS anchor
                  FROM d),
            s AS (SELECT user_id, anchor, COUNT(*) AS len
                  FROM r GROUP BY 1, 2)
            SELECT a.user_id,
                   CAST(a.n_active_days AS BIGINT) AS n_active_days,
                   CAST(m.longest_streak AS BIGINT) AS longest_streak
            FROM (SELECT user_id, COUNT(*) AS n_active_days
                  FROM d GROUP BY 1) a
            JOIN (SELECT user_id, MAX(len) AS longest_streak
                  FROM s GROUP BY 1) m USING (user_id)
        """,
        "events_max_concurrent": """
            -- half-open [ts, ts+15m): +1/-1 boundary points collapsed
            -- per timestamp, so closes and opens at the same instant
            -- net out before the running sum (an interval ending
            -- exactly when another starts never overlaps it)
            WITH p AS (
                SELECT epoch_us(ts) AS t, 1 AS delta FROM events
                UNION ALL
                SELECT epoch_us(ts) + 900000000, -1 FROM events),
            c AS (SELECT t, SUM(delta) AS d FROM p GROUP BY t),
            r AS (SELECT t, SUM(d) OVER (ORDER BY t) AS conc FROM c)
            SELECT CAST(conc AS BIGINT) AS max_concurrent,
                   CAST(t AS BIGINT) AS at_ts
            FROM r ORDER BY conc DESC, t ASC LIMIT 1
        """,
        "events_cume_dist": """
            SELECT event_id, event_type, value,
                   ROUND(CUME_DIST() OVER (PARTITION BY event_type
                                           ORDER BY value), 6) AS cd
            FROM events
        """,
        "lineitem_weighted_median": """
            WITH g AS (SELECT l_returnflag,
                              CAST(round(l_extendedprice * 100) AS BIGINT)
                                  AS cents,
                              SUM(CAST(round(l_quantity) AS BIGINT)) AS w
                       FROM lineitem GROUP BY 1, 2),
            c AS (SELECT l_returnflag, cents, w,
                         SUM(w) OVER (PARTITION BY l_returnflag
                                      ORDER BY cents) AS cw,
                         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
                  FROM g)
            SELECT l_returnflag,
                   ROUND(CAST(MIN(CASE WHEN 2 * cw >= tw THEN cents END)
                              AS DOUBLE) / 100, 2) AS w_median,
                   CAST(ANY_VALUE(tw) AS BIGINT) AS tot_qty
            FROM c GROUP BY l_returnflag
        """,
        "orders_budget_allocation": """
            WITH li AS (SELECT l_orderkey,
                               CAST(l_linenumber AS BIGINT)
                                   AS l_linenumber,
                               SUM(CAST(round(l_extendedprice * 100)
                                        AS BIGINT)) AS cents
                        FROM lineitem GROUP BY 1, 2),
            o AS (SELECT o_orderkey,
                         (CAST(round(o_totalprice * 100) AS BIGINT) * 9)
                             // 10 AS cap
                  FROM orders),
            c AS (SELECT li.l_orderkey, li.l_linenumber, li.cents, o.cap,
                         COALESCE(SUM(li.cents) OVER (
                             PARTITION BY li.l_orderkey
                             ORDER BY li.l_linenumber
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS cumb
                  FROM li JOIN o ON li.l_orderkey = o.o_orderkey)
            SELECT l_orderkey, l_linenumber,
                   ROUND(CAST(cents AS DOUBLE) / 100, 2) AS tier_total,
                   ROUND(CAST(LEAST(cents, GREATEST(cap - cumb, 0))
                              AS DOUBLE) / 100, 2) AS alloc_amt
            FROM c
        """,
        "events_levene_test": """
            WITH v AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events),
            o AS (SELECT event_type, c,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY c) AS rn,
                         COUNT(*) OVER (PARTITION BY event_type) AS n
                  FROM v),
            m AS (SELECT event_type,
                         SUM(c * ((CASE WHEN rn = (n + 1) // 2
                                        THEN 1 ELSE 0 END)
                                + (CASE WHEN rn = (n + 2) // 2
                                        THEN 1 ELSE 0 END))) AS m2
                  FROM o GROUP BY 1),
            z AS (SELECT v.event_type, ABS(2 * v.c - m.m2) AS z
                  FROM v JOIN m USING (event_type)),
            g AS (SELECT
                CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
                CAST(SUM(z) FILTER (WHERE event_type = 'click') AS BIGINT) AS s_click,
                CAST(SUM(z * z) FILTER (WHERE event_type = 'click') AS BIGINT) AS ss_click,
                CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
                CAST(SUM(z) FILTER (WHERE event_type = 'error') AS BIGINT) AS s_error,
                CAST(SUM(z * z) FILTER (WHERE event_type = 'error') AS BIGINT) AS ss_error,
                CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                CAST(SUM(z) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS s_purchase,
                CAST(SUM(z * z) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS ss_purchase,
                CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
                CAST(SUM(z) FILTER (WHERE event_type = 'signup') AS BIGINT) AS s_signup,
                CAST(SUM(z * z) FILTER (WHERE event_type = 'signup') AS BIGINT) AS ss_signup,
                CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
                CAST(SUM(z) FILTER (WHERE event_type = 'view') AS BIGINT) AS s_view,
                CAST(SUM(z * z) FILTER (WHERE event_type = 'view') AS BIGINT) AS ss_view
                  FROM z),
            a AS (SELECT *, n_click + n_error + n_purchase + n_signup + n_view AS nn,
                         s_click + s_error + s_purchase + s_signup + s_view AS s_all,
                         ss_click + ss_error + ss_purchase + ss_signup + ss_view AS ss_all,
                         ((((CAST(s_click AS DOUBLE) * CAST(s_click AS DOUBLE) / CAST(n_click AS DOUBLE) + CAST(s_error AS DOUBLE) * CAST(s_error AS DOUBLE) / CAST(n_error AS DOUBLE)) + CAST(s_purchase AS DOUBLE) * CAST(s_purchase AS DOUBLE) / CAST(n_purchase AS DOUBLE)) + CAST(s_signup AS DOUBLE) * CAST(s_signup AS DOUBLE) / CAST(n_signup AS DOUBLE)) + CAST(s_view AS DOUBLE) * CAST(s_view AS DOUBLE) / CAST(n_view AS DOUBLE)) AS sb
                  FROM g),
            b AS (SELECT *,
                         sb - CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)
                              / CAST(nn AS DOUBLE) AS ssb,
                         CAST(ss_all AS DOUBLE) - sb AS ssw
                  FROM a)
            SELECT (ssb / 4.0) / (ssw / CAST(nn - 5 AS DOUBLE)) AS f_stat,
                   CAST(4 AS BIGINT) AS dof_between,
                   CAST(nn - 5 AS BIGINT) AS dof_within,
                   CAST(nn AS BIGINT) AS n_events
            FROM b
        """,
        "documents_prefix_dedup": """
            WITH k AS (SELECT doc_id,
                              substr(trim(regexp_replace(regexp_replace(
                                   lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')), 1, 64) AS k
                       FROM documents)
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM k GROUP BY k
        """,
        "events_wilson_ci": """
            WITH g AS (SELECT event_type,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(*) FILTER (isodow(ts) >= 6)
                                   AS BIGINT) AS k
                       FROM events GROUP BY 1),
            f AS (SELECT *,
                         CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                         1.0 + (1.96*1.96) / CAST(n AS DOUBLE) AS denom
                  FROM g)
            SELECT event_type, n AS n_events, k AS n_weekend,
                   p AS p_weekend,
                   (p + (1.96*1.96) / (2.0 * CAST(n AS DOUBLE))) / denom
                   - 1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                       + (1.96*1.96) / (4.0 * CAST(n AS DOUBLE)
                                        * CAST(n AS DOUBLE))) / denom
                       AS ci_lo,
                   (p + (1.96*1.96) / (2.0 * CAST(n AS DOUBLE))) / denom
                   + 1.96 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                       + (1.96*1.96) / (4.0 * CAST(n AS DOUBLE)
                                        * CAST(n AS DOUBLE))) / denom
                       AS ci_hi
            FROM f
        """,
        "events_cohens_d": """
            WITH z AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events
                       WHERE event_type IN ('purchase', 'view')
                         AND value IS NOT NULL),
            g AS (SELECT CAST(COUNT(*) FILTER (event_type = 'purchase')
                              AS BIGINT) AS n1,
                         CAST(SUM(c) FILTER (event_type = 'purchase')
                              AS BIGINT) AS s1,
                         CAST(SUM(c * c) FILTER (event_type = 'purchase')
                              AS BIGINT) AS ss1,
                         CAST(COUNT(*) FILTER (event_type = 'view')
                              AS BIGINT) AS n2,
                         CAST(SUM(c) FILTER (event_type = 'view')
                              AS BIGINT) AS s2,
                         CAST(SUM(c * c) FILTER (event_type = 'view')
                              AS BIGINT) AS ss2
                  FROM z),
            m AS (SELECT *,
                         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
                         CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
                         (CAST(ss1 AS DOUBLE) - (CAST(s1 AS DOUBLE)
                              * CAST(s1 AS DOUBLE)) / CAST(n1 AS DOUBLE))
                             / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
                         (CAST(ss2 AS DOUBLE) - (CAST(s2 AS DOUBLE)
                              * CAST(s2 AS DOUBLE)) / CAST(n2 AS DOUBLE))
                             / (CAST(n2 AS DOUBLE) - 1.0) AS v2
                  FROM g)
            SELECT n1 AS n_purchase, n2 AS n_view,
                   m1 AS mean_purchase_cents, m2 AS mean_view_cents,
                   (m1 - m2) / sqrt(((CAST(n1 AS DOUBLE) - 1.0) * v1
                        + (CAST(n2 AS DOUBLE) - 1.0) * v2)
                        / (CAST(n1 + n2 AS DOUBLE) - 2.0)) AS cohens_d
            FROM m
        """,
        "events_weekend_ztest": """
            WITH g AS (SELECT (isodow(ts) >= 6) AS wk,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(*) FILTER (
                                   event_type = 'purchase') AS BIGINT) AS k
                       FROM events GROUP BY 1),
            w AS (SELECT MAX(n) FILTER (wk) AS n1,
                         MAX(k) FILTER (wk) AS k1,
                         MAX(n) FILTER (NOT wk) AS n2,
                         MAX(k) FILTER (NOT wk) AS k2
                  FROM g),
            f AS (SELECT *,
                         CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                         CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
                         CAST(k1 + k2 AS DOUBLE)
                             / CAST(n1 + n2 AS DOUBLE) AS pp
                  FROM w)
            SELECT n1 AS n_weekend, k1 AS k_weekend,
                   n2 AS n_weekday, k2 AS k_weekday,
                   p1 AS p_weekend, p2 AS p_weekday,
                   (p1 - p2) / sqrt(pp * (1.0 - pp)
                       * (1.0 / CAST(n1 AS DOUBLE)
                          + 1.0 / CAST(n2 AS DOUBLE))) AS z_two_prop
            FROM f
        """,
        "events_dow_seasonality": """
            WITH g AS (SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1)
            SELECT isodow, n AS n_events,
                   CAST(n AS DOUBLE)
                       / CAST(SUM(n) OVER () AS DOUBLE) AS share,
                   CAST(n AS DOUBLE)
                       / CAST(SUM(n) OVER () AS DOUBLE) * 7.0
                       AS seasonal_index
            FROM g
        """,
        "events_seasonal_adjust": """
            WITH d AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            w AS (SELECT day, n,
                         CAST(isodow(day) AS BIGINT) AS isodow,
                         SUM(n) OVER (PARTITION BY isodow(day)) AS dn,
                         SUM(n) OVER () AS tn
                  FROM d)
            SELECT day, n AS n_events, isodow,
                   CAST(dn AS DOUBLE) / CAST(tn AS DOUBLE) * 7.0
                       AS seasonal_index,
                   CAST(n AS DOUBLE)
                       / (CAST(dn AS DOUBLE) / CAST(tn AS DOUBLE) * 7.0)
                       AS adjusted_events
            FROM w
        """,
        "events_wow_growth": """
            WITH w AS (SELECT date_trunc('week', ts) AS week,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            l AS (SELECT week, n,
                         LAG(n) OVER (ORDER BY week) AS prev
                  FROM w)
            SELECT week, n AS n_events,
                   CAST(prev AS BIGINT) AS prev_events,
                   CAST(n - prev AS DOUBLE) / CAST(prev AS DOUBLE)
                       AS wow_growth
            FROM l WHERE prev IS NOT NULL
        """,
        "documents_nb_classify": """
            WITH t AS (SELECT doc_id, source,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
            ctc AS (SELECT source AS cls, tok,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM t GROUP BY 1, 2),
            q AS (SELECT cls, tok,
                         CAST(round(ln(CAST(c + 1 AS DOUBLE)) * 1000000)
                              AS BIGINT) AS q1
                  FROM ctc),
            v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS vsz
                  FROM t),
            z AS (SELECT cls,
                         CAST(round(ln(CAST(SUM(c) + (SELECT vsz FROM v)
                                            AS DOUBLE)) * 1000000)
                              AS BIGINT) AS qz
                  FROM ctc GROUP BY cls),
            d AS (SELECT doc_id, source,
                         CAST(COUNT(*) AS BIGINT) AS n_tokens
                  FROM t GROUP BY 1, 2),
            j AS (SELECT t.doc_id, q.cls,
                         CAST(SUM(q.q1) AS BIGINT) AS s
                  FROM t JOIN q ON t.tok = q.tok GROUP BY 1, 2),
            sc AS (SELECT d.doc_id, d.source, z.cls,
                          COALESCE(j.s, 0) - d.n_tokens * z.qz AS score
                   FROM d CROSS JOIN z
                   LEFT JOIN j ON j.doc_id = d.doc_id
                              AND j.cls = z.cls),
            p AS (SELECT doc_id, source, cls AS predicted,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, cls ASC) AS rn
                  FROM sc)
            SELECT source, predicted,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM p WHERE rn = 1 GROUP BY 1, 2
        """,
        "documents_js_divergence": """
            WITH t AS (SELECT source, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
                   FROM t GROUP BY 1, 2),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_t
                   FROM t GROUP BY tok),
            ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s
                   FROM st GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM t),
            r AS (SELECT st.source, st.c_st, tf.c_t, ns.n_s,
                         CAST(st.c_st AS DOUBLE)
                             / CAST(ns.n_s AS DOUBLE) AS p,
                         CAST(tf.c_t AS DOUBLE)
                             / CAST((SELECT nt FROM n) AS DOUBLE) AS q
                  FROM st JOIN tf USING (tok) JOIN ns USING (source)),
            g AS (SELECT source,
                         CAST(SUM(c_st * CAST(round(
                             ln(2.0 * p / (p + q)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s1,
                         CAST(SUM(c_t * CAST(round(
                             ln(2.0 * q / (p + q)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s2,
                         CAST(SUM(c_t) AS BIGINT) AS cc,
                         CAST(MAX(n_s) AS BIGINT) AS n_s
                  FROM r GROUP BY source)
            SELECT source, n_s AS n_tokens,
                   ROUND(0.5 * (CAST(s1 AS DOUBLE) / 1000000.0
                                    / CAST(n_s AS DOUBLE)
                                + CAST(s2 AS DOUBLE) / 1000000.0
                                    / CAST((SELECT nt FROM n)
                                           AS DOUBLE))
                         + 0.5 * ln(2.0)
                             * (1.0 - CAST(cc AS DOUBLE)
                                / CAST((SELECT nt FROM n) AS DOUBLE)),
                         6) AS js_vs_corpus
            FROM g
        """,
        "events_markov_stationary": """
            WITH RECURSIVE
            w AS (SELECT user_id, event_type,
                         LAG(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_type
                  FROM events),
            c AS (SELECT prev_type AS i, event_type AS j,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM w WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            st AS (SELECT DISTINCT s FROM (
                       SELECT i AS s FROM c
                       UNION ALL SELECT j FROM c)),
            ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM st),
            tots AS (SELECT i, CAST(SUM(n) AS BIGINT) AS tot
                     FROM c GROUP BY i),
            e AS (SELECT c.i, c.j, c.n AS num, tots.tot AS den
                  FROM c JOIN tots USING (i)
                  UNION ALL
                  SELECT a.s, b.s, CAST(1 AS BIGINT),
                         (SELECT k FROM ns)
                  FROM st a, st b
                  WHERE a.s NOT IN (SELECT i FROM tots)),
            v(it, s, val) AS (
                SELECT 0, s,
                       CAST(round(1000000000000.0
                            / CAST((SELECT k FROM ns) AS DOUBLE))
                            AS BIGINT)
                FROM st
                UNION ALL
                SELECT it + 1, e.j,
                       CAST(SUM(CAST(round(CAST(v.val AS DOUBLE)
                           * CAST(e.num AS DOUBLE)
                           / CAST(e.den AS DOUBLE)) AS BIGINT))
                           AS BIGINT)
                FROM v JOIN e ON v.s = e.i
                WHERE v.it < 20
                GROUP BY 1, 2
            )
            SELECT s AS event_type, val AS pi_q,
                   CAST(val AS DOUBLE) / 1000000000000.0 AS pi
            FROM v WHERE it = 20
        """,
        "documents_sentence_stats": """
            WITH s AS (SELECT source,
                              unnest(string_split_regex(text, '[.!?]+'))
                                  AS piece
                       FROM documents),
            c AS (SELECT source, trim(piece) AS p FROM s),
            f AS (SELECT source,
                         CAST(COUNT(*) AS BIGINT) AS n_sentences,
                         CAST(SUM(length(p)) AS BIGINT) AS sum_chars
                  FROM c WHERE p <> '' GROUP BY 1),
            d AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                  FROM documents GROUP BY 1)
            SELECT d.source, d.n_docs, f.n_sentences,
                   CAST(f.sum_chars AS DOUBLE)
                       / CAST(f.n_sentences AS DOUBLE)
                       AS avg_sentence_chars,
                   CAST(f.n_sentences AS DOUBLE)
                       / CAST(d.n_docs AS DOUBLE) AS sentences_per_doc
            FROM d JOIN f USING (source)
        """,
        "embeddings_rrf_fusion": """
            WITH s AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
                              CAST(round(list_cosine_similarity(
                                  q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) * 1000000)
                                  AS BIGINT) AS qcos,
                              CAST(round(list_dot_product(
                                  q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) * 1000000)
                                  AS BIGINT) AS qdot
                       FROM embeddings q CROSS JOIN embeddings c
                       WHERE q.vec_id < 8),
            rc AS (SELECT qid, vid,
                          CAST(ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY qcos DESC, vid ASC) AS BIGINT)
                              AS r
                   FROM s QUALIFY r <= 20),
            rdd AS (SELECT qid, vid,
                           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                               ORDER BY qdot DESC, vid ASC) AS BIGINT)
                               AS r
                    FROM s QUALIFY r <= 20),
            f AS (SELECT COALESCE(rc.qid, rdd.qid) AS qid,
                         COALESCE(rc.vid, rdd.vid) AS vid,
                         COALESCE(1.0 / (60.0 + CAST(rc.r AS DOUBLE)),
                                  0.0)
                             + COALESCE(1.0 / (60.0
                                   + CAST(rdd.r AS DOUBLE)), 0.0)
                             AS rrf
                  FROM rc FULL OUTER JOIN rdd
                  ON rc.qid = rdd.qid AND rc.vid = rdd.vid)
            SELECT qid AS query_id, vid AS vec_id, rrf, rank
            FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY rrf DESC, vid ASC) AS BIGINT) AS rank
                  FROM f)
            WHERE rank <= 10
        """,
        "events_daily_holt": """
            WITH RECURSIVE
            d AS (SELECT date_trunc('day', ts) AS day,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM events GROUP BY 1),
            r AS (SELECT day, n,
                         CAST(ROW_NUMBER() OVER (ORDER BY day)
                              AS BIGINT) AS rn
                  FROM d),
            h(rn, l, b) AS (
                SELECT CAST(1 AS BIGINT), n * 1000000,
                       CAST(0 AS BIGINT)
                FROM r WHERE rn = 1
                UNION ALL
                SELECT h.rn + 1,
                       CAST(round((CAST(r.n * 1000000 AS DOUBLE)
                           + CAST(h.l + h.b AS DOUBLE)) / 2.0)
                           AS BIGINT),
                       CAST(round((CAST(CAST(round((
                               CAST(r.n * 1000000 AS DOUBLE)
                               + CAST(h.l + h.b AS DOUBLE)) / 2.0)
                               AS BIGINT) - h.l AS DOUBLE)
                           + CAST(h.b AS DOUBLE)) / 2.0) AS BIGINT)
                FROM h JOIN r ON r.rn = h.rn + 1
            )
            SELECT r.day, r.n AS n_events,
                   CAST(h.l AS DOUBLE) / 1000000.0 AS level,
                   CAST(h.b AS DOUBLE) / 1000000.0 AS trend,
                   CAST(h.l + h.b AS DOUBLE) / 1000000.0
                       AS forecast_next
            FROM h JOIN r USING (rn)
        """,
        "events_logit_purchase": """
            WITH RECURSIVE
            cells AS (SELECT CAST(isodow(ts) >= 6 AS BIGINT) AS x1,
                             CAST(hour(ts) >= 18 AS BIGINT) AS x2,
                             CAST(event_type = 'purchase' AS BIGINT)
                                 AS y,
                             CAST(COUNT(*) AS BIGINT) AS cnt
                      FROM events GROUP BY 1, 2, 3),
            nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
            w(it, w0, w1, w2) AS (
                SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                       CAST(0 AS BIGINT)
                UNION ALL
                SELECT it + 1,
                       w0 - CAST(round(0.5 * (CAST(g0 AS DOUBLE)
                            / CAST((SELECT n FROM nn) AS DOUBLE)))
                            AS BIGINT),
                       w1 - CAST(round(0.5 * (CAST(g1 AS DOUBLE)
                            / CAST((SELECT n FROM nn) AS DOUBLE)))
                            AS BIGINT),
                       w2 - CAST(round(0.5 * (CAST(g2 AS DOUBLE)
                            / CAST((SELECT n FROM nn) AS DOUBLE)))
                            AS BIGINT)
                FROM (SELECT it, w0, w1, w2,
                             CAST(SUM(qr * cnt) AS BIGINT) AS g0,
                             CAST(SUM(qr * cnt * x1) AS BIGINT) AS g1,
                             CAST(SUM(qr * cnt * x2) AS BIGINT) AS g2
                      FROM (SELECT w.it, w.w0, w.w1, w.w2,
                                   c.cnt, c.x1, c.x2,
                                   CAST(round((1.0 / (1.0 + exp(-(
                                        CAST(w.w0 + w.w1 * c.x1
                                             + w.w2 * c.x2 AS DOUBLE)
                                        / 1000000000.0)))
                                        - CAST(c.y AS DOUBLE))
                                        * 1000000000) AS BIGINT) AS qr
                            FROM w, cells c WHERE w.it < 50)
                      GROUP BY 1, 2, 3, 4)),
            fin AS (SELECT w0, w1, w2 FROM w WHERE it = 50),
            sc AS (SELECT c.cnt, c.y,
                          1.0 / (1.0 + exp(-(CAST(f.w0 + f.w1 * c.x1
                               + f.w2 * c.x2 AS DOUBLE)
                               / 1000000000.0))) AS s
                   FROM cells c, fin f),
            ll AS (SELECT CAST(SUM(cnt * CASE WHEN y = 1
                           THEN CAST(round(ln(s) * 1000000) AS BIGINT)
                           ELSE CAST(round(ln(1.0 - s) * 1000000)
                                     AS BIGINT)
                           END) AS BIGINT) AS num
                   FROM sc)
            SELECT nn.n AS n_events,
                   CAST(f.w0 AS DOUBLE) / 1000000000.0 AS w_intercept,
                   CAST(f.w1 AS DOUBLE) / 1000000000.0 AS w_weekend,
                   CAST(f.w2 AS DOUBLE) / 1000000000.0 AS w_evening,
                   -(CAST(ll.num AS DOUBLE) / 1000000.0)
                       / CAST(nn.n AS DOUBLE) AS log_loss
            FROM fin f, ll, nn
        """,
        "customers_golden_record": """
            WITH RECURSIVE
            names AS (SELECT DISTINCT c_name FROM customer),
            p AS (SELECT a.c_name AS na, b.c_name AS nb
                  FROM customer a, customer b
                  WHERE a.c_name < b.c_name
                    AND a.c_nationkey = b.c_nationkey
                    AND levenshtein(a.c_name, b.c_name) = 1),
            e AS (SELECT na AS a, nb AS b FROM p
                  UNION ALL SELECT nb, na FROM p),
            r AS (SELECT c_name AS id, c_name AS reach FROM names
                  UNION
                  SELECT r.id, e.b FROM r JOIN e ON r.reach = e.a),
            rep AS (SELECT id AS c_name, MIN(reach) AS rep
                    FROM r GROUP BY id),
            m AS (SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
                         rep.rep
                  FROM customer c JOIN rep USING (c_name)),
            surv AS (SELECT rep,
                            CAST(MIN(c_custkey) AS BIGINT)
                                AS canonical_custkey,
                            CAST(COUNT(*) AS BIGINT) AS n_members,
                            CAST(MAX(CAST(round(c_acctbal * 100)
                                 AS BIGINT)) AS BIGINT)
                                AS max_acctbal_cents,
                            MAX(c_mktsegment) AS top_segment,
                            MAX(lpad(CAST(CAST(round(c_acctbal * 100)
                                     AS BIGINT) + 10000000 AS VARCHAR),
                                     10, '0')
                                || lpad(CAST(c_custkey AS VARCHAR),
                                        12, '0')) AS packed
                     FROM m GROUP BY rep)
            SELECT rep AS rep_name, canonical_custkey, n_members,
                   max_acctbal_cents, top_segment,
                   CAST(substr(packed, 11) AS BIGINT)
                       AS richest_custkey
            FROM surv
        """,
        "events_hour_dow_heatmap": """
            WITH g AS (SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
                              CAST(hour(ts) AS BIGINT) AS hour,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2)
            SELECT isodow, hour, n AS n_events,
                   CAST(n AS DOUBLE)
                       / CAST(SUM(n) OVER (PARTITION BY isodow)
                              AS DOUBLE) AS share_of_dow
            FROM g
        """,
        "embeddings_silhouette": """
            WITH dims AS (SELECT e.vec_id, e.label, t.i AS dim,
                                 CAST(e.embedding[t.i] AS DOUBLE) AS x
                          FROM embeddings e,
                               unnest(range(1, 65)) AS t(i)),
            cent AS (SELECT label, dim,
                            CAST(SUM(CAST(round(x * 1073741824.0)
                                 AS BIGINT)) AS BIGINT) AS s,
                            CAST(COUNT(*) AS BIGINT) AS n
                     FROM dims GROUP BY 1, 2),
            mu AS (SELECT label AS c_label, dim,
                          (CAST(s AS DOUBLE) / 1073741824.0)
                              / CAST(n AS DOUBLE) AS m
                   FROM cent),
            d2 AS (SELECT d.vec_id, d.label AS row_label, mu.c_label,
                          CAST(SUM(CAST(round((d.x - mu.m)
                               * (d.x - mu.m) * 1000000000000.0)
                               AS BIGINT)) AS BIGINT) AS sq
                   FROM dims d JOIN mu ON d.dim = mu.dim
                   GROUP BY 1, 2, 3),
            ab AS (SELECT vec_id, row_label,
                          MAX(CASE WHEN c_label = row_label
                              THEN sq END) AS a_sq,
                          MIN(CASE WHEN c_label <> row_label
                              THEN sq END) AS b_sq
                   FROM d2 GROUP BY 1, 2),
            sv AS (SELECT row_label AS label,
                          sqrt(CAST(a_sq AS DOUBLE)
                               / 1000000000000.0) AS a,
                          sqrt(CAST(b_sq AS DOUBLE)
                               / 1000000000000.0) AS b
                   FROM ab),
            qv AS (SELECT label,
                          CAST(round((CASE WHEN GREATEST(a, b) = 0.0
                               THEN 0.0
                               ELSE (b - a) / GREATEST(a, b) END)
                               * 1000000000) AS BIGINT) AS qs
                   FROM sv)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(COUNT(*) AS BIGINT) AS n_vectors,
                   (CAST(SUM(qs) AS DOUBLE) / 1000000000.0)
                       / CAST(COUNT(*) AS DOUBLE) AS mean_silhouette
            FROM qv GROUP BY 1
        """,
        "documents_simpson_diversity": """
            WITH t AS (SELECT source, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM t GROUP BY 1, 2)
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE)
                       / (CAST(SUM(c) AS DOUBLE)
                          * (CAST(SUM(c) AS DOUBLE) - 1.0))
                       AS simpson_diversity
            FROM st GROUP BY source
        """,
        "orders_backlog_curve": """
            WITH o AS (SELECT o_orderdate AS day,
                              CAST(COUNT(*) AS BIGINT) AS n_opened
                       FROM orders GROUP BY 1),
            last_ship AS (SELECT l_orderkey, MAX(l_shipdate) AS d
                          FROM lineitem GROUP BY 1),
            c AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT)
                          AS n_closed
                  FROM last_ship GROUP BY 1),
            g AS (SELECT COALESCE(o.day, c.day) AS day,
                         COALESCE(o.n_opened, 0) AS n_opened,
                         COALESCE(c.n_closed, 0) AS n_closed
                  FROM o FULL OUTER JOIN c ON o.day = c.day)
            SELECT day,
                   CAST(n_opened AS BIGINT) AS n_opened,
                   CAST(n_closed AS BIGINT) AS n_closed,
                   CAST(SUM(n_opened - n_closed)
                        OVER (ORDER BY day) AS BIGINT) AS open_backlog
            FROM g
        """,
        "documents_decision_stump": """
            WITH g AS (SELECT n_chars AS x,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(*) FILTER (lang = 'en')
                                   AS BIGINT) AS p
                       FROM documents GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                           CAST(SUM(p) AS BIGINT) AS pp
                    FROM g),
            pre AS (SELECT x,
                           CAST(SUM(n) OVER (ORDER BY x) AS BIGINT)
                               AS nl,
                           CAST(SUM(p) OVER (ORDER BY x) AS BIGINT)
                               AS pl
                    FROM g),
            s AS (SELECT x, nl, pl,
                         tot.nn - nl AS nr, tot.pp - pl AS pr,
                         tot.nn AS nn
                  FROM pre, tot WHERE nl < tot.nn),
            r AS (SELECT x, nl, nr, nn,
                         CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)
                             AS plr,
                         CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE)
                             AS prr
                  FROM s),
            w AS (SELECT x, nl, nr,
                         (CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE))
                             * (1.0 - plr * plr
                                - (1.0 - plr) * (1.0 - plr))
                         + (CAST(nr AS DOUBLE) / CAST(nn AS DOUBLE))
                             * (1.0 - prr * prr
                                - (1.0 - prr) * (1.0 - prr)) AS wg
                  FROM r),
            b0 AS (SELECT 1.0
                          - (CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))
                              * (CAST(pp AS DOUBLE)
                                 / CAST(nn AS DOUBLE))
                          - (1.0 - CAST(pp AS DOUBLE)
                                 / CAST(nn AS DOUBLE))
                              * (1.0 - CAST(pp AS DOUBLE)
                                     / CAST(nn AS DOUBLE)) AS g0
                   FROM tot)
            SELECT x AS split_threshold, nl AS n_left, nr AS n_right,
                   wg AS weighted_gini,
                   (SELECT g0 FROM b0) AS baseline_gini
            FROM w ORDER BY wg, x LIMIT 1
        """,
        "events_entropy_rate": """
            WITH RECURSIVE
            w AS (SELECT user_id, event_type,
                         LAG(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_type
                  FROM events),
            c AS (SELECT prev_type AS i, event_type AS j,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM w WHERE prev_type IS NOT NULL GROUP BY 1, 2),
            st AS (SELECT DISTINCT s FROM (
                       SELECT i AS s FROM c
                       UNION ALL SELECT j FROM c)),
            ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM st),
            tots AS (SELECT i, CAST(SUM(n) AS BIGINT) AS tot
                     FROM c GROUP BY i),
            e AS (SELECT c.i, c.j, c.n AS num, tots.tot AS den
                  FROM c JOIN tots USING (i)
                  UNION ALL
                  SELECT a.s, b.s, CAST(1 AS BIGINT),
                         (SELECT k FROM ns)
                  FROM st a, st b
                  WHERE a.s NOT IN (SELECT i FROM tots)),
            v(it, s, val) AS (
                SELECT 0, s,
                       CAST(round(1000000000000.0
                            / CAST((SELECT k FROM ns) AS DOUBLE))
                            AS BIGINT)
                FROM st
                UNION ALL
                SELECT it + 1, e.j,
                       CAST(SUM(CAST(round(CAST(v.val AS DOUBLE)
                           * CAST(e.num AS DOUBLE)
                           / CAST(e.den AS DOUBLE)) AS BIGINT))
                           AS BIGINT)
                FROM v JOIN e ON v.s = e.i
                WHERE v.it < 20
                GROUP BY 1, 2
            ),
            pi AS (SELECT s, CAST(val AS DOUBLE) / 1000000000000.0
                              AS pi
                   FROM v WHERE it = 20),
            h AS (SELECT CAST(SUM(CAST(round((pi.pi
                       * (CAST(c.n AS DOUBLE)
                          / CAST(tots.tot AS DOUBLE))
                       * ln(CAST(c.n AS DOUBLE)
                            / CAST(tots.tot AS DOUBLE)))
                       * 1000000000000.0) AS BIGINT)) AS BIGINT) AS hq
                  FROM c JOIN tots USING (i)
                  JOIN pi ON pi.s = c.i)
            SELECT (SELECT k FROM ns) AS n_states,
                   -(CAST(hq AS DOUBLE) / 1000000000000.0)
                       AS entropy_rate_nats,
                   ln(CAST((SELECT k FROM ns) AS DOUBLE))
                       AS max_entropy_nats
            FROM h
        """,
        "events_weekly_churn": """
            WITH uw AS (SELECT DISTINCT user_id,
                               date_trunc('week', ts) AS week
                        FROM events),
            prv AS (SELECT user_id AS user_id_r,
                           week + INTERVAL 7 DAY AS week_r
                    FROM uw),
            f AS (SELECT COALESCE(c.week, p.week_r) AS week,
                         CAST(c.user_id IS NOT NULL
                              AND p.user_id_r IS NOT NULL AS BIGINT)
                             AS ret,
                         CAST(c.user_id IS NOT NULL
                              AND p.user_id_r IS NULL AS BIGINT)
                             AS new,
                         CAST(c.user_id IS NULL
                              AND p.user_id_r IS NOT NULL AS BIGINT)
                             AS chu
                  FROM uw c FULL OUTER JOIN prv p
                  ON c.week = p.week_r AND c.user_id = p.user_id_r),
            g AS (SELECT week,
                         CAST(SUM(ret) AS BIGINT) AS n_retained,
                         CAST(SUM(new) AS BIGINT) AS n_new,
                         CAST(SUM(chu) AS BIGINT) AS n_churned
                  FROM f GROUP BY week)
            SELECT week,
                   n_retained + n_new AS n_active,
                   n_retained, n_new, n_churned,
                   CAST(n_churned AS DOUBLE)
                       / CAST(n_retained + n_churned AS DOUBLE)
                       AS churn_rate
            FROM g
            WHERE n_retained + n_churned > 0
              AND n_retained + n_new > 0
        """,
        "embeddings_hubness": """
            WITH s AS (SELECT q.vec_id AS qid, c.vec_id AS vid,
                              CAST(round(list_cosine_similarity(
                                  q.embedding::DOUBLE[],
                                  c.embedding::DOUBLE[]) * 1000000)
                                  AS BIGINT) AS qcos
                       FROM embeddings q CROSS JOIN embeddings c
                       WHERE q.vec_id <> c.vec_id),
            r AS (SELECT qid, vid,
                         ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY qcos DESC, vid ASC) AS rk
                  FROM s),
            nb AS (SELECT vid FROM r WHERE rk <= 5),
            deg AS (SELECT e.vec_id,
                           CAST(COUNT(nb.vid) AS BIGINT) AS d
                    FROM embeddings e LEFT JOIN nb
                    ON nb.vid = e.vec_id GROUP BY 1)
            SELECT d AS in_degree, CAST(COUNT(*) AS BIGINT)
                       AS n_vectors
            FROM deg GROUP BY 1
        """,
        "events_mann_kendall": """
            WITH d AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM d),
            s AS (SELECT CAST(SUM(CASE WHEN b.n > a.n THEN 1
                                       WHEN b.n < a.n THEN -1
                                       ELSE 0 END) AS BIGINT) AS s_stat
                  FROM d a JOIN d b ON a.day < b.day),
            ties AS (SELECT CAST(COALESCE(SUM(tk * (tk - 1)
                                 * (2 * tk + 5)), 0) AS BIGINT) AS tt
                     FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tk
                           FROM d GROUP BY n) WHERE tk > 1),
            v AS (SELECT CAST(m.m * (m.m - 1) * (2 * m.m + 5)
                              - ties.tt AS DOUBLE) / 18.0 AS var_s
                  FROM m, ties)
            SELECT m.m AS n_days, s.s_stat,
                   v.var_s,
                   CASE WHEN s.s_stat > 0
                        THEN (CAST(s.s_stat AS DOUBLE) - 1.0)
                             / sqrt(v.var_s)
                        WHEN s.s_stat < 0
                        THEN (CAST(s.s_stat AS DOUBLE) + 1.0)
                             / sqrt(v.var_s)
                        ELSE 0.0 END AS z_mk
            FROM m, s, v
        """,
        "orders_dupe_audit": """
            WITH g AS (SELECT o_custkey,
                              o_orderdate AS day,
                              CAST(COUNT(*) AS BIGINT) AS n_orders,
                              CAST(MIN(CAST(round(o_totalprice * 100)
                                   AS BIGINT)) AS BIGINT)
                                  AS min_total_cents,
                              CAST(MAX(CAST(round(o_totalprice * 100)
                                   AS BIGINT)) AS BIGINT)
                                  AS max_total_cents,
                              CAST(MIN(o_orderkey) AS BIGINT)
                                  AS first_orderkey,
                              CAST(MAX(o_orderkey) AS BIGINT)
                                  AS last_orderkey
                       FROM orders GROUP BY 1, 2)
            SELECT o_custkey, day, n_orders, min_total_cents,
                   max_total_cents, first_orderkey, last_orderkey
            FROM g WHERE n_orders > 1
        """,
        "lineitem_abc_classes": """
            WITH pr AS (SELECT l_partkey AS p,
                               CAST(SUM(CAST(round(l_extendedprice
                                    * (1 - l_discount) * 10000)
                                    AS BIGINT)) AS BIGINT) AS r
                        FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(SUM(r) AS BIGINT) AS tot FROM pr),
            c AS (SELECT p, r,
                         CAST(SUM(r) OVER (ORDER BY r DESC, p ASC)
                              AS BIGINT) AS cum
                  FROM pr),
            k AS (SELECT r,
                         CASE WHEN cum * 5 <= (SELECT tot FROM t) * 4
                              THEN 'A'
                              WHEN cum * 20 <= (SELECT tot FROM t) * 19
                              THEN 'B'
                              ELSE 'C' END AS abc_class
                  FROM c)
            SELECT abc_class,
                   CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(CAST(SUM(r) AS BIGINT) AS DOUBLE) / 10000.0
                       AS revenue,
                   CAST(CAST(SUM(r) AS BIGINT) AS DOUBLE)
                       / CAST((SELECT tot FROM t) AS DOUBLE)
                       AS revenue_share
            FROM k GROUP BY 1
        """,
        "documents_robust_scale": """
            WITH q AS (SELECT source,
                              quantile_disc(n_chars, 0.25) AS q25,
                              quantile_disc(n_chars, 0.5) AS q50,
                              quantile_disc(n_chars, 0.75) AS q75
                       FROM documents GROUP BY source),
            ok AS (SELECT source, q50, q75 - q25 AS iqr
                   FROM q WHERE q75 - q25 <> 0)
            SELECT d.doc_id, d.source, d.n_chars,
                   (CAST(d.n_chars AS DOUBLE) - CAST(ok.q50 AS DOUBLE))
                       / CAST(ok.iqr AS DOUBLE) AS robust_z
            FROM documents d JOIN ok USING (source)
        """,
        "events_user_lifespan": """
            WITH u AS (SELECT user_id,
                              CAST(MIN(epoch_us(ts)) AS BIGINT) AS lo,
                              CAST(MAX(epoch_us(ts)) AS BIGINT) AS hi
                       FROM events GROUP BY 1)
            SELECT CAST((hi - lo) // 86400000000 AS BIGINT)
                       AS lifespan_days,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM u GROUP BY 1
        """,
        "events_signup_to_purchase": """
            WITH s AS (SELECT user_id,
                              CAST(MIN(epoch_us(ts)) AS BIGINT) AS s_min
                       FROM events WHERE event_type = 'signup'
                       GROUP BY 1),
            p AS (SELECT e.user_id,
                         CAST(MIN(epoch_us(e.ts)) AS BIGINT) AS p_min
                  FROM events e JOIN s USING (user_id)
                  WHERE e.event_type = 'purchase'
                    AND epoch_us(e.ts) >= s.s_min
                  GROUP BY 1),
            u AS (SELECT s.user_id, s.s_min, p.p_min
                  FROM s LEFT JOIN p USING (user_id)),
            c AS (SELECT
                      CAST((s_min // 86400000000
                            - (s_min // 86400000000 + 3) % 7)
                           * 86400000000 AS BIGINT) AS wk_us,
                      CAST(COUNT(*) AS BIGINT) AS n_signups,
                      CAST(COUNT(p_min) AS BIGINT) AS n_converted,
                      CAST(COALESCE(SUM((p_min - s_min)
                           // 3600000000), 0) AS BIGINT) AS sum_hours
                  FROM u GROUP BY 1)
            SELECT make_timestamp(wk_us) AS signup_week,
                   n_signups, n_converted,
                   CAST(n_converted AS DOUBLE)
                       / CAST(n_signups AS DOUBLE) AS conversion_rate,
                   CASE WHEN n_converted > 0
                        THEN CAST(sum_hours AS DOUBLE)
                             / CAST(n_converted AS DOUBLE)
                        END AS avg_hours_to_purchase
            FROM c
        """,
        "supplier_return_rate": """
            WITH g AS (SELECT l_suppkey,
                              CAST(COUNT(*) AS BIGINT) AS n_lines,
                              CAST(COUNT(*) FILTER (l_returnflag = 'R')
                                   AS BIGINT) AS n_returned
                       FROM lineitem GROUP BY 1),
            t AS (SELECT CAST(SUM(n_lines) AS BIGINT) AS nn,
                         CAST(SUM(n_returned) AS BIGINT) AS rr
                  FROM g)
            SELECT l_suppkey, n_lines, n_returned,
                   CAST(n_returned AS DOUBLE)
                       / CAST(n_lines AS DOUBLE) AS return_rate,
                   n_returned * (SELECT nn FROM t)
                       > n_lines * (SELECT rr FROM t)
                       AS above_corpus_rate
            FROM g
        """,
        "documents_dedup_loss_by_source": """
            WITH w AS (SELECT text, CAST(MIN(doc_id) AS BIGINT) AS w
                       FROM documents GROUP BY text),
            j AS (SELECT d.source,
                         CAST(d.doc_id = w.w AS BIGINT) AS kept,
                         CAST(len(string_split(d.text, ' '))
                              AS BIGINT) AS toks
                  FROM documents d JOIN w USING (text))
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(1 - kept) AS BIGINT) AS n_dropped,
                   CAST(SUM(toks) AS BIGINT) AS n_tokens,
                   CAST(SUM((1 - kept) * toks) AS BIGINT)
                       AS tokens_dropped,
                   CAST(SUM(1 - kept) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS drop_rate
            FROM j GROUP BY source
        """,
        "orders_ltv_triangle": """
            WITH f AS (SELECT o_custkey,
                              MIN(date_trunc('month', o_orderdate))
                                  AS cm
                       FROM orders GROUP BY 1),
            j AS (SELECT o.o_custkey, f.cm,
                         date_trunc('month', o.o_orderdate) AS om,
                         CAST(round(o.o_totalprice * 100) AS BIGINT)
                             AS cents
                  FROM orders o JOIN f USING (o_custkey))
            SELECT strftime(cm, '%Y-%m') AS cohort_month,
                   CAST((year(om) * 12 + month(om))
                        - (year(cm) * 12 + month(cm)) AS BIGINT)
                       AS age_months,
                   CAST(SUM(cents) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM j GROUP BY 1, 2
        """,
        "events_stickiness": """
            WITH ud AS (SELECT DISTINCT user_id,
                               date_trunc('day', ts) AS day
                        FROM events),
            dau AS (SELECT date_trunc('month', day) AS m, day,
                           CAST(COUNT(*) AS BIGINT) AS dau
                    FROM ud GROUP BY 1, 2),
            dm AS (SELECT m, CAST(SUM(dau) AS BIGINT) AS dau_sum,
                          CAST(COUNT(*) AS BIGINT) AS n_days
                   FROM dau GROUP BY 1),
            mm AS (SELECT date_trunc('month', day) AS m,
                          CAST(COUNT(DISTINCT user_id) AS BIGINT)
                              AS mau
                   FROM ud GROUP BY 1)
            SELECT strftime(dm.m, '%Y-%m') AS month, dm.n_days,
                   mm.mau,
                   CAST(dau_sum AS DOUBLE) / CAST(n_days AS DOUBLE)
                       AS avg_dau,
                   CAST(dau_sum AS DOUBLE) / CAST(n_days AS DOUBLE)
                       / CAST(mau AS DOUBLE) AS stickiness
            FROM dm JOIN mm USING (m)
        """,
        "documents_stump_confusion": """
            WITH g AS (SELECT n_chars AS x,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(*) FILTER (lang = 'en')
                                   AS BIGINT) AS p
                       FROM documents GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                           CAST(SUM(p) AS BIGINT) AS pp
                    FROM g),
            pre AS (SELECT x,
                           CAST(SUM(n) OVER (ORDER BY x) AS BIGINT)
                               AS nl,
                           CAST(SUM(p) OVER (ORDER BY x) AS BIGINT)
                               AS pl
                    FROM g),
            s AS (SELECT x, nl, pl,
                         tot.nn - nl AS nr, tot.pp - pl AS pr,
                         tot.nn AS nn, tot.pp AS pp
                  FROM pre, tot WHERE nl < tot.nn),
            r AS (SELECT x, nl, pl, nr, pr, nn, pp,
                         CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)
                             AS plr,
                         CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE)
                             AS prr
                  FROM s),
            w AS (SELECT x, nl, pl, nr, pr, nn, pp,
                         (CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE))
                             * (1.0 - plr * plr
                                - (1.0 - plr) * (1.0 - plr))
                         + (CAST(nr AS DOUBLE) / CAST(nn AS DOUBLE))
                             * (1.0 - prr * prr
                                - (1.0 - prr) * (1.0 - prr)) AS wg
                  FROM r),
            best AS (SELECT * FROM w ORDER BY wg, x LIMIT 1),
            cells AS (SELECT x, nn, pp,
                             CASE WHEN pl * nn >= pp * nl THEN pl
                                  ELSE 0 END
                             + CASE WHEN pr * nn >= pp * nr THEN pr
                                    ELSE 0 END AS tp,
                             CASE WHEN pl * nn >= pp * nl THEN nl - pl
                                  ELSE 0 END
                             + CASE WHEN pr * nn >= pp * nr
                                    THEN nr - pr
                                    ELSE 0 END AS fp,
                             CASE WHEN pl * nn >= pp * nl THEN 0
                                  ELSE pl END
                             + CASE WHEN pr * nn >= pp * nr THEN 0
                                    ELSE pr END AS fn,
                             CASE WHEN pl * nn >= pp * nl THEN 0
                                  ELSE nl - pl END
                             + CASE WHEN pr * nn >= pp * nr THEN 0
                                    ELSE nr - pr END AS tn
                      FROM best)
            SELECT x AS split_threshold,
                   CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
                   CAST(tp + tn AS DOUBLE) / CAST(nn AS DOUBLE) AS acc,
                   CASE WHEN tp + fp = 0 THEN NULL
                        ELSE CAST(tp AS DOUBLE)
                             / CAST(tp + fp AS DOUBLE) END AS prec,
                   CASE WHEN pp = 0 THEN NULL
                        ELSE CAST(tp AS DOUBLE)
                             / CAST(pp AS DOUBLE) END AS rec,
                   CASE WHEN tp = 0 OR tp + fp = 0 OR pp = 0 THEN NULL
                        ELSE 2.0 * (CAST(tp AS DOUBLE)
                                    / CAST(tp + fp AS DOUBLE))
                                 * (CAST(tp AS DOUBLE)
                                    / CAST(pp AS DOUBLE))
                             / ((CAST(tp AS DOUBLE)
                                 / CAST(tp + fp AS DOUBLE))
                                + (CAST(tp AS DOUBLE)
                                   / CAST(pp AS DOUBLE))) END AS f1
            FROM cells
        """,
        "documents_length_auc": """
            WITH g AS (SELECT n_chars AS x,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(COUNT(*) FILTER (lang = 'en')
                                   AS BIGINT) AS p
                       FROM documents GROUP BY 1),
            pre AS (SELECT x, p, n - p AS neg,
                           CAST(SUM(n - p) OVER (ORDER BY x)
                                AS BIGINT) - (n - p) AS cb
                    FROM g),
            tot AS (SELECT CAST(SUM(p) AS BIGINT) AS pp,
                           CAST(SUM(n - p) AS BIGINT) AS nn
                    FROM g),
            s AS (SELECT CAST(SUM(p * (2 * cb + neg)) AS BIGINT) AS u2
                  FROM pre)
            SELECT tot.pp AS n_pos, tot.nn AS n_neg, s.u2 AS u2,
                   CASE WHEN pp = 0 OR nn = 0 THEN NULL
                        ELSE CAST(u2 AS DOUBLE)
                             / (2.0 * CAST(pp AS DOUBLE)
                                * CAST(nn AS DOUBLE)) END AS auc,
                   CASE WHEN pp = 0 OR nn = 0 THEN NULL
                        ELSE 2.0 * (CAST(u2 AS DOUBLE)
                                    / (2.0 * CAST(pp AS DOUBLE)
                                       * CAST(nn AS DOUBLE)))
                             - 1.0 END AS gini
            FROM tot, s
        """,
        "documents_kfold_stats": """
            WITH f AS (SELECT CAST('0x' || substr(md5(
                                  doc_id::VARCHAR || chr(31) || '42'),
                              1, 8) AS BIGINT) % 5 AS fold,
                              lang, n_chars
                       FROM documents)
            SELECT fold,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT)
                       AS n_en,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(n_chars) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS mean_chars,
                   CAST(COUNT(*) FILTER (lang = 'en') AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS en_rate
            FROM f GROUP BY fold
        """,
        "events_poisson_bootstrap": """
            WITH p AS (SELECT CAST(round(value * 100) AS BIGINT)
                                  AS cents,
                              md5(event_id::VARCHAR || chr(31)
                                  || 'boot') AS h
                       FROM events WHERE event_type = 'purchase'),
            d AS (SELECT g.r AS replicate, cents,
                         CAST('0x' || substr(h, 1 + 4 * g.r, 4)
                              AS BIGINT) AS u
                  FROM p, generate_series(0, 7) AS g(r)),
            w AS (SELECT replicate, cents,
                         CASE WHEN u < 24109 THEN 0
                              WHEN u < 48218 THEN 1
                              WHEN u < 60273 THEN 2
                              WHEN u < 64291 THEN 3
                              WHEN u < 65296 THEN 4
                              WHEN u < 65497 THEN 5
                              WHEN u < 65530 THEN 6
                              WHEN u < 65535 THEN 7
                              ELSE 10 END AS wt
                  FROM d)
            SELECT replicate,
                   CAST(SUM(wt) AS BIGINT) AS n_eff,
                   CASE WHEN SUM(wt) = 0 THEN NULL
                        ELSE CAST(SUM(wt * cents) AS DOUBLE)
                             / CAST(SUM(wt) AS DOUBLE) / 100.0
                        END AS boot_mean
            FROM w GROUP BY replicate
        """,
        "events_permutation_test": """
            WITH p AS (SELECT CAST(round(value * 100) AS BIGINT)
                                  AS cents,
                              CASE WHEN event_type = 'purchase'
                                   THEN 1 ELSE 0 END AS ga,
                              CAST('0x' || substr(md5(
                                      event_id::VARCHAR || chr(31)
                                      || 'perm'), 1, 8)
                                   AS BIGINT) AS u
                       FROM events
                       WHERE event_type IN ('purchase', 'click')),
            tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                           CAST(SUM(cents) AS BIGINT) AS s,
                           CAST(SUM(ga) AS BIGINT) AS n1,
                           CAST(SUM(ga * cents) AS BIGINT) AS s1
                    FROM p),
            perm AS (SELECT g.j,
                            CAST(SUM((u >> g.j) & 1) AS BIGINT)
                                AS n1p,
                            CAST(SUM(((u >> g.j) & 1) * cents)
                                 AS BIGINT) AS s1p
                     FROM p, generate_series(0, 31) AS g(j)
                     GROUP BY g.j),
            e AS (SELECT j, n1p, s1p,
                         tot.n - n1p AS n2p, tot.s - s1p AS s2p,
                         tot.n1 AS n1o, tot.s1 AS s1o,
                         tot.n - tot.n1 AS n2o,
                         tot.s - tot.s1 AS s2o
                  FROM perm, tot),
            v AS (SELECT j,
                         CASE WHEN n1p = 0 OR n2p = 0 THEN NULL
                              WHEN CAST(abs(s1p * n2p - s2p * n1p)
                                        AS HUGEINT)
                                   * CAST(n1o * n2o AS HUGEINT)
                                   >= CAST(abs(s1o * n2o - s2o * n1o)
                                           AS HUGEINT)
                                      * CAST(n1p * n2p AS HUGEINT)
                              THEN 1 ELSE 0 END AS ex
                  FROM e)
            SELECT tot.n1 AS n_purchase, tot.n - tot.n1 AS n_click,
                   CASE WHEN tot.n1 = 0 OR tot.n = tot.n1 THEN NULL
                        ELSE (CAST(tot.s1 AS DOUBLE)
                              / CAST(tot.n1 AS DOUBLE)
                              - CAST(tot.s - tot.s1 AS DOUBLE)
                                / CAST(tot.n - tot.n1 AS DOUBLE))
                             / 100.0 END AS diff_obs,
                   CASE WHEN tot.n1 = 0 OR tot.n = tot.n1 THEN 0
                        ELSE CAST(COUNT(v.ex) AS BIGINT)
                        END AS n_valid,
                   CASE WHEN tot.n1 = 0 OR tot.n = tot.n1 THEN 0
                        ELSE CAST(COALESCE(SUM(v.ex), 0) AS BIGINT)
                        END AS n_extreme,
                   CASE WHEN tot.n1 = 0 OR tot.n = tot.n1 THEN NULL
                        ELSE CAST(COALESCE(SUM(v.ex), 0) + 1
                                  AS DOUBLE)
                             / CAST(COUNT(v.ex) + 1 AS DOUBLE)
                        END AS p_value
            FROM v, tot
            GROUP BY tot.n1, tot.n, tot.s1, tot.s
        """,
        "lineitem_multireg": """
            WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x1,
                              CAST(round(l_discount * 100) AS BIGINT)
                                  AS x2,
                              CAST(round(l_extendedprice * 100)
                                   AS BIGINT) AS y
                       FROM lineitem),
            s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x1) AS HUGEINT) AS s1,
                         CAST(SUM(x2) AS HUGEINT) AS s2,
                         CAST(SUM(x1 * x1) AS HUGEINT) AS s11,
                         CAST(SUM(x1 * x2) AS HUGEINT) AS s12,
                         CAST(SUM(x2 * x2) AS HUGEINT) AS s22,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM(x1 * y) AS HUGEINT) AS s1y,
                         CAST(SUM(x2 * y) AS HUGEINT) AS s2y
                  FROM b),
            d AS (SELECT n,
                         n * (s11 * s22 - s12 * s12)
                         - s1 * (s1 * s22 - s12 * s2)
                         + s2 * (s1 * s12 - s11 * s2) AS det,
                         sy * (s11 * s22 - s12 * s12)
                         - s1 * (s1y * s22 - s12 * s2y)
                         + s2 * (s1y * s12 - s11 * s2y) AS det0,
                         n * (s1y * s22 - s12 * s2y)
                         - sy * (s1 * s22 - s12 * s2)
                         + s2 * (s1 * s2y - s1y * s2) AS det1,
                         n * (s11 * s2y - s1y * s12)
                         - s1 * (s1 * s2y - s1y * s2)
                         + sy * (s1 * s12 - s11 * s2) AS det2
                  FROM s)
            SELECT CAST(n AS BIGINT) AS n_rows,
                   CASE WHEN det = 0 THEN NULL
                        ELSE CAST(det0 AS DOUBLE)
                             / CAST(det AS DOUBLE)
                        END AS intercept_cents,
                   CASE WHEN det = 0 THEN NULL
                        ELSE CAST(det1 AS DOUBLE)
                             / CAST(det AS DOUBLE)
                        END AS per_qty_cents,
                   CASE WHEN det = 0 THEN NULL
                        ELSE CAST(det2 AS DOUBLE)
                             / CAST(det AS DOUBLE)
                        END AS per_discpct_cents
            FROM d
        """,
        "embeddings_int8_recall": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb
                       FROM embeddings),
            u AS (SELECT vec_id, generate_subscripts(emb, 1) AS dim,
                         unnest(emb) AS x
                  FROM e),
            sc AS (SELECT dim, MAX(abs(x)) AS s FROM u GROUP BY dim),
            qz AS (SELECT vec_id, u.dim,
                          CASE WHEN s > 0
                               THEN CAST(floor(x / s * 127.0 + 0.5)
                                         AS BIGINT)
                               ELSE 0 END AS qv
                   FROM u JOIN sc USING (dim)),
            dots AS (SELECT a.vec_id AS qid, bb.vec_id AS vid,
                            CAST(SUM(a.qv * bb.qv) AS BIGINT) AS dot
                     FROM (SELECT * FROM qz WHERE vec_id < 8) a
                     JOIN qz bb USING (dim)
                     GROUP BY 1, 2),
            i8 AS (SELECT qid, vid FROM (
                       SELECT qid, vid, ROW_NUMBER() OVER (
                           PARTITION BY qid
                           ORDER BY dot DESC, vid ASC) AS rk
                       FROM dots) t WHERE rk <= 5),
            fl AS (SELECT query_id AS qid, vec_id AS vid FROM (
                       SELECT q.vec_id AS query_id,
                              c.vec_id AS vec_id,
                              ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY list_cosine_similarity(
                                      q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]) DESC,
                                  c.vec_id ASC) AS rank
                       FROM embeddings q CROSS JOIN embeddings c
                       WHERE q.vec_id < 8) t
                   WHERE rank <= 5)
            SELECT i8.qid AS query_id,
                   CAST(COUNT(fl.vid) AS BIGINT) AS n_overlap,
                   CAST(COUNT(fl.vid) AS DOUBLE) / 5.0 AS recall
            FROM i8 LEFT JOIN fl
              ON i8.qid = fl.qid AND i8.vid = fl.vid
            GROUP BY i8.qid
        """,
        "events_user_path_agg": """
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   STRING_AGG(event_type, '>'
                              ORDER BY ts, event_id) AS path
            FROM events GROUP BY user_id
        """,
        "customers_snm_pairs": """
            WITH r AS (SELECT c_name, c_nationkey,
                              ROW_NUMBER() OVER (
                                  ORDER BY c_name, c_custkey) AS rn
                       FROM customer)
            SELECT a.c_name AS name_a, b.c_name AS name_b,
                   CAST(b.rn - a.rn AS BIGINT) AS rank_gap,
                   CAST(CASE WHEN a.c_nationkey = b.c_nationkey
                             THEN 1 ELSE 0 END AS BIGINT)
                       AS same_nation
            FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
        """,
        "events_temporal_split": """
            WITH d AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM d),
            c AS (SELECT day, n,
                         CAST(SUM(n) OVER (ORDER BY day) AS BIGINT)
                             AS cum
                  FROM d),
            cut AS (SELECT MIN(day) AS cutoff
                    FROM c, tot WHERE 10 * cum >= 7 * t),
            lab AS (SELECT day, n,
                           CASE WHEN day <= cutoff THEN 'train'
                                WHEN day <= cutoff + INTERVAL 2 DAY
                                THEN 'purged'
                                ELSE 'test' END AS split
                    FROM c, cut)
            SELECT split, CAST(SUM(n) AS BIGINT) AS n_events,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   MIN(day) AS min_day, MAX(day) AS max_day
            FROM lab GROUP BY split
        """,
        "events_cuped": """
            WITH d AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            tot0 AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM d),
            c AS (SELECT day,
                         CAST(SUM(n) OVER (ORDER BY day) AS BIGINT)
                             AS cum
                  FROM d),
            cut AS (SELECT MIN(day) AS cutoff
                    FROM c, tot0 WHERE 2 * cum >= t),
            u AS (SELECT user_id,
                         CAST(SUM(CASE WHEN date_trunc('day', ts)
                                            <= cutoff
                                       THEN CAST(round(value * 100)
                                                 AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS x,
                         CAST(SUM(CASE WHEN date_trunc('day', ts)
                                            > cutoff
                                        AND event_type = 'purchase'
                                       THEN CAST(round(value * 100)
                                                 AS BIGINT)
                                       ELSE 0 END) AS BIGINT) AS y
                  FROM events, cut GROUP BY user_id),
            g AS (SELECT user_id % 2 AS arm,
                         CAST(COUNT(*) AS HUGEINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         CAST(SUM(x * y) AS HUGEINT) AS sxy,
                         CAST(SUM(x * x) AS HUGEINT) AS sxx
                  FROM u GROUP BY 1),
            t2 AS (SELECT CAST(SUM(n) AS HUGEINT) AS n,
                          CAST(SUM(sx) AS HUGEINT) AS sx,
                          CAST(SUM(sy) AS HUGEINT) AS sy,
                          CAST(SUM(sxy) AS HUGEINT) AS sxy,
                          CAST(SUM(sxx) AS HUGEINT) AS sxx
                   FROM g),
            th AS (SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                               ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                                    / CAST(n * sxx - sx * sx
                                           AS DOUBLE)
                               END AS theta,
                          sx AS gsx, n AS gn
                   FROM t2)
            SELECT g.arm, CAST(g.n AS BIGINT) AS n_users,
                   CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE)
                       / 100.0 AS mean_y,
                   (CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE)
                    - th.theta * (CAST(g.sx AS DOUBLE)
                                  / CAST(g.n AS DOUBLE)
                                  - CAST(th.gsx AS DOUBLE)
                                    / CAST(th.gn AS DOUBLE)))
                       / 100.0 AS mean_y_adj,
                   th.theta AS theta
            FROM g, th
        """,
        "events_k_anonymity": """
            WITH rel AS (SELECT event_type,
                                date_trunc('day', ts) AS day,
                                CAST(round(value * 100) AS BIGINT)
                                    // 1000 AS band,
                                user_id
                         FROM events),
            c AS (SELECT event_type, day, band,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u
                  FROM rel GROUP BY 1, 2, 3)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END)
                        AS BIGINT) AS k_violations,
                   CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
                        AS BIGINT) AS rows_at_risk,
                   CAST(MIN(n) AS BIGINT) AS min_class_size,
                   CAST(SUM(CASE WHEN u < 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS l_violations
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "events_randomized_response": """
            WITH b AS (SELECT event_type,
                              CASE WHEN CAST(round(value * 100)
                                             AS BIGINT) > 10000
                                   THEN 1 ELSE 0 END AS tr,
                              CASE WHEN strpos('cdef',
                                       substr(md5(event_id::VARCHAR
                                                  || chr(31) || 'rr'),
                                              1, 1)) > 0
                                   THEN 1 ELSE 0 END AS flip
                       FROM events),
            g AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(tr) AS BIGINT) AS true_yes,
                         CAST(SUM(CASE WHEN tr <> flip THEN 1
                                       ELSE 0 END) AS BIGINT)
                             AS reported_yes
                  FROM b GROUP BY 1)
            SELECT event_type, n, true_yes, reported_yes,
                   CAST(4 * reported_yes - n AS DOUBLE) / 2.0
                       AS est_yes,
                   CAST(4 * reported_yes - n AS DOUBLE) / 2.0
                       - CAST(true_yes AS DOUBLE) AS est_error
            FROM g ORDER BY event_type
        """,
        "events_hodges_lehmann": """
            WITH e AS (SELECT event_type,
                              date_trunc('day', ts) AS day,
                              CAST(round(value * 100) AS BIGINT) AS c
                       FROM events),
            h AS (SELECT event_type, day, c,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM e GROUP BY 1, 2, 3),
            nn AS (SELECT event_type, day,
                          CAST(SUM(cnt) AS BIGINT) AS n
                   FROM h GROUP BY 1, 2),
            p AS (SELECT a.event_type, a.day, a.c + b.c AS s,
                         CASE WHEN a.c = b.c
                              THEN a.cnt * (a.cnt + 1) // 2
                              ELSE a.cnt * b.cnt END AS w
                  FROM h a JOIN h b
                    ON a.event_type = b.event_type
                   AND a.day = b.day AND a.c <= b.c),
            s AS (SELECT event_type, day, s,
                         CAST(SUM(w) AS BIGINT) AS w
                  FROM p GROUP BY 1, 2, 3),
            r AS (SELECT event_type, day, s,
                         CAST(SUM(w) OVER (PARTITION BY event_type, day
                                           ORDER BY s) AS BIGINT) AS cum,
                         CAST(SUM(w) OVER (PARTITION BY event_type, day)
                              AS BIGINT) AS m
                  FROM s),
            x AS (SELECT event_type, day,
                         MIN(CASE WHEN cum >= (m + 1) // 2
                                  THEN s END) AS s_lo,
                         MIN(CASE WHEN cum >= (m + 2) // 2
                                  THEN s END) AS s_hi
                  FROM r GROUP BY 1, 2)
            SELECT x.event_type, x.day, nn.n,
                   CAST(x.s_lo + x.s_hi AS DOUBLE) / 400.0 AS hl
            FROM x JOIN nn
              ON x.event_type = nn.event_type AND x.day = nn.day
            ORDER BY 1, 2
        """,
        "events_conformal_intervals": """
            WITH b AS (SELECT event_type,
                              CAST(round(value * 100) AS BIGINT) AS c,
                              substr(md5(event_id::VARCHAR || chr(31)
                                         || 'conf'), 1, 1) AS hx
                       FROM events),
            t AS (SELECT event_type,
                         CAST(SUM(c) AS BIGINT) AS s,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM b WHERE strpos('01234567', hx) > 0
                  GROUP BY 1),
            cal AS (SELECT b.event_type,
                           abs(b.c * t.n - t.s) AS r
                    FROM b JOIN t USING (event_type)
                    WHERE strpos('89ab', hx) > 0),
            tst AS (SELECT b.event_type,
                           abs(b.c * t.n - t.s) AS r
                    FROM b JOIN t USING (event_type)
                    WHERE strpos('cdef', hx) > 0),
            kc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
                              AS n_cal,
                          LEAST((9 * (COUNT(*) + 1) + 9) // 10,
                                COUNT(*)) AS k
                   FROM cal GROUP BY 1),
            rk AS (SELECT event_type, r,
                          ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY r) AS rn
                   FROM cal),
            qn AS (SELECT rk.event_type, rk.r AS q_num
                   FROM rk JOIN kc ON rk.event_type = kc.event_type
                                  AND rk.rn = kc.k),
            cov AS (SELECT tst.event_type,
                           CAST(COUNT(*) AS BIGINT) AS n_test,
                           CAST(SUM(CASE WHEN tst.r <= qn.q_num
                                         THEN 1 ELSE 0 END)
                                AS BIGINT) AS covered
                    FROM tst JOIN qn USING (event_type)
                    GROUP BY 1)
            SELECT t.event_type, t.n AS n_train, kc.n_cal,
                   cov.n_test,
                   CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
                       / 100.0 AS pred,
                   CAST(qn.q_num AS DOUBLE) / CAST(t.n AS DOUBLE)
                       / 100.0 AS q_hat,
                   CAST(cov.covered AS DOUBLE)
                       / CAST(cov.n_test AS DOUBLE) AS coverage
            FROM t JOIN kc USING (event_type)
                   JOIN qn USING (event_type)
                   JOIN cov USING (event_type)
            ORDER BY t.event_type
        """,
        "documents_minhash_sql": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            s AS (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i+1] || ' '
                         || toks[i+2]))) AS sh
                  FROM d WHERE len(toks) >= 3),
            mh AS (SELECT doc_id, g.r AS r,
                          MIN(CAST('0x' || substr(md5(sh || chr(31)
                                       || 'mh' || g.r), 1, 8)
                              AS BIGINT)) AS m
                   FROM s, generate_series(0, 7) AS g(r)
                   GROUP BY 1, 2),
            sig AS (SELECT doc_id,
                           MIN(CASE WHEN r = 0 THEN m END) AS m0,
                           MIN(CASE WHEN r = 1 THEN m END) AS m1,
                           MIN(CASE WHEN r = 2 THEN m END) AS m2,
                           MIN(CASE WHEN r = 3 THEN m END) AS m3,
                           MIN(CASE WHEN r = 4 THEN m END) AS m4,
                           MIN(CASE WHEN r = 5 THEN m END) AS m5,
                           MIN(CASE WHEN r = 6 THEN m END) AS m6,
                           MIN(CASE WHEN r = 7 THEN m END) AS m7
                    FROM mh GROUP BY 1),
            bands AS (SELECT doc_id, g.j AS j,
                             CASE g.j WHEN 0 THEN m0 WHEN 1 THEN m2
                                      WHEN 2 THEN m4 ELSE m6
                             END AS k1,
                             CASE g.j WHEN 0 THEN m1 WHEN 1 THEN m3
                                      WHEN 2 THEN m5 ELSE m7
                             END AS k2
                      FROM sig, generate_series(0, 3) AS g(j)),
            pairs AS (SELECT DISTINCT a.doc_id AS doc_a,
                                      b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.j = b.j AND a.k1 = b.k1
                       AND a.k2 = b.k2 AND a.doc_id < b.doc_id),
            m AS (SELECT p.doc_a, p.doc_b,
                         CAST((sa.m0 = sb.m0)::INT
                              + (sa.m1 = sb.m1)::INT
                              + (sa.m2 = sb.m2)::INT
                              + (sa.m3 = sb.m3)::INT
                              + (sa.m4 = sb.m4)::INT
                              + (sa.m5 = sb.m5)::INT
                              + (sa.m6 = sb.m6)::INT
                              + (sa.m7 = sb.m7)::INT AS BIGINT)
                             AS n_match
                  FROM pairs p
                  JOIN sig sa ON p.doc_a = sa.doc_id
                  JOIN sig sb ON p.doc_b = sb.doc_id)
            SELECT doc_a, doc_b, n_match,
                   CAST(n_match AS DOUBLE) / 8.0 AS est_sim
            FROM m ORDER BY 1, 2
        """,
        "orders_hhi_by_nation": """
            WITH cc AS (SELECT o_custkey AS c,
                               CAST(SUM(CAST(round(o_totalprice * 100)
                                             AS BIGINT)) AS BIGINT)
                                   AS cents
                        FROM orders GROUP BY 1),
            j AS (SELECT n.n_name, cc.cents
                  FROM cc JOIN customer cu ON cu.c_custkey = cc.c
                       JOIN nation n
                         ON n.n_nationkey = cu.c_nationkey)
            SELECT n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(cents) AS BIGINT) AS total_cents,
                   ROUND(CAST(SUM(CAST(cents AS HUGEINT) * cents)
                              AS DOUBLE)
                         / (CAST(SUM(cents) AS DOUBLE)
                            * CAST(SUM(cents) AS DOUBLE)), 6) AS hhi
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "events_lorenz_deciles": """
            WITH us AS (SELECT user_id,
                               CAST(SUM(CAST(round(value * 100)
                                             AS BIGINT)) AS BIGINT)
                                   AS cents
                        FROM events WHERE value IS NOT NULL
                        GROUP BY 1),
            t AS (SELECT cents,
                         CAST(NTILE(10) OVER (ORDER BY cents, user_id)
                              AS BIGINT) AS decile
                  FROM us),
            d AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
                         CAST(SUM(cents) AS BIGINT) AS decile_cents
                  FROM t GROUP BY 1),
            c AS (SELECT decile, n_users, decile_cents,
                         CAST(SUM(decile_cents) OVER (ORDER BY decile
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum_cents
                  FROM d)
            SELECT decile, n_users, decile_cents, cum_cents,
                   ROUND(CAST(cum_cents AS DOUBLE)
                         / (SELECT CAST(SUM(cents) AS DOUBLE)
                            FROM us), 6) AS cum_share
            FROM c ORDER BY decile
        """,
        "parts_copurchase_linkpred": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            s AS (SELECT p1 AS ctr, p2 AS nbr FROM e
                  UNION ALL SELECT p2, p1 FROM e),
            cn AS (SELECT a.nbr AS id_a, b.nbr AS id_b,
                          CAST(COUNT(*) AS BIGINT)
                              AS common_neighbors
                   FROM s a JOIN s b
                     ON a.ctr = b.ctr AND a.nbr < b.nbr
                   GROUP BY 1, 2)
            SELECT id_a, id_b, common_neighbors
            FROM cn
            WHERE NOT EXISTS (SELECT 1 FROM e
                              WHERE e.p1 = cn.id_a
                                AND e.p2 = cn.id_b)
            ORDER BY common_neighbors DESC, id_a, id_b
            LIMIT 20
        """,
        "events_freshness": """
            WITH b AS (SELECT event_type, ts,
                              CAST(epoch_us(ts) // 86400000000
                                   AS BIGINT) AS day
                       FROM events),
            g AS (SELECT MAX(day) AS gd FROM b)
            SELECT event_type,
                   MAX(ts) AS last_ts,
                   CAST((SELECT gd FROM g) - MAX(day) AS BIGINT)
                       AS days_stale,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN day >= (SELECT gd FROM g) - 6
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_last_7d
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "transcripts_tool_stats": f"""
            WITH c AS (SELECT tool, conv_id,
                              CAST(COUNT(*) AS BIGINT) AS n,
                              CAST(SUM(COALESCE(length(text), 0))
                                   AS BIGINT) AS ch,
                              CAST(SUM(turn_idx) AS BIGINT) AS si
                       FROM {transcripts}
                       WHERE role = 'tool'
                         AND COALESCE(tool, '') <> ''
                       GROUP BY 1, 2)
            SELECT tool,
                   CAST(SUM(n) AS BIGINT) AS n_calls,
                   CAST(COUNT(*) AS BIGINT) AS n_convs,
                   CAST(SUM(ch) AS BIGINT) AS total_chars,
                   CAST(SUM(si) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
                       AS mean_turn_idx
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "transcripts_role_transitions": f"""
            WITH s AS (SELECT conv_id, role,
                              LAG(role) OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS prev_role
                       FROM {transcripts}),
            c AS (SELECT prev_role, role AS next_role,
                         CAST(COUNT(*) AS BIGINT) AS n_trans
                  FROM s WHERE prev_role IS NOT NULL GROUP BY 1, 2)
            SELECT prev_role, next_role, n_trans,
                   CAST(n_trans AS DOUBLE)
                   / CAST(SUM(n_trans) OVER (PARTITION BY prev_role)
                          AS DOUBLE) AS p
            FROM c ORDER BY 1, 2
        """,
        "transcripts_context_budget": f"""
            WITH t AS (SELECT conv_id, turn_idx, ts,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts}),
            w AS (SELECT conv_id, turn_idx, tok,
                         CAST(SUM(tok) OVER (PARTITION BY conv_id
                             ORDER BY turn_idx, ts
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS cum
                  FROM t)
            SELECT conv_id,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(tok) AS BIGINT) AS total_tokens,
                   CAST(SUM(CASE WHEN cum <= 4096 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_turns_in_budget,
                   CAST(MIN(CASE WHEN cum > 4096 THEN turn_idx END)
                        AS BIGINT) AS cut_turn_idx
            FROM w GROUP BY 1 ORDER BY 1
        """,
        "transcripts_response_latency": f"""
            WITH s AS (SELECT conv_id, role, epoch_us(ts) AS us,
                              LAG(epoch_us(ts)) OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS prev_us
                       FROM {transcripts})
            SELECT role,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(us - prev_us) AS BIGINT) AS total_gap_us,
                   CAST(SUM(us - prev_us) AS DOUBLE) / COUNT(*)
                       AS mean_gap_us,
                   CAST(MAX(us - prev_us) AS BIGINT) AS max_gap_us
            FROM s WHERE prev_us IS NOT NULL GROUP BY 1 ORDER BY 1
        """,
        "parts_copurchase_adamic_adar": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            s AS (SELECT p1 AS ctr, p2 AS nbr FROM e
                  UNION ALL SELECT p2, p1 FROM e),
            d AS (SELECT ctr,
                         CAST(round(1000000000000.0
                                    / ln(CAST(COUNT(*) AS DOUBLE)))
                              AS BIGINT) AS wq
                  FROM s GROUP BY 1 HAVING COUNT(*) >= 2),
            cn AS (SELECT a.nbr AS id_a, b.nbr AS id_b,
                          CAST(SUM(d.wq) AS BIGINT) AS aa_q,
                          CAST(COUNT(*) AS BIGINT)
                              AS common_neighbors
                   FROM s a JOIN s b
                     ON a.ctr = b.ctr AND a.nbr < b.nbr
                   JOIN d ON d.ctr = a.ctr
                   GROUP BY 1, 2)
            SELECT id_a, id_b, aa_q, common_neighbors
            FROM cn
            WHERE NOT EXISTS (SELECT 1 FROM e
                              WHERE e.p1 = cn.id_a
                                AND e.p2 = cn.id_b)
            ORDER BY aa_q DESC, id_a, id_b
            LIMIT 20
        """,
        "documents_source_cosine": """
            WITH t AS (SELECT source, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
                   FROM t GROUP BY 1, 2),
            pr AS (SELECT a.source AS source_a, b.source AS source_b,
                          CAST(SUM(a.c * b.c) AS BIGINT) AS num
                   FROM st a JOIN st b
                     ON a.tok = b.tok AND a.source < b.source
                   GROUP BY 1, 2),
            nm AS (SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2
                   FROM st GROUP BY 1)
            SELECT pr.source_a, pr.source_b, pr.num AS dot,
                   ROUND(CAST(pr.num AS DOUBLE)
                         / (sqrt(CAST(na.n2 AS DOUBLE))
                            * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
                       AS cosine
            FROM pr JOIN nm na ON na.source = pr.source_a
                 JOIN nm nb ON nb.source = pr.source_b
            ORDER BY 1, 2
        """,
        "events_mcnemar": """
            WITH d AS (SELECT user_id, event_type,
                              CAST(epoch_us(ts) // 86400000000
                                   AS BIGINT) AS day
                       FROM events),
            m AS (SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM d),
            u AS (SELECT user_id,
                         MAX(CASE WHEN event_type = 'purchase'
                                   AND day <= (SELECT mid FROM m)
                                  THEN 1 ELSE 0 END) AS b1,
                         MAX(CASE WHEN event_type = 'purchase'
                                   AND day > (SELECT mid FROM m)
                                  THEN 1 ELSE 0 END) AS b2
                  FROM d GROUP BY 1),
            c AS (SELECT
                      CAST(SUM(CASE WHEN b1 = 0 AND b2 = 0
                                    THEN 1 ELSE 0 END) AS BIGINT)
                          AS n00,
                      CAST(SUM(CASE WHEN b1 = 0 AND b2 = 1
                                    THEN 1 ELSE 0 END) AS BIGINT)
                          AS n01,
                      CAST(SUM(CASE WHEN b1 = 1 AND b2 = 0
                                    THEN 1 ELSE 0 END) AS BIGINT)
                          AS n10,
                      CAST(SUM(CASE WHEN b1 = 1 AND b2 = 1
                                    THEN 1 ELSE 0 END) AS BIGINT)
                          AS n11
                  FROM u)
            SELECT n00, n01, n10, n11,
                   CASE WHEN n01 + n10 > 0
                        THEN CAST((n01 - n10) * (n01 - n10) AS DOUBLE)
                             / CAST(n01 + n10 AS DOUBLE)
                        ELSE 0.0 END AS mcnemar_chi2
            FROM c
        """,
        "lineitem_branch_revenue": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(round(l_extendedprice
                                       * (1 - l_discount) * 10000)
                                 AS BIGINT)) AS DOUBLE)
                       / 10000.0 AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12'
                   AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23'
                   AND p_size BETWEEN 1 AND 20
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34'
                   AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "documents_readability": """
            WITH d AS (SELECT doc_id, COALESCE(text, '') AS t
                       FROM documents),
            c AS (SELECT doc_id,
                         CAST(len(string_split(t, ' ')) AS BIGINT)
                             AS w,
                         CAST(len(regexp_extract_all(lower(t),
                                                     '[aeiouy]+'))
                              AS BIGINT) AS syl,
                         CAST(len(list_filter(
                                  string_split_regex(t, '[.!?]+'),
                                  p -> trim(p) <> '')) AS BIGINT) AS s
                  FROM d)
            SELECT doc_id, w AS n_words, s AS n_sentences,
                   syl AS n_syllables,
                   ROUND(206.835
                         - 1.015 * (CAST(w AS DOUBLE)
                                    / CAST(GREATEST(s, 1) AS DOUBLE))
                         - 84.6 * (CAST(syl AS DOUBLE)
                                   / CAST(GREATEST(w, 1) AS DOUBLE)),
                         6) AS fre
            FROM c
        """,
        "parts_discount_elasticity": """
            WITH f AS (SELECT p_brand,
                              CAST(round(l_discount * 100) AS BIGINT)
                                  AS x,
                              CAST(round(l_quantity) AS BIGINT) AS y
                       FROM lineitem
                       JOIN part ON p_partkey = l_partkey),
            s AS (SELECT p_brand,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x * x) AS BIGINT) AS sxx,
                         CAST(SUM(x * y) AS BIGINT) AS sxy
                  FROM f GROUP BY 1)
            SELECT p_brand, n,
                   ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE), 6)
                       AS slope,
                   ROUND((CAST(sy AS DOUBLE)
                          - (CAST(n * sxy - sx * sy AS DOUBLE)
                             / CAST(n * sxx - sx * sx AS DOUBLE))
                            * CAST(sx AS DOUBLE))
                         / CAST(n AS DOUBLE), 6) AS intercept
            FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
            ORDER BY 1
        """,
        "supplier_ship_lag": """
            WITH f AS (SELECT l_suppkey AS s_suppkey,
                              epoch_us(l_shipdate) // 86400000000
                              - epoch_us(o_orderdate) // 86400000000
                                  AS lag
                       FROM lineitem
                       JOIN orders ON o_orderkey = l_orderkey)
            SELECT s_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(lag) AS DOUBLE) / COUNT(*)
                       AS mean_lag_days,
                   CAST(quantile_disc(lag, 0.5) AS BIGINT)
                       AS median_lag_days,
                   CAST(MAX(lag) AS BIGINT) AS max_lag_days
            FROM f GROUP BY 1 ORDER BY 1
        """,
        "documents_hapax_by_source": """
            WITH t AS (SELECT source, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM t GROUP BY 1, 2),
            g AS (SELECT source,
                         CAST(COUNT(*) AS BIGINT) AS vocab,
                         CAST(SUM(tf) AS BIGINT) AS n_tokens,
                         CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_hapax
                  FROM st GROUP BY 1)
            SELECT source, vocab, n_tokens, n_hapax,
                   CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                       AS ttr,
                   CAST(n_hapax AS DOUBLE) / CAST(vocab AS DOUBLE)
                       AS hapax_share
            FROM g ORDER BY 1
        """,
        "transcripts_sft_pairs": f"""
            -- replace(chr(0)) mirrors the engine's NUL hygiene: NULs
            -- are junk in training text AND break pandas' C-string
            -- hash factorizer in row-sorted compares
            WITH o AS (SELECT conv_id, turn_idx, role,
                              replace(COALESCE(text, ''), chr(0), '')
                                  AS text, ts
                       FROM {transcripts}),
            w AS (SELECT conv_id, turn_idx, role, text,
                         LAG(role || ': ' || text, 3) OVER win AS l3,
                         LAG(role || ': ' || text, 2) OVER win AS l2,
                         LAG(role || ': ' || text, 1) OVER win AS l1
                  FROM o
                  WINDOW win AS (PARTITION BY conv_id
                                 ORDER BY turn_idx, ts))
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   concat_ws(chr(10), l3, l2, l1) AS prompt,
                   text AS response
            FROM w WHERE role = 'assistant' ORDER BY 1, 2
        """,
        "transcripts_tool_chains": f"""
            WITH o AS (SELECT conv_id, role,
                              ROW_NUMBER() OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS rn
                       FROM {transcripts}),
            t AS (SELECT conv_id, rn,
                         rn - ROW_NUMBER() OVER (PARTITION BY conv_id
                             ORDER BY rn) AS grp
                  FROM o WHERE role = 'tool'),
            r AS (SELECT CAST(COUNT(*) AS BIGINT) AS chain_len
                  FROM t GROUP BY conv_id, grp)
            SELECT chain_len, CAST(COUNT(*) AS BIGINT) AS n_chains
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "parts_copurchase_edge_jaccard": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                                        l_partkey AS p
                        FROM lineitem),
            e AS (SELECT DISTINCT a.p AS p1, b.p AS p2
                  FROM op a JOIN op b USING (o) WHERE a.p < b.p),
            s AS (SELECT p1 AS ctr, p2 AS nbr FROM e
                  UNION ALL SELECT p2, p1 FROM e),
            deg AS (SELECT ctr AS p, CAST(COUNT(*) AS BIGINT) AS d
                    FROM s GROUP BY 1),
            cn AS (SELECT a.nbr AS id_a, b.nbr AS id_b,
                          CAST(COUNT(*) AS BIGINT) AS c
                   FROM s a JOIN s b
                     ON a.ctr = b.ctr AND a.nbr < b.nbr
                   GROUP BY 1, 2),
            j AS (SELECT e.p1 AS id_a, e.p2 AS id_b,
                         cn.c AS common_neighbors,
                         da.d + db.d - 2 - cn.c AS union_size
                  FROM e
                  JOIN cn ON cn.id_a = e.p1 AND cn.id_b = e.p2
                  JOIN deg da ON da.p = e.p1
                  JOIN deg db ON db.p = e.p2)
            SELECT id_a, id_b, common_neighbors, union_size,
                   common_neighbors * 1000000 // union_size
                       AS jaccard_q
            FROM j
            ORDER BY jaccard_q DESC, id_a, id_b LIMIT 20
        """,
        "documents_lang_mix": """
            WITH g AS (SELECT source, lang,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1, 2),
            t AS (SELECT source,
                         CAST(SUM(n) AS BIGINT) AS n_source,
                         CAST(SUM(n * CAST(round(
                             ln(CAST(n AS DOUBLE)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s1
                  FROM g GROUP BY 1)
            SELECT g.source, g.lang, g.n AS n_docs, t.n_source,
                   CAST(g.n AS DOUBLE) / CAST(t.n_source AS DOUBLE)
                       AS share,
                   ROUND(ln(CAST(t.n_source AS DOUBLE))
                         - CAST(t.s1 AS DOUBLE) / 1000000.0
                           / CAST(t.n_source AS DOUBLE), 6)
                       AS entropy
            FROM g JOIN t USING (source) ORDER BY 1, 2
        """,
        "documents_lexical_rank": """
            WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
                              AS tok
                       FROM documents),
            tf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
                   FROM t GROUP BY 1),
            r AS (SELECT tok,
                         CAST(ROW_NUMBER() OVER (ORDER BY tf DESC,
                                                 tok) AS BIGINT)
                             AS rnk
                  FROM tf),
            d AS (SELECT t.doc_id,
                         CAST(COUNT(*) AS BIGINT) AS n_tokens,
                         CAST(SUM(r.rnk) AS BIGINT) AS s
                  FROM t JOIN r USING (tok) GROUP BY 1)
            SELECT doc_id, n_tokens,
                   CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                       AS mean_rank
            FROM d ORDER BY 1
        """,
        "events_bot_audit": """
            WITH o AS (SELECT user_id, event_id,
                              epoch_us(ts) // 60000000 AS minute
                       FROM events),
            mx AS (SELECT user_id, CAST(MAX(c) AS BIGINT)
                              AS max_per_minute,
                          CAST(SUM(c) AS BIGINT) AS n_events
                   FROM (SELECT user_id, minute,
                                CAST(COUNT(*) AS BIGINT) AS c
                         FROM o GROUP BY 1, 2)
                   GROUP BY 1),
            g AS (SELECT user_id,
                         minute - LAG(minute) OVER (
                             PARTITION BY user_id
                             ORDER BY minute, event_id) AS gap
                  FROM o),
            v AS (SELECT user_id,
                         CAST(COUNT(gap) AS BIGINT) AS n_gaps,
                         CAST(COUNT(gap) * SUM(gap * gap)
                              - SUM(gap) * SUM(gap) AS BIGINT)
                             AS gap_var_num,
                         CAST(SUM(gap) AS BIGINT) AS gap_sum
                  FROM g GROUP BY 1)
            SELECT mx.user_id, mx.n_events, mx.max_per_minute,
                   v.n_gaps, COALESCE(v.gap_var_num, 0)
                       AS gap_var_num,
                   mx.max_per_minute >= 10 AS is_burst,
                   (v.n_gaps >= 5 AND v.gap_var_num = 0
                    AND v.gap_sum > 0) AS is_metronome
            FROM mx JOIN v USING (user_id) ORDER BY 1
        """,
        "events_acf": """
            WITH d AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1),
            l AS (SELECT k FROM range(1, 8) t(k)),
            p AS (SELECT l.k, a.n AS x, b.n AS y
                  FROM l JOIN d a ON TRUE
                  JOIN d b ON b.day = a.day
                                      + (l.k * INTERVAL 1 DAY)),
            s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS np,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x * x) AS BIGINT) AS sxx,
                         CAST(SUM(y * y) AS BIGINT) AS syy,
                         CAST(SUM(x * y) AS BIGINT) AS sxy
                  FROM p GROUP BY 1)
            SELECT CAST(k AS BIGINT) AS lag, np AS n_pairs,
                   ROUND(CAST(np * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                                * CAST(np * syy - sy * sy
                                       AS DOUBLE)), 6) AS autocorr
            FROM s
            WHERE np >= 2 AND np * sxx - sx * sx > 0
              AND np * syy - sy * sy > 0
            ORDER BY 1
        """,
        "transcripts_tool_followup": f"""
            WITH o AS (SELECT conv_id, role,
                              ROW_NUMBER() OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS rn
                       FROM {transcripts}),
            nt AS (SELECT conv_id, rn FROM o WHERE role <> 'tool'),
            t AS (SELECT conv_id, rn FROM o WHERE role = 'tool'),
            nx AS (SELECT t.conv_id, t.rn,
                          (SELECT MIN(nt.rn) FROM nt
                           WHERE nt.conv_id = t.conv_id
                             AND nt.rn > t.rn) AS next_rn
                   FROM t),
            j AS (SELECT nx.conv_id, nx.rn, o2.role AS next_role
                  FROM nx LEFT JOIN o o2
                    ON o2.conv_id = nx.conv_id
                   AND o2.rn = nx.next_rn)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tool_turns,
                   CAST(SUM(CASE WHEN next_role = 'assistant'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_consumed,
                   CAST(SUM(CASE WHEN next_role IS NULL
                                  OR next_role <> 'assistant'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dangling,
                   CASE WHEN COUNT(*) > 0
                        THEN CAST(SUM(CASE WHEN next_role
                                            = 'assistant'
                                           THEN 1 ELSE 0 END)
                                  AS DOUBLE)
                             / CAST(COUNT(*) AS DOUBLE)
                        ELSE 0.0 END AS consumed_rate
            FROM j
        """,
        "events_type_burstiness": """
            WITH d AS (SELECT event_type,
                              date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            s AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS nd,
                         CAST(SUM(n) AS BIGINT) AS s,
                         CAST(SUM(n * n) AS BIGINT) AS s2
                  FROM d GROUP BY 1),
            v AS (SELECT event_type, nd, s,
                         nd * s2 - s * s AS vn
                  FROM s)
            SELECT event_type, nd AS n_days, s AS n_total,
                   ROUND(CAST(vn AS DOUBLE)
                         / CAST(nd * s AS DOUBLE), 6) AS fano,
                   ROUND((sqrt(CAST(vn AS DOUBLE))
                          - CAST(s AS DOUBLE))
                         / (sqrt(CAST(vn AS DOUBLE))
                            + CAST(s AS DOUBLE)), 6) AS burstiness
            FROM v ORDER BY 1
        """,
        "transcripts_link_density": f"""
            WITH h AS (SELECT conv_id,
                              CAST(turn_idx AS BIGINT) AS turn_idx,
                              COALESCE(text, '') AS t
                       FROM {transcripts}
                       WHERE COALESCE(text, '')
                             LIKE '<!DOCTYPE%'),
            c AS (SELECT conv_id, turn_idx,
                         CAST(len(regexp_extract_all(t,
                             '<a [^>]*>[^<]*</a>')) AS BIGINT)
                             AS n_links,
                         CAST(length(t) AS BIGINT) AS total_chars,
                         CAST(length(t) - length(regexp_replace(t,
                             '<a [^>]*>[^<]*</a>', '', 'g'))
                             AS BIGINT) AS link_chars
                  FROM h)
            SELECT conv_id, turn_idx, n_links, total_chars,
                   link_chars,
                   CAST(link_chars AS DOUBLE)
                   / CAST(GREATEST(total_chars, 1) AS DOUBLE)
                       AS link_density
            FROM c ORDER BY 1, 2
        """,
        "transcripts_md_structure": f"""
            WITH m AS (SELECT conv_id,
                              CAST(turn_idx AS BIGINT) AS turn_idx,
                              COALESCE(text, '') AS t
                       FROM {transcripts})
            SELECT conv_id, turn_idx,
                   CAST(len(regexp_extract_all(t, '(?m)^#+ '))
                        AS BIGINT) AS n_headers,
                   CAST(len(regexp_extract_all(t,
                       '\\[[^\\]]*\\]\\([^)]*\\)')) AS BIGINT)
                       AS n_links,
                   CAST(len(regexp_extract_all(t, '`[^`]+`'))
                        AS BIGINT) AS n_code_spans
            FROM m
            WHERE len(regexp_extract_all(t, '(?m)^#+ ')) > 0
            ORDER BY 1, 2
        """,
        "transcripts_system_prompts": f"""
            WITH s AS (SELECT md5(COALESCE(text, '')) AS sys_md5,
                              conv_id
                       FROM {transcripts} WHERE role = 'system'),
            g AS (SELECT sys_md5,
                         CAST(COUNT(*) AS BIGINT) AS n_turns,
                         CAST(COUNT(DISTINCT conv_id) AS BIGINT)
                             AS n_convs
                  FROM s GROUP BY 1)
            SELECT sys_md5, n_turns, n_convs
            FROM g ORDER BY n_turns DESC, sys_md5 LIMIT 10
        """,
        "transcripts_turn_integrity": f"""
            SELECT conv_id,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(COUNT(DISTINCT turn_idx) AS BIGINT)
                       AS n_distinct,
                   CAST(MIN(turn_idx) AS BIGINT) AS min_idx,
                   CAST(MAX(turn_idx) AS BIGINT) AS max_idx,
                   CAST(MAX(turn_idx) - MIN(turn_idx) + 1
                        - COUNT(DISTINCT turn_idx) AS BIGINT)
                       AS n_gaps,
                   CAST(COUNT(*) - COUNT(DISTINCT turn_idx)
                        AS BIGINT) AS n_dup_idx,
                   (MIN(turn_idx) = 0
                    AND MAX(turn_idx) - MIN(turn_idx) + 1
                        = COUNT(DISTINCT turn_idx)
                    AND COUNT(*) = COUNT(DISTINCT turn_idx))
                       AS is_contiguous
            FROM {transcripts} GROUP BY 1 ORDER BY 1
        """,
        "transcripts_conv_prefix_groups": f"""
            WITH r AS (SELECT conv_id, role, COALESCE(text, '') AS t,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, role, text) AS rn
                       FROM {transcripts}),
            p AS (SELECT conv_id,
                         md5(string_agg(role || ':' || t, chr(31)
                             ORDER BY rn)) AS prefix_md5
                  FROM r WHERE rn <= 2 GROUP BY conv_id)
            SELECT prefix_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_convs,
                   MIN(conv_id) AS example_conv
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "transcripts_loop_runs": f"""
            -- rid pins ONE total order: tied (identical, planted-dup)
            -- rows would otherwise be ordered differently by the LAG
            -- window and the island running-sum window, splitting a
            -- dup pair across two islands (measured at sf0.01)
            WITH r AS (SELECT conv_id, role, tool, text,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, role, text)
                                  AS rid
                       FROM {transcripts}),
            s AS (SELECT conv_id, rid,
                              CASE WHEN LAG(role) OVER w = role
                                    AND LAG(tool) OVER w = tool
                                    AND LAG(text) OVER w = text
                                   THEN 0 ELSE 1 END AS brk
                       FROM r
                       WINDOW w AS (PARTITION BY conv_id
                                    ORDER BY rid)),
            i AS (SELECT conv_id,
                         SUM(brk) OVER (PARTITION BY conv_id
                             ORDER BY rid
                             ROWS UNBOUNDED PRECEDING) AS island
                  FROM s),
            runs AS (SELECT conv_id, island,
                            CAST(COUNT(*) AS BIGINT) AS c
                     FROM i GROUP BY 1, 2)
            SELECT conv_id,
                   CAST(SUM(c) AS BIGINT) AS n_turns,
                   CAST(MAX(c) AS BIGINT) AS max_run,
                   CAST(SUM(c) - COUNT(*) AS BIGINT)
                       AS n_repeat_turns
            FROM runs GROUP BY 1 ORDER BY 1
        """,
        "transcripts_tool_latency_quantiles": f"""
            WITH s AS (SELECT conv_id, role, tool, ts,
                              LAG(ts) OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS pts
                       FROM {transcripts}),
            g AS (SELECT tool,
                         CAST(epoch_us(ts) - epoch_us(pts)
                              AS BIGINT) AS gap
                  FROM s
                  WHERE role = 'tool' AND tool <> ''
                    AND pts IS NOT NULL)
            SELECT tool,
                   CAST(quantile_disc(gap, 0.5) AS DOUBLE) AS q50,
                   CAST(quantile_disc(gap, 0.9) AS DOUBLE) AS q90
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "transcripts_anchor_spans": f"""
            SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
                   CAST(strpos(text, 'Invoice') AS BIGINT)
                       AS pos_invoice,
                   CAST(strpos(text, 'Total') AS BIGINT) AS pos_total,
                   CAST(strpos(text, 'Date') AS BIGINT) AS pos_date
            FROM {transcripts}
            WHERE strpos(text, 'Invoice') > 0
               OR strpos(text, 'Total') > 0
               OR strpos(text, 'Date') > 0
            ORDER BY 1, 2
        """,
        "parts_small_qty_revenue": """
            -- integer cross-multiply replays the engine's exact
            -- correlated threshold: qty < 0.2*avg(qty)  <=>
            -- 5*qty*n < sum_qty (quantities are integral)
            WITH st AS (SELECT l_partkey,
                               CAST(SUM(CAST(l_quantity AS BIGINT))
                                    AS BIGINT) AS sq,
                               CAST(COUNT(*) AS BIGINT) AS n
                        FROM lineitem GROUP BY 1),
            c AS (SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100)
                                  AS BIGINT)) AS BIGINT) AS cents
                  FROM lineitem l JOIN st
                    ON l.l_partkey = st.l_partkey
                  WHERE 5 * CAST(l.l_quantity AS BIGINT) * st.n
                        < st.sq)
            SELECT CAST(COALESCE(cents, 0) AS DOUBLE) / 100.0 / 7.0
                       AS avg_yearly
            FROM c
        """,
        "suppliers_sole_late": """
            WITH f AS (SELECT l_orderkey, l_suppkey,
                              epoch_us(l_shipdate) AS us,
                              MIN(epoch_us(l_shipdate)) OVER (
                                  PARTITION BY l_orderkey) AS first_us
                       FROM lineitem),
            o AS (SELECT l_orderkey,
                         COUNT(DISTINCT l_suppkey) AS n_sup
                  FROM f GROUP BY 1),
            late AS (SELECT DISTINCT l_orderkey, l_suppkey
                     FROM f
                     WHERE us > first_us + 30 * 86400000000),
            sole AS (SELECT late.l_orderkey, MIN(l_suppkey) AS s
                     FROM late JOIN o USING (l_orderkey)
                     WHERE o.n_sup >= 2
                     GROUP BY late.l_orderkey
                     HAVING COUNT(*) = 1)
            SELECT s_name,
                   CAST(COUNT(*) AS BIGINT) AS numwait
            FROM sole JOIN supplier ON s = s_suppkey
            GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20
        """,
        "documents_kneser_ney": """
            WITH t AS (SELECT string_split(text, ' ') AS w
                       FROM documents),
            bg AS (SELECT unnest(list_transform(
                       list_zip(w[:len(w)-1], w[2:len(w)]),
                       z -> z[1] || ' ' || z[2])) AS bigram
                   FROM t WHERE len(w) > 1),
            g AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c
                  FROM bg GROUP BY 1),
            sp AS (SELECT bigram, c,
                          string_split(bigram, ' ')[1] AS w1,
                          string_split(bigram, ' ')[2] AS w2
                   FROM g),
            s1 AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
                          CAST(COUNT(*) AS BIGINT) AS n1f
                   FROM sp GROUP BY 1),
            s2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
                   FROM sp GROUP BY 1),
            nbt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
            top AS (SELECT * FROM sp
                    ORDER BY c DESC, bigram LIMIT 20)
            SELECT top.bigram, top.c AS n, s1.c1, s1.n1f, s2.n1b,
                   GREATEST(CAST(top.c AS DOUBLE) - 0.75, 0.0)
                       / CAST(s1.c1 AS DOUBLE)
                   + 0.75 * CAST(s1.n1f AS DOUBLE)
                       / CAST(s1.c1 AS DOUBLE)
                       * (CAST(s2.n1b AS DOUBLE)
                          / CAST((SELECT n FROM nbt) AS DOUBLE))
                       AS p_kn
            FROM top JOIN s1 USING (w1) JOIN s2 USING (w2)
            ORDER BY n DESC, bigram
        """,
        "transcripts_training_windows": f"""
            WITH r AS (SELECT conv_id,
                              CAST(turn_idx AS BIGINT) AS turn_idx,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS n_tokens,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, role, text)
                                  AS rid
                       FROM {transcripts})
            SELECT conv_id, turn_idx, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                            PARTITION BY conv_id ORDER BY rid
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) // 512
                        AS BIGINT) AS window_idx
            FROM r ORDER BY 1, 2
        """,
        "embeddings_mrl_recall": """
            WITH q AS (SELECT vec_id AS query_id, embedding
                       FROM embeddings WHERE vec_id < 8),
            fullr AS (SELECT q.query_id, c.vec_id,
                             ROW_NUMBER() OVER (
                                 PARTITION BY q.query_id
                                 ORDER BY list_cosine_similarity(
                                     q.embedding::DOUBLE[],
                                     c.embedding::DOUBLE[]) DESC,
                                     c.vec_id ASC) AS rk
                      FROM q CROSS JOIN embeddings c),
            halfr AS (SELECT q.query_id, c.vec_id,
                             ROW_NUMBER() OVER (
                                 PARTITION BY q.query_id
                                 ORDER BY list_cosine_similarity(
                                     (q.embedding::DOUBLE[])[1:32],
                                     (c.embedding::DOUBLE[])[1:32])
                                     DESC, c.vec_id ASC) AS rk
                      FROM q CROSS JOIN embeddings c),
            ov AS (SELECT f.query_id,
                          CAST(COUNT(*) AS BIGINT) AS n_overlap
                   FROM (SELECT query_id, vec_id FROM fullr
                         WHERE rk <= 5) f
                   JOIN (SELECT query_id, vec_id FROM halfr
                         WHERE rk <= 5) h
                     USING (query_id, vec_id)
                   GROUP BY 1)
            SELECT query_id,
                   COALESCE(n_overlap, 0) AS n_overlap,
                   CAST(COALESCE(n_overlap, 0) AS DOUBLE) / 5.0
                       AS recall
            FROM (SELECT DISTINCT query_id FROM fullr) a
            LEFT JOIN ov USING (query_id)
            ORDER BY 1
        """,
        "events_cusum_changepoint": """
            WITH g AS (SELECT CAST(epoch_us(ts) // 86400000000
                              AS BIGINT) AS day,
                              CAST(COUNT(*) AS BIGINT) AS x
                       FROM events GROUP BY 1),
            s AS (SELECT day, x,
                         CAST(SUM(x) OVER (ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                             AS p,
                         CAST(ROW_NUMBER() OVER (ORDER BY day)
                              AS BIGINT) AS k,
                         CAST(COUNT(*) OVER () AS BIGINT) AS n,
                         CAST(SUM(x) OVER () AS BIGINT) AS t
                  FROM g),
            d AS (SELECT day, k, n, t, p,
                         abs(n * p - k * t) AS stat
                  FROM s WHERE k < n),
            best AS (SELECT * FROM d
                     ORDER BY stat DESC, day ASC LIMIT 1)
            SELECT CAST(to_timestamp(day * 86400) AS TIMESTAMP)
                       AS change_day,
                   k, CAST(stat AS BIGINT) AS cusum_stat,
                   CAST(p AS DOUBLE) / CAST(k AS DOUBLE)
                       AS mean_before,
                   CAST(t - p AS DOUBLE) / CAST(n - k AS DOUBLE)
                       AS mean_after
            FROM best
        """,
        "transcripts_training_prep": f"""
            WITH o AS (SELECT conv_id, turn_idx, role,
                              replace(COALESCE(text, ''), chr(0), '')
                                  AS text, ts
                       FROM {transcripts}),
            r AS (SELECT conv_id, role, text,
                         ROW_NUMBER() OVER (PARTITION BY conv_id
                             ORDER BY turn_idx, role, text) AS rn
                  FROM o),
            cmd5 AS (SELECT conv_id,
                            md5(string_agg(role || ': ' || text,
                                chr(10) ORDER BY rn)) AS conv_md5
                     FROM r GROUP BY conv_id),
            winner AS (SELECT MIN(conv_id) AS conv_id
                       FROM cmd5 GROUP BY conv_md5),
            k AS (SELECT o.* FROM o JOIN winner USING (conv_id)),
            w AS (SELECT conv_id, turn_idx, role, text,
                         LAG(role || ': ' || text, 3) OVER win AS l3,
                         LAG(role || ': ' || text, 2) OVER win AS l2,
                         LAG(role || ': ' || text, 1) OVER win AS l1
                  FROM k
                  WINDOW win AS (PARTITION BY conv_id
                                 ORDER BY turn_idx, ts)),
            p AS (SELECT conv_id, CAST(turn_idx AS BIGINT)
                             AS turn_idx,
                         concat_ws(chr(10), l3, l2, l1) AS prompt,
                         text AS response
                  FROM w WHERE role = 'assistant'),
            t AS (SELECT conv_id, turn_idx,
                         CAST(len(string_split(prompt, ' '))
                              AS BIGINT) AS prompt_tokens,
                         CAST(len(string_split(response, ' '))
                              AS BIGINT) AS response_tokens,
                         ROW_NUMBER() OVER (PARTITION BY conv_id
                             ORDER BY turn_idx, prompt) AS prid
                  FROM p)
            SELECT conv_id, turn_idx, prompt_tokens, response_tokens,
                   CAST(COALESCE(SUM(prompt_tokens + response_tokens)
                            OVER (PARTITION BY conv_id ORDER BY prid
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) // 1024
                        AS BIGINT) AS window_idx
            FROM t ORDER BY 1, 2
        """,
        "events_trimmed_mean": """
            WITH h AS (SELECT event_type,
                              CAST(ROUND(value * 100) AS BIGINT) AS c,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events WHERE value IS NOT NULL
                       GROUP BY 1, 2),
            w AS (SELECT event_type, c, n,
                         CAST(SUM(n) OVER (PARTITION BY event_type
                             ORDER BY c ROWS UNBOUNDED PRECEDING)
                             AS BIGINT) AS cum,
                         CAST(SUM(n) OVER (PARTITION BY event_type)
                             AS BIGINT) AS tot
                  FROM h),
            t AS (SELECT event_type, tot,
                         GREATEST(LEAST(cum, tot - tot // 10)
                                  - GREATEST(cum - n, tot // 10),
                                  0) AS clip, c
                  FROM w)
            SELECT event_type,
                   CAST(MAX(tot) AS BIGINT) AS n_values,
                   CAST(MAX(tot) - 2 * (MAX(tot) // 10) AS BIGINT)
                       AS n_trimmed,
                   CAST(SUM(clip * c) AS DOUBLE) / 100.0
                       / CAST(MAX(tot) - 2 * (MAX(tot) // 10)
                              AS DOUBLE) AS trimmed_mean
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "transcripts_role_lexical": f"""
            WITH tk AS (SELECT role, unnest(string_split(
                               COALESCE(text, ''), ' ')) AS tok
                        FROM {transcripts}),
            g AS (SELECT role, tok, CAST(COUNT(*) AS BIGINT) AS n
                  FROM tk GROUP BY 1, 2),
            v AS (SELECT role,
                         CAST(SUM(n) AS BIGINT) AS n_tokens,
                         CAST(COUNT(*) AS BIGINT) AS n_distinct,
                         CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS n_hapax
                  FROM g GROUP BY 1),
            t AS (SELECT role, CAST(COUNT(*) AS BIGINT) AS n_turns
                  FROM {transcripts} GROUP BY 1)
            SELECT v.role, t.n_turns, v.n_tokens, v.n_distinct,
                   v.n_hapax,
                   CAST(v.n_distinct AS DOUBLE)
                       / CAST(v.n_tokens AS DOUBLE) AS ttr
            FROM v JOIN t USING (role) ORDER BY 1
        """,
        "transcripts_conv_dedup": f"""
            WITH r AS (SELECT conv_id, role,
                              replace(COALESCE(text, ''), chr(0), '')
                                  AS t,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, role, text)
                                  AS rn
                       FROM {transcripts}),
            p AS (SELECT conv_id,
                         md5(replace(string_agg(role || ': ' || t,
                             chr(10) ORDER BY rn), chr(0), ''))
                             AS conv_md5
                  FROM r GROUP BY conv_id)
            SELECT conv_md5,
                   CAST(COUNT(*) AS BIGINT) AS n_convs,
                   MIN(conv_id) AS example_conv
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "transcripts_episodes": f"""
            WITH r AS (SELECT conv_id, epoch_us(ts) AS us,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS rid
                       FROM {transcripts}),
            s AS (SELECT conv_id, rid,
                         CASE WHEN us - LAG(us) OVER w > 90000000
                              THEN 1 ELSE 0 END AS brk,
                         COALESCE(us - LAG(us) OVER w, 0) AS gap
                  FROM r
                  WINDOW w AS (PARTITION BY conv_id ORDER BY rid)),
            i AS (SELECT conv_id, gap,
                         SUM(brk) OVER (PARTITION BY conv_id
                             ORDER BY rid
                             ROWS UNBOUNDED PRECEDING) AS ep
                  FROM s),
            epi AS (SELECT conv_id, ep,
                           CAST(COUNT(*) AS BIGINT) AS c
                    FROM i GROUP BY 1, 2),
            agg AS (SELECT conv_id,
                           CAST(SUM(c) AS BIGINT) AS n_turns,
                           CAST(COUNT(*) AS BIGINT) AS n_episodes,
                           CAST(MAX(c) AS BIGINT)
                               AS max_episode_turns
                    FROM epi GROUP BY 1),
            mg AS (SELECT conv_id, CAST(MAX(gap) AS BIGINT)
                              AS max_gap_us
                   FROM i GROUP BY 1)
            SELECT agg.conv_id, n_turns, n_episodes,
                   max_episode_turns, max_gap_us
            FROM agg JOIN mg USING (conv_id) ORDER BY 1
        """,
        "transcripts_role_balance": f"""
            WITH r AS (SELECT conv_id, role,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, role, text)
                                  AS rid
                       FROM {transcripts})
            SELECT conv_id,
                   CAST(SUM(CASE WHEN role = 'system' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_system,
                   CAST(SUM(CASE WHEN role = 'user' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_user,
                   CAST(SUM(CASE WHEN role = 'assistant' THEN 1
                                 ELSE 0 END) AS BIGINT)
                       AS n_assistant,
                   CAST(SUM(CASE WHEN role = 'tool' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_tool,
                   (SUM(CASE WHEN role = 'system' THEN 1
                             ELSE 0 END) > 0) AS has_system,
                   MIN(CASE WHEN rid = 1 THEN role END)
                       AS first_role
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "embeddings_qa": """
            WITH v AS (SELECT vec_id,
                              CAST(len(embedding) AS BIGINT) AS d,
                              CAST(ROUND(list_sum(list_transform(
                                  embedding::DOUBLE[], x -> x * x))
                                  * 1e6) AS BIGINT) AS nq
                       FROM embeddings)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(MIN(d) AS BIGINT) AS dim_min,
                   CAST(MAX(d) AS BIGINT) AS dim_max,
                   CAST(SUM(CASE WHEN nq = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_zero,
                   CAST(MIN(nq) AS BIGINT) AS norm2q_min,
                   CAST(MAX(nq) AS BIGINT) AS norm2q_max,
                   CAST(SUM(nq) AS BIGINT) AS norm2q_sum
            FROM v
        """,
        "parts_copurchase_communities": """
            WITH RECURSIVE
            op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                   FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b,
                          CAST(COUNT(*) AS BIGINT) AS w
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2 HAVING COUNT(*) >= 3),
            e AS (SELECT id_a AS a, id_b AS b FROM e0
                  UNION ALL SELECT id_b, id_a FROM e0),
            n AS (SELECT DISTINCT a AS id FROM e),
            r AS (SELECT id, id AS reach FROM n
                  UNION
                  SELECT r.id, e.b FROM r JOIN e ON r.reach = e.a),
            c AS (SELECT id, MIN(reach) AS rep FROM r GROUP BY id)
            SELECT CAST(rep AS BIGINT) AS component,
                   CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "transcripts_preference_pairs": f"""
            WITH r AS (SELECT conv_id, turn_idx, role,
                              replace(COALESCE(text, ''), chr(0), '')
                                  AS t, ts,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS rn
                       FROM {transcripts}),
            u AS (SELECT *, MAX(CASE WHEN role = 'user' THEN rn END)
                              OVER (PARTITION BY conv_id ORDER BY rn
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS urn
                  FROM r),
            pr AS (SELECT DISTINCT b.t AS prompt, a.t AS response
                   FROM u a JOIN u b
                     ON a.conv_id = b.conv_id AND a.urn = b.rn
                   WHERE a.role = 'assistant'),
            k AS (SELECT prompt, response,
                         ROW_NUMBER() OVER (PARTITION BY prompt
                             ORDER BY length(response) DESC,
                                      response ASC) AS rb,
                         COUNT(*) OVER (PARTITION BY prompt) AS nr
                  FROM pr)
            SELECT prompt,
                   CAST(MAX(nr) AS BIGINT) AS n_responses,
                   MIN(CASE WHEN rb = 1 THEN response END) AS chosen,
                   MIN(CASE WHEN rb = nr THEN response END)
                       AS rejected
            FROM k WHERE nr >= 2 GROUP BY 1 ORDER BY 1
        """,
        "transcripts_luhn_audit": f"""
            WITH d AS (SELECT role,
                              unnest(regexp_extract_all(
                                  COALESCE(text, ''), '[0-9]{{8,}}'))
                                  AS num
                       FROM {transcripts}),
            v AS (SELECT role, num,
                         CASE WHEN list_sum(list_transform(
                                range(1, length(num) + 1), i ->
                                CASE WHEN i % 2 = 1
                                     THEN CAST(substr(num,
                                         length(num) - i + 1, 1)
                                         AS INTEGER)
                                     ELSE CASE WHEN 2 * CAST(substr(
                                              num,
                                              length(num) - i + 1, 1)
                                              AS INTEGER) > 9
                                          THEN 2 * CAST(substr(num,
                                              length(num) - i + 1, 1)
                                              AS INTEGER) - 9
                                          ELSE 2 * CAST(substr(num,
                                              length(num) - i + 1, 1)
                                              AS INTEGER) END
                                END)) % 10 = 0
                              THEN 1 ELSE 0 END AS ok
                  FROM d),
            t AS (SELECT role,
                         CAST(COUNT(*) AS BIGINT) AS n_turns_with_ids
                  FROM {transcripts}
                  WHERE regexp_matches(COALESCE(text, ''),
                                       '[0-9]{{8,}}')
                  GROUP BY 1)
            SELECT v.role, t.n_turns_with_ids,
                   CAST(COUNT(*) AS BIGINT) AS n_ids,
                   CAST(SUM(ok) AS BIGINT) AS n_luhn_valid,
                   CAST(COUNT(DISTINCT num) AS BIGINT)
                       AS n_distinct_ids,
                   CAST(COUNT(DISTINCT CASE WHEN ok = 1
                                            THEN num END) AS BIGINT)
                       AS n_distinct_valid
            FROM v JOIN t USING (role)
            GROUP BY 1, 2 ORDER BY 1
        """,
        "transcripts_encoding_audit": f"""
            WITH c AS (SELECT role,
                              len(regexp_extract_all(
                                  COALESCE(text, ''),
                                  '[^\\x00-\\x7f]')) AS na,
                              len(regexp_extract_all(
                                  COALESCE(text, ''),
                                  '[\\x00-\\x08\\x0b\\x0c'
                                  || '\\x0e-\\x1f\\x7f]')) AS ct,
                              len(regexp_extract_all(
                                  COALESCE(text, ''),
                                  '\\x{{FFFD}}')) AS rp
                       FROM {transcripts})
            SELECT role,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(CASE WHEN na > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nonascii_turns,
                   CAST(SUM(na) AS BIGINT) AS n_nonascii_chars,
                   CAST(SUM(CASE WHEN ct > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ctrl_turns,
                   CAST(SUM(ct) AS BIGINT) AS n_ctrl_chars,
                   CAST(SUM(rp) AS BIGINT) AS n_replacement_chars
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "transcripts_tool_transitions": f"""
            WITH s AS (SELECT conv_id, tool,
                              LAG(tool) OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS prev_tool
                       FROM {transcripts}
                       WHERE role = 'tool'
                         AND COALESCE(tool, '') <> ''),
            c AS (SELECT prev_tool, tool AS next_tool,
                         CAST(COUNT(*) AS BIGINT) AS n_trans
                  FROM s WHERE prev_tool IS NOT NULL GROUP BY 1, 2)
            SELECT prev_tool, next_tool, n_trans,
                   CAST(n_trans AS DOUBLE)
                   / CAST(SUM(n_trans) OVER (PARTITION BY prev_tool)
                          AS DOUBLE) AS p
            FROM c ORDER BY 1, 2
        """,
        "parts_copurchase_modularity": """
            WITH RECURSIVE
            op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                   FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b,
                          CAST(COUNT(*) AS BIGINT) AS w
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2),
            es AS (SELECT id_a, id_b FROM e0 WHERE w >= 3),
            se AS (SELECT id_a AS a, id_b AS b FROM es
                   UNION ALL SELECT id_b, id_a FROM es),
            sn AS (SELECT DISTINCT a AS id FROM se),
            r AS (SELECT id, id AS reach FROM sn
                  UNION
                  SELECT r.id, se.b FROM r JOIN se ON r.reach = se.a),
            c AS (SELECT id, MIN(reach) AS rep FROM r GROUP BY id),
            n AS (SELECT DISTINCT p AS id FROM
                  (SELECT id_a AS p FROM e0
                   UNION ALL SELECT id_b FROM e0)),
            asg AS (SELECT n.id, COALESCE(c.rep, n.id) AS rep
                    FROM n LEFT JOIN c USING (id)),
            mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
            intra AS (SELECT ca.rep,
                             CAST(COUNT(*) AS BIGINT) AS l
                      FROM e0 JOIN asg ca ON e0.id_a = ca.id
                              JOIN asg cb ON e0.id_b = cb.id
                      WHERE ca.rep = cb.rep GROUP BY 1),
            degs AS (SELECT p AS id,
                            CAST(COUNT(*) AS BIGINT) AS d
                     FROM (SELECT id_a AS p FROM e0
                           UNION ALL SELECT id_b AS p FROM e0)
                     GROUP BY 1),
            dc AS (SELECT asg.rep, CAST(SUM(d) AS BIGINT) AS dd
                   FROM degs JOIN asg USING (id) GROUP BY 1),
            qq AS (SELECT CAST(SUM(
                            CAST(4 AS HUGEINT) * (SELECT m FROM mm)
                                * CAST(COALESCE(intra.l, 0) AS HUGEINT)
                            - CAST(dc.dd AS HUGEINT) * dc.dd)
                          AS HUGEINT) AS qn,
                          CAST(COUNT(*) AS BIGINT) AS nc
                   FROM dc LEFT JOIN intra USING (rep))
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM n)
                       AS n_nodes,
                   (SELECT m FROM mm) AS m_edges,
                   (SELECT CAST(COALESCE(SUM(l), 0) AS BIGINT)
                    FROM intra) AS intra_edges,
                   nc AS n_communities,
                   CAST(qn AS DOUBLE)
                   / CAST(CAST(4 AS HUGEINT) * (SELECT m FROM mm)
                          * (SELECT m FROM mm) AS DOUBLE)
                       AS modularity
            FROM qq
        """,
        "parts_copurchase_clustering": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                               l_partkey AS p
                        FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2),
            se AS (SELECT id_a AS a, id_b AS b FROM e0
                   UNION ALL SELECT id_b, id_a FROM e0),
            deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT)
                        AS degree
                    FROM se GROUP BY 1),
            tri AS (SELECT s1.a AS id, CAST(COUNT(*) AS BIGINT) AS t
                    FROM se s1 JOIN se s2
                      ON s1.a = s2.a AND s1.b < s2.b
                    JOIN e0 ON e0.id_a = s1.b AND e0.id_b = s2.b
                    GROUP BY 1)
            SELECT deg.id AS p, degree,
                   CAST(COALESCE(t, 0) AS BIGINT) AS n_triangles,
                   CAST(CASE WHEN degree >= 2
                        THEN (2 * COALESCE(t, 0) * 1000000)
                             // (degree * (degree - 1))
                        ELSE 0 END AS BIGINT) AS clustering_q
            FROM deg LEFT JOIN tri USING (id) ORDER BY 1
        """,
        "events_value_moments": """
            WITH c AS (SELECT event_type,
                              CAST(ROUND(value * 100) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL),
            s AS (SELECT event_type,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(c) AS BIGINT) AS s1
                  FROM c GROUP BY 1),
            a AS (SELECT event_type, n,
                         (s1 - ((s1 % n) + n) % n) // n AS anchor
                  FROM s),
            d AS (SELECT c.event_type, a.n, a.anchor,
                         CAST(c.c - a.anchor AS HUGEINT) AS d
                  FROM c JOIN a USING (event_type)),
            g AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                         CAST(MAX(anchor) AS BIGINT) AS anchor,
                         SUM(d) AS d1, SUM(d * d) AS d2,
                         SUM(d * d * d) AS d3,
                         SUM(d * d * d * d) AS d4
                  FROM d GROUP BY 1),
            f AS (SELECT event_type, n, anchor,
                         CAST(d1 AS DOUBLE) / CAST(n AS DOUBLE) AS e,
                         CAST(d2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                         CAST(d3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                         CAST(d4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
                  FROM g)
            SELECT event_type, n AS n_values,
                   CAST(anchor AS DOUBLE) + e AS mean_cents,
                   r2 - e * e AS var_cents2,
                   CASE WHEN r2 - e * e > 0 THEN
                       (r3 - 3.0 * e * r2 + 2.0 * (e * e * e))
                       / ((r2 - e * e) * sqrt(r2 - e * e))
                   END AS skewness,
                   CASE WHEN r2 - e * e > 0 THEN
                       (r4 - 4.0 * e * r3 + 6.0 * (e * e) * r2
                        - 3.0 * (e * e * e * e))
                       / ((r2 - e * e) * (r2 - e * e)) - 3.0
                   END AS kurt_excess
            FROM f ORDER BY 1
        """,
        "transcripts_conv_turn_jaccard": f"""
            WITH l AS (SELECT DISTINCT conv_id,
                              role || ': ' || replace(
                                  COALESCE(text, ''), chr(0), '')
                                  AS line
                       FROM {transcripts}),
            sizes AS (SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n
                      FROM l GROUP BY 1),
            inter AS (SELECT a.conv_id AS id_a, b.conv_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS c
                      FROM l a JOIN l b
                        ON a.line = b.line
                       AND a.conv_id < b.conv_id
                      GROUP BY 1, 2)
            SELECT id_a, id_b,
                   ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
            FROM inter JOIN sizes sa ON inter.id_a = sa.conv_id
                       JOIN sizes sb ON inter.id_b = sb.conv_id
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.1
        """,
        "documents_query_likelihood": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl
                   FROM d),
            tfc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
                    GROUP BY doc_id, tok),
            stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
            q AS (SELECT doc_id AS qid FROM documents
                  ORDER BY md5(doc_id::VARCHAR || chr(31) || '13'),
                           doc_id
                  LIMIT 16),
            qt AS (SELECT DISTINCT q.qid, tfc.tok
                   FROM q JOIN tfc ON tfc.doc_id = q.qid),
            cf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS cf
                   FROM tfc
                   WHERE tok IN (SELECT DISTINCT tok FROM qt)
                   GROUP BY tok),
            qn AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS nq,
                          CAST(SUM(CAST(ROUND(LN(2000.0
                              * (cf.cf / stats.tot)) * 1000000.0)
                              AS BIGINT)) AS BIGINT) AS qconst
                   FROM qt JOIN cf USING (tok), stats
                   GROUP BY qid),
            ov AS (SELECT qt.qid, tfc.doc_id,
                          CAST(SUM(CAST(ROUND(LN(1.0 + tfc.tf
                              / (2000.0 * (cf.cf / stats.tot)))
                              * 1000000.0) AS BIGINT)) AS BIGINT)
                              AS osum
                   FROM qt
                   JOIN tfc ON qt.tok = tfc.tok
                   JOIN cf ON cf.tok = qt.tok, stats
                   WHERE tfc.doc_id <> qt.qid
                   GROUP BY qt.qid, tfc.doc_id),
            sc AS (SELECT ov.qid, ov.doc_id,
                          qn.qconst + ov.osum
                          - qn.nq * CAST(ROUND(LN(dl.dl + 2000.0)
                                * 1000000.0) AS BIGINT) AS score
                   FROM ov JOIN qn USING (qid)
                           JOIN dl ON dl.doc_id = ov.doc_id),
            r AS (SELECT qid, doc_id, score,
                         ROW_NUMBER() OVER (PARTITION BY qid
                             ORDER BY score DESC, doc_id) AS rn
                  FROM sc)
            SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank,
                   doc_id, score
            FROM r WHERE rn <= 5
        """,
        "events_bloom_filter": """
            WITH u AS (SELECT DISTINCT user_id,
                              CASE WHEN user_id % 7 = 0
                                   THEN 1 ELSE 0 END AS is_mem
                       FROM events),
            hp AS (SELECT user_id, is_mem,
                          (4096 * (strpos('0123456789abcdef',
                               substr(md5(user_id::VARCHAR || chr(31)
                                   || j::VARCHAR), 1, 1)) - 1)
                           + 256 * (strpos('0123456789abcdef',
                               substr(md5(user_id::VARCHAR || chr(31)
                                   || j::VARCHAR), 2, 1)) - 1)
                           + 16 * (strpos('0123456789abcdef',
                               substr(md5(user_id::VARCHAR || chr(31)
                                   || j::VARCHAR), 3, 1)) - 1)
                           + (strpos('0123456789abcdef',
                               substr(md5(user_id::VARCHAR || chr(31)
                                   || j::VARCHAR), 4, 1)) - 1))
                              % 512 AS pos
                   FROM u, UNNEST([0, 1, 2, 3]) AS t(j)),
            bits AS (SELECT DISTINCT pos FROM hp WHERE is_mem = 1),
            kp AS (SELECT DISTINCT user_id, is_mem, pos FROM hp),
            miss AS (SELECT kp.user_id, MAX(kp.is_mem) AS is_mem,
                            CAST(SUM(CASE WHEN b.pos IS NULL
                                     THEN 1 ELSE 0 END) AS BIGINT)
                                AS nmiss
                     FROM kp LEFT JOIN bits b ON kp.pos = b.pos
                     GROUP BY kp.user_id)
            SELECT CAST(SUM(is_mem) AS BIGINT) AS n_members,
                   CAST(COUNT(*) AS BIGINT) AS n_probes,
                   CAST(SUM(CASE WHEN nmiss = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits,
                   CAST(SUM(CASE WHEN nmiss = 0 AND is_mem = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_false_positives,
                   CASE WHEN COUNT(*) - SUM(is_mem) > 0 THEN
                       CAST(SUM(CASE WHEN nmiss = 0 AND is_mem = 0
                                     THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) - SUM(is_mem) AS DOUBLE)
                   ELSE 0.0 END AS fp_rate
            FROM miss
        """,
        "transcripts_outlinks": f"""
            WITH x AS (SELECT conv_id,
                              regexp_extract_all(COALESCE(text, ''),
                                  'href="([^"]*)"', 1) AS tg
                       FROM {transcripts}),
            r AS (SELECT conv_id, unnest(tg) AS target FROM x),
            td AS (SELECT conv_id,
                          unnest(list_distinct(tg)) AS target
                   FROM x),
            tc AS (SELECT target, CAST(COUNT(*) AS BIGINT) AS n_turns
                   FROM td GROUP BY 1),
            lc AS (SELECT target, CAST(COUNT(*) AS BIGINT) AS n_links
                   FROM r GROUP BY 1),
            cc AS (SELECT target,
                          CAST(COUNT(DISTINCT conv_id) AS BIGINT)
                              AS n_convs
                   FROM r GROUP BY 1)
            SELECT target, n_links, n_turns, n_convs
            FROM lc JOIN tc USING (target) JOIN cc USING (target)
            ORDER BY 1
        """,
        "transcripts_html_tags": f"""
            WITH x AS (SELECT conv_id,
                              regexp_extract_all(COALESCE(text, ''),
                                  '<([a-zA-Z][a-zA-Z0-9]*)', 1) AS tg
                       FROM {transcripts}),
            r AS (SELECT conv_id, unnest(tg) AS tag FROM x),
            td AS (SELECT conv_id, unnest(list_distinct(tg)) AS tag
                   FROM x),
            tc AS (SELECT tag, CAST(COUNT(*) AS BIGINT) AS n_turns
                   FROM td GROUP BY 1),
            lc AS (SELECT tag, CAST(COUNT(*) AS BIGINT) AS n_tags
                   FROM r GROUP BY 1),
            cc AS (SELECT tag,
                          CAST(COUNT(DISTINCT conv_id) AS BIGINT)
                              AS n_convs
                   FROM r GROUP BY 1)
            SELECT tag, n_tags, n_turns, n_convs
            FROM lc JOIN tc USING (tag) JOIN cc USING (tag)
            ORDER BY 1
        """,
        "transcripts_ngram_loop": f"""
            WITH t AS (SELECT role,
                              string_split(COALESCE(text, ''), ' ')
                                  AS toks,
                              ROW_NUMBER() OVER (
                                  ORDER BY conv_id, turn_idx) AS rn
                       FROM {transcripts}),
            g AS (SELECT role, rn,
                         unnest(list_transform(
                             range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1]
                                  || ' ' || toks[i+2])) AS gram
                  FROM t WHERE len(toks) >= 3),
            c AS (SELECT role, rn, gram,
                         CAST(COUNT(*) AS BIGINT) AS m
                  FROM g GROUP BY 1, 2, 3),
            r AS (SELECT role, rn, MAX(m) AS mx FROM c GROUP BY 1, 2),
            base AS (SELECT role, CAST(COUNT(*) AS BIGINT) AS n_turns
                     FROM {transcripts} GROUP BY 1)
            SELECT b.role, b.n_turns,
                   CAST(COALESCE(SUM(CASE WHEN mx >= 3
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_looping_turns,
                   CAST(COALESCE(MAX(mx), 0) AS BIGINT) AS max_repeat
            FROM base b LEFT JOIN r ON r.role = b.role
            GROUP BY 1, 2 ORDER BY 1
        """,
        "embeddings_triplet_margin": """
            WITH u AS (SELECT vec_id, label, i,
                              CAST(ROUND(embedding[i] * 1048576.0)
                                   AS BIGINT) AS q
                       FROM embeddings,
                            UNNEST(range(1, len(embedding) + 1))
                                AS t(i)),
            ua AS (SELECT * FROM u WHERE vec_id % 10 = 0),
            d AS (SELECT a.vec_id AS ia, a.label AS la,
                         b.vec_id AS ib, b.label AS lb,
                         CAST(SUM((a.q - b.q) * (a.q - b.q))
                              AS BIGINT) AS d2
                  FROM ua a JOIN u b
                    ON a.i = b.i AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2, 3, 4),
            pos AS (SELECT ia, ib, d2,
                           ROW_NUMBER() OVER (PARTITION BY ia
                               ORDER BY d2, ib) AS rn
                    FROM d WHERE la = lb),
            neg AS (SELECT ia, ib, d2,
                           ROW_NUMBER() OVER (PARTITION BY ia
                               ORDER BY d2, ib) AS rn
                    FROM d WHERE la <> lb)
            SELECT q.vec_id, CAST(q.label AS BIGINT) AS label,
                   pos.ib AS pos_id, neg.ib AS neg_id,
                   pos.d2 AS d2_pos, neg.d2 AS d2_neg,
                   neg.d2 - pos.d2 AS margin,
                   CAST(CASE WHEN neg.d2 < pos.d2 THEN 1 ELSE 0 END
                        AS BIGINT) AS violation
            FROM (SELECT vec_id, label FROM embeddings
                  WHERE vec_id % 10 = 0) q
            JOIN pos ON pos.ia = q.vec_id AND pos.rn = 1
            JOIN neg ON neg.ia = q.vec_id AND neg.rn = 1
            ORDER BY 1
        """,
        "documents_rank_agreement": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents),
            dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl
                   FROM d),
            tfc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
                    GROUP BY doc_id, tok),
            stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                             CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
            q AS (SELECT doc_id AS qid FROM documents
                  ORDER BY md5(doc_id::VARCHAR || chr(31) || '13'),
                           doc_id
                  LIMIT 16),
            qt AS (SELECT DISTINCT q.qid, tfc.tok
                   FROM q JOIN tfc ON tfc.doc_id = q.qid),
            df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
                          CAST(SUM(tf) AS BIGINT) AS cf
                   FROM tfc
                   WHERE tok IN (SELECT DISTINCT tok FROM qt)
                   GROUP BY tok),
            idf AS (SELECT tok, cf,
                           CAST(ROUND(LN(((n - df) + 0.5) / (df + 0.5)
                                         + 1.0) * 1000000.0) AS BIGINT)
                               AS qidf
                    FROM df, stats),
            bm AS (SELECT qt.qid, tfc.doc_id,
                          CAST(SUM(CAST(ROUND(idf.qidf * (tfc.tf * 2.2)
                               / (tfc.tf + 1.2 * ((1.0 - 0.75)
                                  + 0.75 * (dl.dl / (stats.tot
                                                     / stats.n)))))
                              AS BIGINT)) AS BIGINT) AS score
                   FROM qt
                   JOIN tfc ON qt.tok = tfc.tok
                   JOIN idf ON idf.tok = qt.tok
                   JOIN dl ON dl.doc_id = tfc.doc_id, stats
                   WHERE tfc.doc_id <> qt.qid
                     AND idf.qidf <> 0
                   GROUP BY qt.qid, tfc.doc_id),
            qn AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS nq,
                          CAST(SUM(CAST(ROUND(LN(2000.0
                              * (idf.cf / stats.tot)) * 1000000.0)
                              AS BIGINT)) AS BIGINT) AS qconst
                   FROM qt JOIN idf USING (tok), stats
                   GROUP BY qid),
            ov AS (SELECT qt.qid, tfc.doc_id,
                          CAST(SUM(CAST(ROUND(LN(1.0 + tfc.tf
                              / (2000.0 * (idf.cf / stats.tot)))
                              * 1000000.0) AS BIGINT)) AS BIGINT)
                              AS osum
                   FROM qt
                   JOIN tfc ON qt.tok = tfc.tok
                   JOIN idf ON idf.tok = qt.tok, stats
                   WHERE tfc.doc_id <> qt.qid
                   GROUP BY qt.qid, tfc.doc_id),
            ql AS (SELECT ov.qid, ov.doc_id,
                          qn.qconst + ov.osum
                          - qn.nq * CAST(ROUND(LN(dl.dl + 2000.0)
                                * 1000000.0) AS BIGINT) AS score
                   FROM ov JOIN qn USING (qid)
                           JOIN dl ON dl.doc_id = ov.doc_id),
            tb AS (SELECT qid, doc_id FROM (
                       SELECT qid, doc_id,
                              ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id) AS rn
                       FROM bm) WHERE rn <= 5),
            tq AS (SELECT qid, doc_id FROM (
                       SELECT qid, doc_id,
                              ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id) AS rn
                       FROM ql) WHERE rn <= 5),
            nb AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS nb
                   FROM tb GROUP BY 1),
            nqc AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS nq
                    FROM tq GROUP BY 1),
            ovl AS (SELECT tb.qid, CAST(COUNT(*) AS BIGINT) AS ov
                    FROM tb JOIN tq USING (qid, doc_id) GROUP BY 1)
            SELECT nqc.qid AS query_id,
                   COALESCE(ovl.ov, 0) AS n_overlap,
                   CAST(COALESCE(ovl.ov, 0) AS DOUBLE)
                   / CAST(COALESCE(nb.nb, 0) + nqc.nq
                          - COALESCE(ovl.ov, 0) AS DOUBLE) AS jaccard
            FROM nqc
            LEFT JOIN nb ON nb.qid = nqc.qid
            LEFT JOIN ovl ON ovl.qid = nqc.qid
            ORDER BY 1
        """,
        "events_count_min": """
            WITH e AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
                       FROM events GROUP BY 1),
            h AS (SELECT user_id, c, j,
                         (4096 * (strpos('0123456789abcdef',
                              substr(md5(user_id::VARCHAR || chr(31)
                                  || j::VARCHAR), 1, 1)) - 1)
                          + 256 * (strpos('0123456789abcdef',
                              substr(md5(user_id::VARCHAR || chr(31)
                                  || j::VARCHAR), 2, 1)) - 1)
                          + 16 * (strpos('0123456789abcdef',
                              substr(md5(user_id::VARCHAR || chr(31)
                                  || j::VARCHAR), 3, 1)) - 1)
                          + (strpos('0123456789abcdef',
                              substr(md5(user_id::VARCHAR || chr(31)
                                  || j::VARCHAR), 4, 1)) - 1))
                             % 256 AS pos
                  FROM e, UNNEST([0, 1, 2, 3]) AS t(j)),
            cell AS (SELECT j, pos, CAST(SUM(c) AS BIGINT) AS s
                     FROM h GROUP BY 1, 2),
            est AS (SELECT h.user_id,
                           CAST(MIN(cell.s) AS BIGINT) AS cms
                    FROM h JOIN cell USING (j, pos)
                    GROUP BY h.user_id)
            SELECT e.user_id, e.c AS n_exact, est.cms AS cms_est,
                   est.cms - e.c AS overestimate
            FROM e JOIN est USING (user_id) ORDER BY 1
        """,
        "transcripts_verbosity_ols": f"""
            WITH r AS (SELECT conv_id, turn_idx, role, ts,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts}),
            w AS (SELECT role, tok AS y,
                         (COALESCE(LAG(tok, 1) OVER win, 0)
                          + COALESCE(LAG(tok, 2) OVER win, 0)
                          + COALESCE(LAG(tok, 3) OVER win, 0)) AS x
                  FROM r WINDOW win AS (PARTITION BY conv_id
                                        ORDER BY turn_idx, ts)),
            p AS (SELECT x, y FROM w WHERE role = 'assistant'),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS HUGEINT) AS sx,
                         CAST(SUM(y) AS HUGEINT) AS sy,
                         SUM(CAST(x AS HUGEINT) * y) AS sxy,
                         SUM(CAST(x AS HUGEINT) * x) AS sxx,
                         SUM(CAST(y AS HUGEINT) * y) AS syy
                  FROM p)
            SELECT n AS n_pairs,
                   CASE WHEN n * sxx - sx * sx <> 0 THEN
                       CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) END
                       AS slope,
                   CASE WHEN n * sxx - sx * sx <> 0 THEN
                       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE))
                         * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   END AS intercept,
                   CASE WHEN n * sxx - sx * sx <> 0
                             AND n * syy - sy * sy <> 0 THEN
                       (CAST(n * sxy - sx * sy AS DOUBLE)
                        * CAST(n * sxy - sx * sy AS DOUBLE))
                       / (CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   END AS r2
            FROM s
        """,
        "documents_extractive_topsent": """
            WITH p AS (SELECT doc_id,
                              string_split_regex(COALESCE(text, ''),
                                                 '[.!?]+') AS l
                       FROM documents),
            s AS (SELECT doc_id, i AS sent_idx,
                         trim(l[i], ' ') AS sent
                  FROM p, UNNEST(range(1, len(l) + 1)) AS t(i)
                  WHERE trim(l[i], ' ') <> ''),
            tk AS (SELECT doc_id, sent_idx,
                          unnest(string_split(sent, ' ')) AS tok
                   FROM s),
            dfg AS (SELECT tok,
                           CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                               AS df
                    FROM tk GROUP BY 1),
            nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                   FROM documents),
            idf AS (SELECT tok,
                           CAST(ROUND(LN(n / df) * 1000000.0)
                                AS BIGINT) AS w
                    FROM dfg, nn),
            sc AS (SELECT tk.doc_id, tk.sent_idx,
                          CAST(SUM(idf.w) AS BIGINT) AS score
                   FROM tk JOIN idf USING (tok) GROUP BY 1, 2),
            r AS (SELECT doc_id, sent_idx, score,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, sent_idx) AS rn
                  FROM sc)
            SELECT doc_id, CAST(rn AS BIGINT) AS rank,
                   CAST(sent_idx AS BIGINT) AS sent_idx, score
            FROM r WHERE rn <= 2
        """,
        "embeddings_knn_eval": """
            WITH u AS (SELECT vec_id, label, i,
                              CAST(ROUND(embedding[i] * 1048576.0)
                                   AS BIGINT) AS q
                       FROM embeddings,
                            UNNEST(range(1, len(embedding) + 1))
                                AS t(i)),
            ua AS (SELECT * FROM u WHERE vec_id % 10 = 0),
            d AS (SELECT a.vec_id AS ia, a.label AS la,
                         b.vec_id AS ib, b.label AS lb,
                         CAST(SUM((a.q - b.q) * (a.q - b.q))
                              AS BIGINT) AS d2
                  FROM ua a JOIN u b
                    ON a.i = b.i AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2, 3, 4),
            nn1 AS (SELECT ia, la, lb,
                           ROW_NUMBER() OVER (PARTITION BY ia
                               ORDER BY d2, ib) AS rn
                    FROM d)
            SELECT CAST(la AS BIGINT) AS label,
                   CAST(COUNT(*) AS BIGINT) AS n_anchors,
                   CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct,
                   CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS accuracy
            FROM nn1 WHERE rn = 1 GROUP BY 1 ORDER BY 1
        """,
        "transcripts_number_density": f"""
            WITH t AS (SELECT role, COALESCE(text, '') AS tx
                       FROM {transcripts}),
            tk AS (SELECT role, unnest(string_split(tx, ' ')) AS tok
                   FROM t),
            n AS (SELECT role,
                         CAST(COUNT(*) AS BIGINT) AS n_tokens,
                         CAST(SUM(CASE WHEN regexp_matches(tok,
                             '^\\$?[0-9][0-9.,%]*$')
                             THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_numeric
                  FROM tk GROUP BY 1),
            r AS (SELECT role,
                         CAST(COUNT(*) AS BIGINT) AS n_turns,
                         CAST(SUM(CASE WHEN regexp_matches(tx,
                             '[\\d,]+\\.\\d{{2}}')
                             THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_amount_turns
                  FROM t GROUP BY 1)
            SELECT r.role, r.n_turns, n.n_tokens,
                   n.n_numeric AS n_numeric_tokens,
                   r.n_amount_turns,
                   CAST(n.n_numeric AS DOUBLE)
                   / CAST(n.n_tokens AS DOUBLE) AS numeric_density
            FROM r JOIN n USING (role) ORDER BY 1
        """,
        "transcripts_conv_redundancy": f"""
            WITH l AS (SELECT conv_id,
                              role || ': ' || replace(
                                  COALESCE(text, ''), chr(0), '')
                                  AS line
                       FROM {transcripts}),
            g AS (SELECT conv_id, line,
                         CAST(COUNT(*) AS BIGINT) AS m
                  FROM l GROUP BY 1, 2)
            SELECT conv_id,
                   CAST(SUM(m) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(m) - COUNT(*) AS BIGINT) AS n_dup_lines,
                   CAST(MAX(m) AS BIGINT) AS max_multiplicity,
                   1.0 - CAST(COUNT(*) AS DOUBLE)
                         / CAST(SUM(m) AS DOUBLE) AS redundancy
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "transcripts_markup_overhead": f"""
            WITH t AS (SELECT role, COALESCE(text, '') AS tx
                       FROM {transcripts}),
            c AS (SELECT role,
                         CAST(length(tx) AS BIGINT) AS raw,
                         CAST(length(regexp_replace(tx, '<[^>]*>',
                                                    '', 'g'))
                              AS BIGINT) AS stripped
                  FROM t)
            SELECT role,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(raw) AS BIGINT) AS raw_chars,
                   CAST(SUM(stripped) AS BIGINT) AS stripped_chars,
                   1.0 - CAST(SUM(stripped) AS DOUBLE)
                         / CAST(SUM(raw) AS DOUBLE)
                       AS markup_fraction
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "events_log2_histogram": """
            WITH c AS (SELECT event_type,
                              CAST(ROUND(value * 100) AS BIGINT) AS c
                       FROM events WHERE value IS NOT NULL),
            b AS (SELECT event_type,
                         CASE WHEN c > 0
                              THEN CAST(FLOOR(LOG2(c)) AS BIGINT)
                              ELSE -1 END AS bucket,
                         c
                  FROM c)
            SELECT event_type, bucket,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(c) AS BIGINT) AS min_cents,
                   CAST(MAX(c) AS BIGINT) AS max_cents
            FROM b GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "transcripts_id_leakage": f"""
            WITH d AS (SELECT conv_id,
                              unnest(list_distinct(
                                  regexp_extract_all(
                                      COALESCE(text, ''),
                                      '[0-9]{{8,}}'))) AS num
                       FROM {transcripts}),
            g AS (SELECT num, conv_id,
                         CAST(COUNT(*) AS BIGINT) AS t
                  FROM d GROUP BY 1, 2)
            SELECT num,
                   CAST(COUNT(*) AS BIGINT) AS n_convs,
                   CAST(SUM(t) AS BIGINT) AS n_turns,
                   MIN(conv_id) AS example_conv
            FROM g GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1
        """,
        "transcripts_depth_profile": f"""
            WITH t AS (SELECT role,
                              CASE WHEN turn_idx < 5 THEN 0
                                   WHEN turn_idx < 10 THEN 1
                                   WHEN turn_idx < 20 THEN 2
                                   ELSE 3 END AS depth_bucket,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts})
            SELECT role, CAST(depth_bucket AS BIGINT)
                       AS depth_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(tok) AS BIGINT) AS sum_tokens,
                   CAST(SUM(tok) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_tokens
            FROM t GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "transcripts_sft_quality_gate": f"""
            WITH r AS (SELECT conv_id, turn_idx, role,
                              replace(COALESCE(text, ''), chr(0), '')
                                  AS t, ts,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS rn
                       FROM {transcripts}),
            l AS (SELECT *, role || ': ' || t AS line FROM r),
            pr AS (SELECT conv_id, rn, role, t AS resp,
                          concat_ws(chr(10),
                              CASE WHEN rn > 3
                                   THEN LAG(line, 3) OVER w END,
                              CASE WHEN rn > 2
                                   THEN LAG(line, 2) OVER w END,
                              CASE WHEN rn > 1
                                   THEN LAG(line, 1) OVER w END)
                              AS prompt
                   FROM l WINDOW w AS (PARTITION BY conv_id
                                       ORDER BY rn)),
            pa AS (SELECT conv_id, rn, resp, prompt,
                          string_split(resp, ' ') AS tk
                   FROM pr WHERE role = 'assistant'),
            gmax AS (SELECT conv_id, rn, MAX(m) AS mx FROM (
                        SELECT conv_id, rn, gram,
                               CAST(COUNT(*) AS BIGINT) AS m
                        FROM (SELECT conv_id, rn,
                                     unnest(list_transform(
                                         range(1, len(tk) - 1),
                                         i -> tk[i] || ' '
                                              || tk[i+1] || ' '
                                              || tk[i+2])) AS gram
                              FROM pa WHERE len(tk) >= 3)
                        GROUP BY 1, 2, 3)
                     GROUP BY 1, 2),
            fl AS (SELECT pa.conv_id, pa.rn,
                          CASE WHEN len(tk) < 8
                               THEN 1 ELSE 0 END AS too_short,
                          CASE WHEN len(tk) > 2048
                               THEN 1 ELSE 0 END AS too_long,
                          CASE WHEN prompt = ''
                               THEN 1 ELSE 0 END AS no_prompt,
                          CASE WHEN COALESCE(gmax.mx, 0) >= 3
                               THEN 1 ELSE 0 END AS looping
                   FROM pa LEFT JOIN gmax
                     ON pa.conv_id = gmax.conv_id
                    AND pa.rn = gmax.rn)
            SELECT 'too_short' AS reason,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(too_short) AS BIGINT) AS n_flagged
            FROM fl
            UNION ALL SELECT 'too_long', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(too_long) AS BIGINT) FROM fl
            UNION ALL SELECT 'no_prompt', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(no_prompt) AS BIGINT) FROM fl
            UNION ALL SELECT 'looping', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(looping) AS BIGINT) FROM fl
            UNION ALL SELECT 'pass', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN too_short = 0
                                  AND too_long = 0
                                  AND no_prompt = 0
                                  AND looping = 0
                            THEN 1 ELSE 0 END) AS BIGINT) FROM fl
        """,
        "transcripts_dedup_yield": f"""
            WITH r AS (SELECT conv_id, role,
                              replace(COALESCE(text, ''), chr(0), '')
                                  AS t,
                              ROW_NUMBER() OVER (
                                  PARTITION BY conv_id
                                  ORDER BY turn_idx, role, text)
                                  AS rn
                       FROM {transcripts}),
            conv AS (SELECT conv_id,
                            md5(replace(string_agg(
                                role || ': ' || t, chr(10)
                                ORDER BY rn), chr(0), '')) AS digest,
                            CAST(SUM(CASE WHEN role = 'assistant'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                                AS n_pairs,
                            CAST(SUM(CASE WHEN role = 'assistant'
                                     THEN len(string_split(t, ' '))
                                     ELSE 0 END) AS BIGINT) AS tok
                     FROM r GROUP BY conv_id),
            w AS (SELECT digest, MIN(conv_id) AS win
                  FROM conv GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
                   CAST(COUNT(DISTINCT conv.digest) AS BIGINT)
                       AS n_convs_kept,
                   CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN conv.conv_id = w.win
                            THEN n_pairs ELSE 0 END) AS BIGINT)
                       AS n_pairs_kept,
                   CAST(SUM(tok) AS BIGINT) AS resp_tokens,
                   CAST(SUM(CASE WHEN conv.conv_id = w.win
                            THEN tok ELSE 0 END) AS BIGINT)
                       AS resp_tokens_kept
            FROM conv JOIN w ON conv.digest = w.digest
        """,
        "documents_term_burstiness": """
            WITH tk AS (SELECT doc_id, unnest(string_split(
                               COALESCE(text, ''), ' ')) AS tok
                        FROM documents),
            g AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf,
                         CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                             AS df
                  FROM tk GROUP BY 1),
            sc AS (SELECT tok, cf, df,
                          CAST(cf * 1000000 // df AS BIGINT)
                              AS burst_q
                   FROM g WHERE df >= 5),
            r AS (SELECT tok, cf, df, burst_q,
                         ROW_NUMBER() OVER (ORDER BY burst_q DESC,
                                            tok) AS rank
                  FROM sc)
            SELECT tok, cf, df, burst_q, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 20 ORDER BY rank
        """,
        "transcripts_length_quantiles": f"""
            WITH t AS (SELECT role,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts})
            SELECT role, CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(quantile_disc(tok, 0.5) AS BIGINT) AS p50,
                   CAST(quantile_disc(tok, 0.9) AS BIGINT) AS p90,
                   CAST(quantile_disc(tok, 0.99) AS BIGINT) AS p99
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "transcripts_table_stats": f"""
            WITH c AS (SELECT conv_id,
                              len(regexp_extract_all(
                                  COALESCE(text, ''), '<table'))
                                  AS nt,
                              len(regexp_extract_all(
                                  COALESCE(text, ''), '<tr')) AS nr,
                              len(regexp_extract_all(
                                  COALESCE(text, ''), '<td')) AS nc
                       FROM {transcripts}),
            g AS (SELECT conv_id,
                         CAST(SUM(CASE WHEN nt > 0
                                  THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_table_turns,
                         CAST(SUM(nt) AS BIGINT) AS n_tables,
                         CAST(SUM(nr) AS BIGINT) AS n_rows,
                         CAST(SUM(nc) AS BIGINT) AS n_cells
                  FROM c GROUP BY 1)
            SELECT conv_id, n_table_turns, n_tables, n_rows, n_cells,
                   CASE WHEN n_rows > 0 THEN
                       CAST(n_cells AS DOUBLE)
                       / CAST(n_rows AS DOUBLE)
                   ELSE 0.0 END AS cells_per_row
            FROM g WHERE n_tables > 0 ORDER BY 1
        """,
        "events_type_audience_overlap": """
            WITH tu AS (SELECT DISTINCT event_type, user_id
                        FROM events),
            sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                   FROM tu GROUP BY 1),
            inter AS (SELECT a.event_type AS type_a,
                             b.event_type AS type_b,
                             CAST(COUNT(*) AS BIGINT) AS n_shared
                      FROM tu a JOIN tu b
                        ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
                      GROUP BY 1, 2)
            SELECT type_a, type_b, n_shared,
                   sa.n + sb.n - n_shared AS n_union,
                   CAST(n_shared AS DOUBLE)
                   / CAST(sa.n + sb.n - n_shared AS DOUBLE)
                       AS jaccard
            FROM inter JOIN sz sa ON inter.type_a = sa.event_type
                       JOIN sz sb ON inter.type_b = sb.event_type
            ORDER BY 1, 2
        """,
        "events_wow_contribution": """
            WITH g AS (SELECT event_type,
                              date_trunc('week', ts) AS wk,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            sel AS (SELECT wk, ROW_NUMBER() OVER (ORDER BY wk DESC)
                        AS rn
                    FROM (SELECT DISTINCT wk FROM g)),
            base AS (SELECT event_type,
                            CAST(COALESCE(SUM(CASE WHEN g.wk =
                                (SELECT wk FROM sel WHERE rn = 3)
                                THEN n END), 0) AS BIGINT) AS n_prev,
                            CAST(COALESCE(SUM(CASE WHEN g.wk =
                                (SELECT wk FROM sel WHERE rn = 2)
                                THEN n END), 0) AS BIGINT) AS n_last
                     FROM g GROUP BY 1),
            f AS (SELECT * FROM base WHERE n_prev + n_last > 0),
            t AS (SELECT CAST(SUM(n_last - n_prev) AS BIGINT) AS td
                  FROM f)
            SELECT event_type, n_prev, n_last,
                   n_last - n_prev AS delta,
                   CASE WHEN (SELECT td FROM t) <> 0 THEN
                       CAST(n_last - n_prev AS DOUBLE)
                       / CAST((SELECT td FROM t) AS DOUBLE)
                   ELSE 0.0 END AS delta_share
            FROM f ORDER BY 1
        """,
        "transcripts_md_links": f"""
            WITH x AS (SELECT conv_id,
                              regexp_extract_all(COALESCE(text, ''),
                                  '\\[[^\\]]*\\]\\(([^)]*)\\)',
                                  1) AS tg
                       FROM {transcripts}),
            r AS (SELECT conv_id, unnest(tg) AS target FROM x),
            td AS (SELECT conv_id,
                          unnest(list_distinct(tg)) AS target
                   FROM x),
            tc AS (SELECT target, CAST(COUNT(*) AS BIGINT) AS n_turns
                   FROM td GROUP BY 1),
            lc AS (SELECT target, CAST(COUNT(*) AS BIGINT) AS n_links
                   FROM r GROUP BY 1),
            cc AS (SELECT target,
                          CAST(COUNT(DISTINCT conv_id) AS BIGINT)
                              AS n_convs
                   FROM r GROUP BY 1)
            SELECT target, n_links, n_turns, n_convs
            FROM lc JOIN tc USING (target) JOIN cc USING (target)
            ORDER BY 1
        """,
        "parts_cf_cosine": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                               l_partkey AS p
                        FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b,
                          CAST(COUNT(*) AS BIGINT) AS w
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2),
            sz AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n
                   FROM op GROUP BY 1),
            sc AS (SELECT id_a, id_b, w, sa.n AS n_a, sb.n AS n_b,
                          CAST(w * w * 1000000000000
                               // (sa.n * sb.n) AS BIGINT) AS cos_q
                   FROM e0 JOIN sz sa ON e0.id_a = sa.p
                           JOIN sz sb ON e0.id_b = sb.p),
            r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cos_q DESC,
                              id_a, id_b) AS rank
                  FROM sc)
            SELECT id_a, id_b, w, n_a, n_b, cos_q,
                   CAST(w AS DOUBLE)
                   / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                       AS cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 50 ORDER BY rank
        """,
        "events_forecast_backtest": """
            WITH g AS (SELECT event_type,
                              date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            w AS (SELECT event_type, day, n,
                         LAG(n, 1) OVER w1 AS prev,
                         CAST(SUM(n) OVER (PARTITION BY event_type
                             ORDER BY day ROWS BETWEEN 7 PRECEDING
                             AND 1 PRECEDING) AS BIGINT) AS win7,
                         ROW_NUMBER() OVER w1 AS rn,
                         COUNT(*) OVER (PARTITION BY event_type)
                             AS nd
                  FROM g WINDOW w1 AS (PARTITION BY event_type
                                       ORDER BY day))
            SELECT event_type,
                   CAST(MAX(nd) AS BIGINT) AS n_days,
                   CAST(COUNT(*) AS BIGINT) AS n_scored,
                   CAST(SUM(ABS(n - prev)) AS BIGINT)
                       AS naive_abs_err,
                   CAST(SUM(ABS(7 * n - win7)) AS BIGINT)
                       AS ma7_abs_err_x7,
                   CAST(SUM(ABS(n - prev)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS naive_mae,
                   CAST(SUM(ABS(7 * n - win7)) AS DOUBLE) / 7.0
                   / CAST(COUNT(*) AS DOUBLE) AS ma7_mae
            FROM w WHERE rn >= 8
            GROUP BY 1 HAVING MAX(nd) >= 9 ORDER BY 1
        """,
        "events_did": """
            WITH rng AS (SELECT date_trunc('day', MIN(ts)) AS dmin,
                                date_trunc('day', MAX(ts)) AS dmax
                         FROM events),
            cut AS (SELECT dmin + (date_diff('day', dmin, dmax) + 1)
                               // 2 * INTERVAL 1 DAY AS c
                    FROM rng),
            c AS (SELECT CASE WHEN user_id % 2 = 0
                              THEN 1 ELSE 0 END AS treat,
                         CASE WHEN date_trunc('day', ts) >=
                              (SELECT c FROM cut)
                              THEN 1 ELSE 0 END AS post,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents
                  FROM events WHERE value IS NOT NULL),
            g AS (SELECT treat, post,
                         CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(cents) AS BIGINT) AS s
                  FROM c GROUP BY 1, 2),
            m AS (SELECT
                    MAX(CASE WHEN treat=0 AND post=0 THEN n END) AS n00,
                    MAX(CASE WHEN treat=0 AND post=1 THEN n END) AS n01,
                    MAX(CASE WHEN treat=1 AND post=0 THEN n END) AS n10,
                    MAX(CASE WHEN treat=1 AND post=1 THEN n END) AS n11,
                    CAST(MAX(CASE WHEN treat=0 AND post=0 THEN s END)
                         AS DOUBLE)
                    / CAST(MAX(CASE WHEN treat=0 AND post=0 THEN n END)
                           AS DOUBLE) AS m00,
                    CAST(MAX(CASE WHEN treat=0 AND post=1 THEN s END)
                         AS DOUBLE)
                    / CAST(MAX(CASE WHEN treat=0 AND post=1 THEN n END)
                           AS DOUBLE) AS m01,
                    CAST(MAX(CASE WHEN treat=1 AND post=0 THEN s END)
                         AS DOUBLE)
                    / CAST(MAX(CASE WHEN treat=1 AND post=0 THEN n END)
                           AS DOUBLE) AS m10,
                    CAST(MAX(CASE WHEN treat=1 AND post=1 THEN s END)
                         AS DOUBLE)
                    / CAST(MAX(CASE WHEN treat=1 AND post=1 THEN n END)
                           AS DOUBLE) AS m11
                  FROM g)
            SELECT n00 AS n_ctrl_pre, n01 AS n_ctrl_post,
                   n10 AS n_treat_pre, n11 AS n_treat_post,
                   m00 AS mean_ctrl_pre, m01 AS mean_ctrl_post,
                   m10 AS mean_treat_pre, m11 AS mean_treat_post,
                   (m11 - m10) - (m01 - m00) AS did_cents
            FROM m
        """,
        "embeddings_isotropy": """
            WITH u AS (SELECT vec_id, i,
                              CAST(ROUND(embedding[i] * 1048576.0)
                                   AS BIGINT) AS q
                       FROM embeddings,
                            UNNEST(range(1, len(embedding) + 1))
                                AS t(i)),
            s AS (SELECT i, CAST(SUM(q) AS HUGEINT) AS sj
                  FROM u GROUP BY 1),
            tt AS (SELECT CAST(SUM(CAST(q AS HUGEINT) * q)
                               AS HUGEINT) AS t
                   FROM u),
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                  FROM embeddings),
            ss AS (SELECT CAST(SUM(sj * sj) AS HUGEINT) AS s2
                   FROM s)
            SELECT c.n AS n_vectors,
                   CAST(tt.t AS BIGINT) AS sum_sq_norm,
                   CAST((ss.s2 - tt.t) // 2 AS DOUBLE)
                       AS pair_dot_sum,
                   CAST((ss.s2 - tt.t) // 2 AS DOUBLE)
                   / CAST(c.n * (c.n - 1) // 2 AS DOUBLE)
                       AS avg_pair_dot,
                   CAST(tt.t AS DOUBLE) / CAST(c.n AS DOUBLE)
                       AS mean_sq_norm
            FROM ss, tt, c
        """,
        "transcripts_repeated_lines": f"""
            WITH l AS (SELECT conv_id, role,
                              role || ': ' || replace(
                                  COALESCE(text, ''), chr(0), '')
                                  AS line
                       FROM {transcripts}),
            g AS (SELECT line, role, conv_id,
                         CAST(COUNT(*) AS BIGINT) AS t
                  FROM l GROUP BY 1, 2, 3),
            per AS (SELECT line, MIN(role) AS role,
                           CAST(COUNT(*) AS BIGINT) AS n_convs,
                           CAST(SUM(t) AS BIGINT) AS n_turns
                    FROM g GROUP BY line),
            r AS (SELECT line, role, n_convs, n_turns,
                         ROW_NUMBER() OVER (ORDER BY n_convs DESC,
                             n_turns DESC, line) AS rank
                  FROM per)
            SELECT line, role, n_convs, n_turns,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 20 ORDER BY rank
        """,
        "embeddings_fisher_ratio": """
            WITH u AS (SELECT vec_id, label, i,
                              CAST(ROUND(embedding[i] * 1048576.0)
                                   AS BIGINT) AS q
                       FROM embeddings,
                            UNNEST(range(1, len(embedding) + 1))
                                AS t(i)),
            g AS (SELECT label, i, CAST(SUM(q) AS HUGEINT) AS sj
                  FROM u GROUP BY 1, 2),
            sl AS (SELECT label, CAST(SUM(sj * sj) AS HUGEINT) AS s2
                   FROM g GROUP BY 1),
            tl AS (SELECT label,
                          CAST(SUM(CAST(q AS HUGEINT) * q)
                               AS HUGEINT) AS t,
                          CAST(COUNT(DISTINCT vec_id) AS BIGINT)
                              AS n
                   FROM u GROUP BY 1),
            per AS (SELECT sl.label, tl.n,
                           CAST(tl.t AS DOUBLE)
                           - CAST(sl.s2 AS DOUBLE)
                             / CAST(tl.n AS DOUBLE) AS w,
                           CAST(sl.s2 AS DOUBLE)
                           / CAST(tl.n AS DOUBLE) AS son
                    FROM sl JOIN tl USING (label)),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
                           CAST(COUNT(*) AS BIGINT) AS n_labels,
                           list_sum(list(w ORDER BY label))
                               AS within,
                           list_sum(list(son ORDER BY label))
                               AS sqon
                    FROM per),
            gs AS (SELECT i, CAST(SUM(sj) AS HUGEINT) AS sg
                   FROM g GROUP BY i),
            s2t AS (SELECT CAST(SUM(sg * sg) AS HUGEINT) AS s2
                    FROM gs)
            SELECT tot.n_tot AS n_vectors, tot.n_labels,
                   within AS within_scatter,
                   sqon - CAST(s2t.s2 AS DOUBLE)
                          / CAST(tot.n_tot AS DOUBLE)
                       AS between_scatter,
                   CASE WHEN within > 0 THEN
                       (sqon - CAST(s2t.s2 AS DOUBLE)
                               / CAST(tot.n_tot AS DOUBLE)) / within
                   END AS fisher_ratio
            FROM tot, s2t
        """,
        "parts_copurchase_richclub": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                               l_partkey AS p
                        FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2),
            se AS (SELECT id_a AS a, id_b AS b FROM e0
                   UNION ALL SELECT id_b, id_a FROM e0),
            deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT)
                        AS degree
                    FROM se GROUP BY 1),
            ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
            nr AS (SELECT ks.k,
                          CAST(SUM(CASE WHEN deg.degree > ks.k
                                   THEN 1 ELSE 0 END) AS BIGINT)
                              AS n_rich
                   FROM ks, deg GROUP BY 1),
            edeg AS (SELECT da.degree AS dg_a, db.degree AS dg_b
                     FROM e0 JOIN deg da ON e0.id_a = da.id
                             JOIN deg db ON e0.id_b = db.id),
            er AS (SELECT ks.k,
                          CAST(SUM(CASE WHEN dg_a > ks.k
                                         AND dg_b > ks.k
                                   THEN 1 ELSE 0 END) AS BIGINT)
                              AS e_rich
                   FROM ks, edeg GROUP BY 1)
            SELECT nr.k, nr.n_rich,
                   COALESCE(er.e_rich, 0) AS e_rich,
                   CASE WHEN nr.n_rich > 1 THEN
                       CAST(2 * COALESCE(er.e_rich, 0) AS DOUBLE)
                       / CAST(nr.n_rich * (nr.n_rich - 1) AS DOUBLE)
                   ELSE 0.0 END AS phi
            FROM nr LEFT JOIN er ON nr.k = er.k ORDER BY 1
        """,
        "documents_vocab_growth": """
            WITH d AS (SELECT doc_id,
                              string_split(COALESCE(text, ''), ' ')
                                  AS toks
                       FROM documents),
            l AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt
                  FROM d),
            o AS (SELECT doc_id,
                         CAST(COALESCE(SUM(nt) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT) AS off
                  FROM l),
            tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS t FROM l),
            tk AS (SELECT doc_id, i AS pos, toks[i] AS tok
                   FROM d, UNNEST(range(1, len(toks) + 1)) t(i)),
            g AS (SELECT tok,
                         CAST(MIN(o.off + tk.pos) AS BIGINT) AS fp
                  FROM tk JOIN o USING (doc_id) GROUP BY 1),
            cp AS (SELECT DISTINCT cpv FROM (
                       SELECT CAST(256 * power(4, e) AS BIGINT)
                           AS cpv
                       FROM UNNEST(range(0, 16)) t(e)
                       WHERE CAST(256 * power(4, e) AS BIGINT)
                             < (SELECT t FROM tot)
                       UNION ALL SELECT t FROM tot))
            SELECT cp.cpv AS checkpoint,
                   CAST(SUM(CASE WHEN g.fp <= cp.cpv
                            THEN 1 ELSE 0 END) AS BIGINT) AS vocab
            FROM cp, g GROUP BY 1 ORDER BY 1
        """,
        "transcripts_case_profile": f"""
            WITH c AS (SELECT role,
                              len(regexp_extract_all(
                                  COALESCE(text, ''), '[A-Z]'))
                                  AS up,
                              len(regexp_extract_all(
                                  COALESCE(text, ''), '[a-z]'))
                                  AS lo
                       FROM {transcripts})
            SELECT role,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(up) AS BIGINT) AS n_upper,
                   CAST(SUM(up + lo) AS BIGINT) AS n_letters,
                   CAST(SUM(CASE WHEN up + lo > 0
                                  AND 2 * up > up + lo
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_shouty_turns,
                   CAST(SUM(up) AS DOUBLE)
                   / CAST(SUM(up + lo) AS DOUBLE) AS upper_ratio
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "events_hour_entropy": """
            WITH g AS (SELECT event_type,
                              CAST(hour(ts) AS BIGINT) AS hour,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            t AS (SELECT event_type,
                         CAST(SUM(n) AS BIGINT) AS n_events,
                         CAST(COUNT(*) AS BIGINT) AS n_hours,
                         CAST(SUM(n * CAST(round(
                             ln(CAST(n AS DOUBLE)) * 1000000)
                             AS BIGINT)) AS BIGINT) AS s1
                  FROM g GROUP BY 1)
            SELECT event_type, n_events, n_hours,
                   ROUND(ln(CAST(n_events AS DOUBLE))
                         - CAST(s1 AS DOUBLE) / 1000000.0
                           / CAST(n_events AS DOUBLE), 6)
                       AS hour_entropy
            FROM t ORDER BY 1
        """,
        "transcripts_tool_retry_rate": f"""
            WITH s AS (SELECT conv_id, tool,
                              COALESCE(text, '') AS tx,
                              LAG(tool) OVER w AS ptool,
                              LAG(COALESCE(text, '')) OVER w AS ptx
                       FROM {transcripts}
                       WHERE role = 'tool'
                         AND COALESCE(tool, '') <> ''
                       WINDOW w AS (PARTITION BY conv_id
                                    ORDER BY turn_idx, ts))
            SELECT tool,
                   CAST(COUNT(*) AS BIGINT) AS n_calls,
                   CAST(SUM(CASE WHEN tool = ptool
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_repeats,
                   CAST(SUM(CASE WHEN tool = ptool AND tx <> ptx
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_changed_repeats,
                   CAST(SUM(CASE WHEN tool = ptool
                            THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
            FROM s GROUP BY 1 ORDER BY 1
        """,
        "transcripts_conv_length_hist": f"""
            WITH c AS (SELECT conv_id,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM {transcripts} GROUP BY 1)
            SELECT n AS n_turns,
                   CAST(COUNT(*) AS BIGINT) AS n_convs,
                   CAST(n * COUNT(*) AS BIGINT) AS total_turns
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "transcripts_pr_length_joint": f"""
            WITH r AS (SELECT conv_id, turn_idx, role, ts,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts}),
            w AS (SELECT role, tok AS y,
                         (COALESCE(LAG(tok, 1) OVER win, 0)
                          + COALESCE(LAG(tok, 2) OVER win, 0)
                          + COALESCE(LAG(tok, 3) OVER win, 0)) AS x
                  FROM r WINDOW win AS (PARTITION BY conv_id
                                        ORDER BY turn_idx, ts)),
            p AS (SELECT CASE WHEN x > 0
                              THEN CAST(FLOOR(LOG2(x)) AS BIGINT)
                              ELSE -1 END AS prompt_bucket,
                         CASE WHEN y > 0
                              THEN CAST(FLOOR(LOG2(y)) AS BIGINT)
                              ELSE -1 END AS response_bucket
                  FROM w WHERE role = 'assistant')
            SELECT prompt_bucket, response_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM p GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "parts_copurchase_weight_hist": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                               l_partkey AS p
                        FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b,
                          CAST(COUNT(*) AS BIGINT) AS w
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0)
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n_edges,
                   CAST(COUNT(*) AS DOUBLE)
                   / CAST((SELECT m FROM m) AS DOUBLE)
                       AS edge_share
            FROM e0 GROUP BY 1 ORDER BY 1
        """,
        "events_xcorr": """
            WITH v AS (SELECT date_trunc('day', ts) AS day,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events WHERE event_type = 'view'
                       GROUP BY 1),
            p AS (SELECT date_trunc('day', ts) AS day,
                         CAST(COUNT(*) AS BIGINT) AS n
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1),
            lags AS (SELECT CAST(l - 7 AS BIGINT) AS lag
                     FROM UNNEST(range(0, 15)) t(l)),
            pairs AS (SELECT lags.lag,
                             CAST(v.n AS HUGEINT) AS x,
                             CAST(p.n AS HUGEINT) AS y
                      FROM lags
                      JOIN v ON TRUE
                      JOIN p ON p.day = v.day
                                + lags.lag * INTERVAL 1 DAY),
            s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS np,
                         SUM(x) AS sx, SUM(y) AS sy,
                         SUM(x * x) AS sxx, SUM(y * y) AS syy,
                         SUM(x * y) AS sxy
                  FROM pairs GROUP BY 1)
            SELECT lag, np AS n_pairs,
                   ROUND(CAST(np * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                                * CAST(np * syy - sy * sy
                                       AS DOUBLE)), 6) AS xcorr
            FROM s
            WHERE np >= 2 AND np * sxx - sx * sx > 0
              AND np * syy - sy * sy > 0
            ORDER BY 1
        """,
        "transcripts_tool_depth_profile": f"""
            WITH t AS (SELECT tool,
                              CASE WHEN turn_idx < 5 THEN 0
                                   WHEN turn_idx < 10 THEN 1
                                   WHEN turn_idx < 20 THEN 2
                                   ELSE 3 END AS depth_bucket
                       FROM {transcripts}
                       WHERE role = 'tool'
                         AND COALESCE(tool, '') <> ''),
            g AS (SELECT tool, CAST(depth_bucket AS BIGINT)
                         AS depth_bucket,
                         CAST(COUNT(*) AS BIGINT) AS n_calls
                  FROM t GROUP BY 1, 2)
            SELECT tool, depth_bucket, n_calls,
                   CAST(n_calls AS DOUBLE)
                   / CAST(SUM(n_calls) OVER (PARTITION BY tool)
                          AS DOUBLE) AS share
            FROM g ORDER BY 1, 2
        """,
        "parts_copurchase_degree_matrix": """
            WITH op AS (SELECT DISTINCT l_orderkey AS o,
                               l_partkey AS p
                        FROM lineitem),
            e0 AS (SELECT a.p AS id_a, b.p AS id_b
                   FROM op a JOIN op b USING (o) WHERE a.p < b.p
                   GROUP BY 1, 2),
            se AS (SELECT id_a AS a, id_b AS b FROM e0
                   UNION ALL SELECT id_b, id_a FROM e0),
            deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT)
                        AS degree
                    FROM se GROUP BY 1),
            m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e0),
            eb AS (SELECT CAST(FLOOR(LOG2(da.degree)) AS BIGINT)
                       AS ba,
                          CAST(FLOOR(LOG2(db.degree)) AS BIGINT)
                       AS bb
                   FROM e0 JOIN deg da ON e0.id_a = da.id
                           JOIN deg db ON e0.id_b = db.id),
            g AS (SELECT LEAST(ba, bb) AS bucket_a,
                         GREATEST(ba, bb) AS bucket_b,
                         CAST(COUNT(*) AS BIGINT) AS n_edges
                  FROM eb GROUP BY 1, 2)
            SELECT bucket_a, bucket_b, n_edges,
                   CAST(n_edges AS DOUBLE)
                   / CAST((SELECT m FROM m) AS DOUBLE)
                       AS edge_share
            FROM g ORDER BY 1, 2
        """,
        "transcripts_weekly_role_mix": f"""
            WITH t AS (SELECT date_trunc('week', ts) AS week, role,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts}),
            g AS (SELECT week, role,
                         CAST(COUNT(*) AS BIGINT) AS n_turns,
                         CAST(SUM(tok) AS BIGINT) AS sum_tokens
                  FROM t GROUP BY 1, 2)
            SELECT week, role, n_turns, sum_tokens,
                   CAST(sum_tokens AS DOUBLE)
                   / CAST(SUM(sum_tokens) OVER (PARTITION BY week)
                          AS DOUBLE) AS token_share
            FROM g ORDER BY 1, 2
        """,
        "documents_quality_census": """
            WITH d AS (SELECT doc_id, text,
                              string_split(text, ' ') AS toks
                       FROM documents),
            c4 AS (SELECT doc_id,
                          (len(regexp_extract_all(text, '[.!?]'))
                               >= 3
                           AND NOT contains(lower(text),
                                            'lorem ipsum')
                           AND NOT contains(text, '{')) AS keep
                   FROM d),
            gs AS (SELECT doc_id,
                          CAST(len(toks) AS BIGINT) AS n_words,
                          CAST(length(replace(text, ' ', ''))
                               AS BIGINT) AS sum_len,
                          CAST(len(list_filter(toks,
                               t -> regexp_matches(t, '[a-z]')))
                              AS BIGINT) AS n_alpha,
                          CAST(len(list_filter(
                               ['the','a','of','and','to','in','be',
                                'that'],
                               w -> list_contains(toks, w)))
                              AS BIGINT) AS n_stop
                   FROM d),
            go AS (SELECT doc_id,
                          (n_words >= 30 AND n_words <= 100000
                           AND CAST(sum_len AS DOUBLE) / n_words
                               >= 3.0
                           AND CAST(sum_len AS DOUBLE) / n_words
                               <= 10.0
                           AND CAST(n_alpha AS DOUBLE) / n_words
                               >= 0.8
                           AND n_stop >= 2) AS keep
                   FROM gs),
            bg AS (SELECT doc_id,
                          unnest(list_transform(
                              list_zip(toks[:len(toks)-1],
                                       toks[2:len(toks)]),
                              z -> z[1] || ' ' || z[2])) AS b
                   FROM d WHERE len(toks) > 1),
            cb AS (SELECT doc_id, b, COUNT(*) AS nn
                   FROM bg GROUP BY doc_id, b),
            mb AS (SELECT doc_id, MAX(nn) AS mx FROM cb
                   GROUP BY doc_id),
            rep AS (SELECT d.doc_id,
                           (len(list_distinct(toks)) / len(toks)
                                >= 0.5
                            AND (CASE WHEN len(toks) > 1
                                 THEN COALESCE(mb.mx, 0)
                                      / (len(toks) - 1)
                                 ELSE 0.0 END) <= 0.05) AS keep
                    FROM d LEFT JOIN mb ON d.doc_id = mb.doc_id),
            f AS (SELECT c4.keep AS c4k, go.keep AS gok,
                         rep.keep AS repk
                  FROM c4 JOIN go USING (doc_id)
                          JOIN rep USING (doc_id))
            SELECT 'c4' AS reason,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN NOT c4k THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_flagged
            FROM f
            UNION ALL SELECT 'gopher', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN NOT gok THEN 1 ELSE 0 END)
                        AS BIGINT) FROM f
            UNION ALL SELECT 'repetition', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN NOT repk THEN 1 ELSE 0 END)
                        AS BIGINT) FROM f
            UNION ALL SELECT 'pass', CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CASE WHEN c4k AND gok AND repk
                            THEN 1 ELSE 0 END) AS BIGINT) FROM f
        """,
        "transcripts_totals_reconciliation": f"""
            WITH n AS (SELECT conv_id, turn_idx, {_NORM_EXPR} AS t
                       FROM {transcripts}),
            x AS (SELECT {sub_cents} AS g, {tax_cents} AS tx,
                         {tot_cents} AS f
                  FROM n),
            a AS (SELECT g, tx, f, ABS(g + tx - f) AS gap
                  FROM x
                  WHERE g IS NOT NULL AND tx IS NOT NULL
                    AND f IS NOT NULL)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_all3,
                   CAST(SUM(CASE WHEN gap = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_reconciled,
                   CAST(SUM(CASE WHEN gap <> 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_mismatch,
                   CAST(COALESCE(MAX(gap), 0) AS BIGINT)
                       AS max_abs_gap_cents
            FROM a
        """,
        "supplier_otif": """
            SELECT l_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CASE WHEN date_diff('day',
                                CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) <= 30
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_ontime,
                   CAST(SUM(CASE WHEN date_diff('day',
                                CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) <= 30
                            THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS ontime_rate
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            GROUP BY 1 ORDER BY 1
        """,
        "events_week_retention_jaccard": """
            WITH wu AS (SELECT DISTINCT
                               date_trunc('week', ts) AS week,
                               user_id
                        FROM events),
            sz AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n
                   FROM wu GROUP BY 1),
            sh AS (SELECT a.week,
                          CAST(COUNT(*) AS BIGINT) AS n_shared
                   FROM wu a JOIN wu b
                     ON a.user_id = b.user_id
                    AND b.week = a.week + INTERVAL 7 DAY
                   GROUP BY 1)
            SELECT sh.week,
                   sh.week + INTERVAL 7 DAY AS next_week,
                   sa.n AS n_week, sb.n AS n_next, sh.n_shared,
                   CAST(sh.n_shared AS DOUBLE)
                   / CAST(sa.n + sb.n - sh.n_shared AS DOUBLE)
                       AS jaccard
            FROM sh JOIN sz sa ON sa.week = sh.week
                    JOIN sz sb ON sb.week = sh.week
                                  + INTERVAL 7 DAY
            ORDER BY 1
        """,
        "orders_weekly_priority_mix": """
            WITH g AS (SELECT date_trunc('week', o_orderdate)
                           AS week,
                              o_orderpriority AS priority,
                              CAST(COUNT(*) AS BIGINT) AS n_orders
                       FROM orders GROUP BY 1, 2)
            SELECT week, priority, n_orders,
                   CAST(n_orders AS DOUBLE)
                   / CAST(SUM(n_orders) OVER (PARTITION BY week)
                          AS DOUBLE) AS share
            FROM g ORDER BY 1, 2
        """,
        "transcripts_amount_stats": f"""
            WITH m AS (SELECT role,
                              regexp_extract_all(
                                  COALESCE(text, ''),
                                  '[\\d,]+\\.\\d{{2}}') AS ms
                       FROM {transcripts}),
            a AS (SELECT role,
                         CAST(round(replace(unnest(ms), ',', '')
                              ::DOUBLE * 100) AS BIGINT) AS c
                  FROM m),
            t AS (SELECT role,
                         CAST(SUM(CASE WHEN len(ms) > 0
                                  THEN 1 ELSE 0 END) AS BIGINT)
                             AS n_amount_turns
                  FROM m GROUP BY 1)
            SELECT a.role,
                   CAST(COUNT(*) AS BIGINT) AS n_amounts,
                   t.n_amount_turns,
                   CAST(SUM(c) AS BIGINT) AS sum_cents,
                   CAST(MAX(c) AS BIGINT) AS max_cents
            FROM a JOIN t USING (role)
            GROUP BY 1, 3 ORDER BY 1
        """,
        "events_weekly_gini": """
            WITH g AS (SELECT date_trunc('week', ts) AS week,
                              user_id,
                              CAST(COUNT(*) AS BIGINT) AS n
                       FROM events GROUP BY 1, 2),
            r AS (SELECT week, n,
                         ROW_NUMBER() OVER (PARTITION BY week
                             ORDER BY n, user_id) AS i,
                         COUNT(*) OVER (PARTITION BY week) AS nn,
                         SUM(n) OVER (PARTITION BY week) AS tot
                  FROM g)
            SELECT week,
                   CAST(MAX(nn) AS BIGINT) AS n_users,
                   CAST(MAX(tot) AS BIGINT) AS n_events,
                   CAST(SUM((2 * i - nn - 1) * n) AS DOUBLE)
                   / (CAST(MAX(nn) AS DOUBLE)
                      * CAST(MAX(tot) AS DOUBLE)) AS gini
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "events_session_count_hist": """
            WITH gaps AS (
              SELECT user_id,
                     CASE WHEN ts - LAG(ts) OVER w
                               > INTERVAL 30 MINUTE
                               OR LAG(ts) OVER w IS NULL
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            per AS (SELECT user_id,
                           CAST(SUM(new_sess) AS BIGINT)
                               AS n_sessions
                    FROM gaps GROUP BY 1)
            SELECT n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM per GROUP BY 1 ORDER BY 1
        """,
        "orders_repeat_rate": """
            WITH per AS (SELECT o_custkey,
                                CAST(COUNT(*) AS BIGINT) AS n
                         FROM orders GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
                   CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_repeat_customers,
                   CAST(SUM(n) AS BIGINT) AS n_orders,
                   CAST(SUM(n - 1) AS BIGINT) AS n_repeat_orders,
                   CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS repeat_customer_rate,
                   CAST(SUM(n - 1) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE) AS repeat_order_share
            FROM per
        """,
        "transcripts_start_hour_profile": f"""
            WITH st AS (SELECT conv_id, MIN(ts) AS ts
                        FROM {transcripts} GROUP BY 1),
            g AS (SELECT CAST(hour(ts) AS BIGINT) AS hour,
                         CAST(COUNT(*) AS BIGINT) AS n_convs
                  FROM st GROUP BY 1)
            SELECT hour, n_convs,
                   CAST(n_convs AS DOUBLE)
                   / CAST(SUM(n_convs) OVER () AS DOUBLE) AS share
            FROM g ORDER BY 1
        """,
        "transcripts_latency_by_depth": f"""
            WITH s AS (SELECT conv_id, turn_idx, role, ts,
                              LAG(ts) OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx, ts) AS pts
                       FROM {transcripts}),
            g AS (SELECT CASE WHEN turn_idx < 5 THEN 0
                              WHEN turn_idx < 10 THEN 1
                              WHEN turn_idx < 20 THEN 2
                              ELSE 3 END AS depth_bucket,
                         CAST(epoch_us(ts) - epoch_us(pts)
                              AS BIGINT) AS gap
                  FROM s
                  WHERE role = 'assistant' AND pts IS NOT NULL)
            SELECT CAST(depth_bucket AS BIGINT) AS depth_bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(quantile_disc(gap, 0.5) AS BIGINT)
                       AS p50_us,
                   CAST(quantile_disc(gap, 0.9) AS BIGINT)
                       AS p90_us
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "events_revenue_by_dow": """
            WITH g AS (SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
                              CAST(COUNT(*) AS BIGINT) AS n_events,
                              CAST(SUM(CAST(round(value * 100)
                                  AS BIGINT)) AS BIGINT)
                                  AS sum_cents
                       FROM events WHERE value IS NOT NULL
                       GROUP BY 1)
            SELECT isodow, n_events, sum_cents,
                   CAST(sum_cents AS DOUBLE)
                   / CAST(n_events AS DOUBLE) AS mean_cents,
                   CAST(sum_cents AS DOUBLE)
                   / CAST(SUM(sum_cents) OVER () AS DOUBLE)
                       AS revenue_share
            FROM g ORDER BY 1
        """,
        "lineitem_discount_profile": """
            WITH g AS (SELECT CAST(round(l_discount * 100)
                              AS BIGINT) AS discount_pct,
                              CAST(COUNT(*) AS BIGINT) AS n_items,
                              CAST(SUM(CAST(round(l_extendedprice
                                  * (1.0 - l_discount) * 100)
                                  AS BIGINT)) AS BIGINT)
                                  AS revenue_cents
                       FROM lineitem GROUP BY 1)
            SELECT discount_pct, n_items, revenue_cents,
                   CAST(revenue_cents AS DOUBLE)
                   / CAST(SUM(revenue_cents) OVER () AS DOUBLE)
                       AS revenue_share
            FROM g ORDER BY 1
        """,
        "transcripts_daily_volume": f"""
            WITH t AS (SELECT date_trunc('day', ts) AS day, conv_id,
                              CAST(len(string_split(
                                  COALESCE(text, ''), ' '))
                                  AS BIGINT) AS tok
                       FROM {transcripts})
            SELECT day,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(tok) AS BIGINT) AS sum_tokens,
                   CAST(COUNT(DISTINCT conv_id) AS BIGINT)
                       AS n_convs_active,
                   CAST(SUM(tok) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS tokens_per_turn
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "events_cohort_matrix": """
            WITH wu AS (SELECT DISTINCT
                               date_trunc('week', ts) AS week,
                               user_id
                        FROM events),
            fw AS (SELECT user_id, MIN(week) AS cohort
                   FROM wu GROUP BY 1),
            g AS (SELECT fw.cohort,
                         CAST(date_diff('day', fw.cohort, wu.week)
                              // 7 AS BIGINT) AS weeks_since,
                         CAST(COUNT(*) AS BIGINT) AS n_active
                  FROM wu JOIN fw USING (user_id)
                  GROUP BY 1, 2),
            b AS (SELECT cohort, n_active AS cohort_size
                  FROM g WHERE weeks_since = 0)
            SELECT g.cohort, g.weeks_since, g.n_active,
                   CAST(g.n_active AS DOUBLE)
                   / CAST(b.cohort_size AS DOUBLE) AS retention
            FROM g JOIN b USING (cohort)
            ORDER BY 1, 2
        """,
        "transcripts_vocab_growth": f"""
            WITH r AS (SELECT conv_id, turn_idx, role,
                              COALESCE(text, '') AS t,
                              ROW_NUMBER() OVER (ORDER BY conv_id,
                                  turn_idx, role, text) AS rn
                       FROM {transcripts}),
            l AS (SELECT rn, string_split(t, ' ') AS toks FROM r),
            o AS (SELECT rn, toks,
                         CAST(COALESCE(SUM(len(toks)) OVER (
                             ORDER BY rn ROWS BETWEEN UNBOUNDED
                             PRECEDING AND 1 PRECEDING), 0)
                             AS BIGINT) AS off
                  FROM l),
            tot AS (SELECT CAST(SUM(len(toks)) AS BIGINT) AS t
                    FROM l),
            tk AS (SELECT o.off + i AS gpos, toks[i] AS tok
                   FROM o, UNNEST(range(1, len(toks) + 1)) u(i)),
            g AS (SELECT tok, CAST(MIN(gpos) AS BIGINT) AS fp
                  FROM tk GROUP BY 1),
            cp AS (SELECT DISTINCT cpv FROM (
                       SELECT CAST(256 * power(4, e) AS BIGINT)
                           AS cpv
                       FROM UNNEST(range(0, 16)) x(e)
                       WHERE CAST(256 * power(4, e) AS BIGINT)
                             < (SELECT t FROM tot)
                       UNION ALL SELECT t FROM tot))
            SELECT cp.cpv AS checkpoint,
                   CAST(SUM(CASE WHEN g.fp <= cp.cpv
                            THEN 1 ELSE 0 END) AS BIGINT) AS vocab
            FROM cp, g GROUP BY 1 ORDER BY 1
        """,
        "lineitem_linenumber_profile": """
            WITH g AS (SELECT CAST(l_linenumber AS BIGINT)
                           AS l_linenumber,
                              CAST(COUNT(*) AS BIGINT) AS n_items,
                              CAST(SUM(CAST(round(l_extendedprice
                                  * (1.0 - l_discount) * 100)
                                  AS BIGINT)) AS BIGINT)
                                  AS revenue_cents
                       FROM lineitem GROUP BY 1)
            SELECT l_linenumber, n_items, revenue_cents,
                   CAST(revenue_cents AS DOUBLE)
                   / CAST(SUM(revenue_cents) OVER () AS DOUBLE)
                       AS revenue_share
            FROM g ORDER BY 1
        """,
        "orders_totalprice_audit": """
            WITH l AS (SELECT l_orderkey,
                              CAST(SUM(CAST(round(l_extendedprice
                                  * (1.0 - l_discount)
                                  * (1.0 + l_tax) * 100) AS BIGINT))
                                  AS BIGINT) AS lc
                       FROM lineitem GROUP BY 1),
            j AS (SELECT CAST(round(o.o_totalprice * 100) AS BIGINT)
                             AS oc,
                         l.lc
                  FROM orders o JOIN l
                    ON o.o_orderkey = l.l_orderkey)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CASE WHEN ABS(oc - lc) <= 1
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_reconciled,
                   CAST(SUM(CASE WHEN ABS(oc - lc) > 1
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_mismatch,
                   CAST(SUM(ABS(oc - lc)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
                       AS mean_abs_gap_cents,
                   CAST(MAX(ABS(oc - lc)) AS BIGINT)
                       AS max_abs_gap_cents
            FROM j
        """,
    }
