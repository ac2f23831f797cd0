"""Planted-corpus semantic tests for the round-4 session-12 batch:
warehouse-ops wave (HHI, Lorenz deciles, link prediction, freshness)
and the transcripts wave (tool stats, role transitions, context
budget, response latency).  Bit-exactness vs DuckDB is pinned by the
contract sweep; these pin SEMANTICS on hand-checkable inputs and
Python references.
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def _ts(day, sec=0):
    return dt.datetime(2025, 1, 1) + dt.timedelta(days=day, seconds=sec)


def test_hhi_planted(ray_session, tmp_path):
    """Nation A: one customer -> HHI 1.0.  Nation B: two equal
    customers -> HHI 0.5.  Customers without orders don't dilute."""
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 20, 21, 21], pa.int64()),
        "o_totalprice": pa.array([100.0, 50.0, 25.0, 25.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20, 21, 30], pa.int64()),
        "c_nationkey": pa.array([0, 1, 1, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }), str(tmp_path / "nation.parquet"))

    from ocr_engine_ray.pipelines.queries import q_orders_hhi_by_nation

    rows = q_orders_hhi_by_nation(str(tmp_path)).take_all()
    by = {r["n_name"]: r for r in rows}
    assert by["ALPHA"]["n_customers"] == 1
    assert by["ALPHA"]["total_cents"] == 10000
    assert by["ALPHA"]["hhi"] == 1.0
    assert by["BETA"]["n_customers"] == 2
    assert by["BETA"]["total_cents"] == 10000
    assert by["BETA"]["hhi"] == 0.5


def test_lorenz_deciles_planted(ray_session, tmp_path):
    """20 users with cents 1..20: NTILE(10) over ascending value gives
    2 users per decile; decile d holds cents (2d-1, 2d); all-NULL
    users are excluded; cum_share ends at 1.0."""
    users, vals, ts = [], [], []
    eid = 0
    for u in range(1, 21):
        users.append(u)
        vals.append(u / 100.0)  # u cents
        ts.append(_ts(0, u))
    users.append(99)  # all-NULL user: must be excluded
    vals.append(None)
    ts.append(_ts(0, 99))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(users)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["x"] * len(users), pa.string()),
        "value": pa.array(vals, pa.float64()),
    }), str(tmp_path / "events.parquet"))

    from ocr_engine_ray.pipelines.queries import q_events_lorenz_deciles

    rows = sorted(q_events_lorenz_deciles(str(tmp_path)).take_all(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert all(r["n_users"] == 2 for r in rows)
    assert [r["decile_cents"] for r in rows] == [
        (2 * d - 1) + 2 * d for d in range(1, 11)]
    assert rows[-1]["cum_cents"] == 210
    assert rows[-1]["cum_share"] == 1.0


def _write_basket_lineitem(tmp_path, edges):
    ok, pk = [], []
    for i, (a, b) in enumerate(edges):
        ok += [i, i]
        pk += [a, b]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))


def test_linkpred_planted_square(ray_session, tmp_path):
    """4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the
    only non-edges, each with 2 common neighbors; adjacent pairs are
    edges and must be filtered out."""
    _write_basket_lineitem(tmp_path,
                           [(1, 2), (2, 3), (3, 4), (1, 4)])

    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_linkpred,
    )

    rows = q_parts_copurchase_linkpred(str(tmp_path)).take_all()
    got = {(r["id_a"], r["id_b"]): r["common_neighbors"] for r in rows}
    assert got == {(1, 3): 2, (2, 4): 2}


def test_linkpred_tie_order(ray_session, tmp_path):
    """Star center 9 with leaves 1..4: all leaf pairs are non-edges
    with exactly 1 common neighbor — output ordered by (id_a, id_b)
    at equal scores."""
    _write_basket_lineitem(tmp_path,
                           [(9, 1), (9, 2), (9, 3), (9, 4)])

    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_linkpred,
    )

    rows = q_parts_copurchase_linkpred(str(tmp_path)).take_all()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert all(r["common_neighbors"] == 1 for r in rows)


def test_freshness_planted(ray_session, tmp_path):
    """Type 'fresh' lands on the global max day (stale 0, both rows in
    the 7-day window); 'stale' stopped 10 days earlier (outside)."""
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([_ts(0), _ts(2), _ts(10), _ts(10, 60)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["stale", "stale", "fresh", "fresh"],
                               pa.string()),
        "value": pa.array([1.0, 1.0, 1.0, 1.0], pa.float64()),
    }), str(tmp_path / "events.parquet"))

    from ocr_engine_ray.pipelines.queries import q_events_freshness

    rows = {r["event_type"]: r
            for r in q_events_freshness(str(tmp_path)).take_all()}
    assert rows["fresh"]["days_stale"] == 0
    assert rows["fresh"]["n_total"] == 2
    assert rows["fresh"]["n_last_7d"] == 2
    assert rows["fresh"]["last_ts"] == _ts(10, 60)
    assert rows["stale"]["days_stale"] == 8
    assert rows["stale"]["n_total"] == 2
    assert rows["stale"]["n_last_7d"] == 0


# ---------------------------------------------------------------------------
# transcripts wave: Python references over the sf0.001 synth corpus
# ---------------------------------------------------------------------------

def _synth_df():
    import pandas as pd

    from ocr_engine_ray.pipelines.queries import transcript_paths

    paths = transcript_paths("/root/testdata/sf0.001")
    return pd.concat([pq.read_table(p).to_pandas() for p in paths],
                     ignore_index=True)


def test_tool_stats_python_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_transcripts_tool_stats

    df = _synth_df()
    f = df[(df["role"] == "tool") & (df["tool"].fillna("") != "")]
    rows = q_transcripts_tool_stats("/root/testdata/sf0.001").take_all()
    assert len(rows) == f["tool"].nunique()
    for r in rows:
        g = f[f["tool"] == r["tool"]]
        assert r["n_calls"] == len(g)
        assert r["n_convs"] == g["conv_id"].nunique()
        assert r["total_chars"] == int(g["text"].str.len().sum())
        assert r["mean_turn_idx"] == float(
            int(g["turn_idx"].astype("int64").sum())) / float(len(g))


def test_role_transitions_python_reference(ray_session):
    from collections import Counter

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_role_transitions,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"])
    ref = Counter()
    for _, g in df.groupby("conv_id"):
        roles = g["role"].tolist()
        for a, b in zip(roles, roles[1:]):
            ref[(a, b)] += 1
    t = q_transcripts_role_transitions("/root/testdata/sf0.001")
    got = {(r["prev_role"], r["next_role"]): r["n_trans"]
           for r in t.to_pylist()}
    assert got == dict(ref)
    # probabilities sum to 1 per prev_role
    probs = {}
    for r in t.to_pylist():
        probs.setdefault(r["prev_role"], 0.0)
        probs[r["prev_role"]] += r["p"]
    for v in probs.values():
        assert abs(v - 1.0) < 1e-12


def test_context_budget_python_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_context_budget,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"])
    rows = {r["conv_id"]: r for r in
            q_transcripts_context_budget(
                "/root/testdata/sf0.001").take_all()}
    assert len(rows) == df["conv_id"].nunique()
    for conv, g in df.groupby("conv_id"):
        toks = (g["text"].fillna("").str.count(" ") + 1).tolist()
        cum, in_budget, cut = 0, 0, None
        for t_, idx in zip(toks, g["turn_idx"].tolist()):
            cum += t_
            if cum <= 4096:
                in_budget += 1
            elif cut is None:
                cut = idx
        r = rows[conv]
        assert r["n_turns"] == len(g)
        assert r["total_tokens"] == sum(toks)
        assert r["n_turns_in_budget"] == in_budget
        assert r["cut_turn_idx"] == cut


def test_response_latency_python_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_response_latency,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"])
    agg = {}
    for _, g in df.groupby("conv_id"):
        us = (g["ts"].astype("int64")).tolist()
        roles = g["role"].tolist()
        for i in range(1, len(us)):
            gap = us[i] - us[i - 1]
            a = agg.setdefault(roles[i], [0, 0, None])
            a[0] += 1
            a[1] += gap
            a[2] = gap if a[2] is None else max(a[2], gap)
    rows = {r["role"]: r for r in
            q_transcripts_response_latency(
                "/root/testdata/sf0.001").take_all()}
    assert set(rows) == set(agg)
    for role, (n, tot, mx) in agg.items():
        r = rows[role]
        assert r["n_gaps"] == n
        assert r["total_gap_us"] == tot
        assert r["max_gap_us"] == mx
        assert r["mean_gap_us"] == float(tot) / float(n)


# ---------------------------------------------------------------------------
# session-12 wave 2: adamic-adar, source cosine, mcnemar, branch revenue
# ---------------------------------------------------------------------------

def test_adamic_adar_planted(ray_session, tmp_path):
    """Path 1-2-3 plus star 2-{4}: non-edge pairs through center 2
    (deg 3) score round(1e12/ln 3) each; (1,3) also scores only via
    center 2.  Hand-check the quantized weights."""
    import math

    _write_basket_lineitem(tmp_path, [(1, 2), (2, 3), (2, 4)])

    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_adamic_adar,
    )

    rows = q_parts_copurchase_adamic_adar(str(tmp_path)).take_all()
    w3 = int(round(1e12 / math.log(3.0)))
    got = {(r["id_a"], r["id_b"]): (r["aa_q"], r["common_neighbors"])
           for r in rows}
    # non-edges: (1,3), (1,4), (3,4) — all via center 2 only
    assert got == {(1, 3): (w3, 1), (1, 4): (w3, 1), (3, 4): (w3, 1)}


def test_adamic_adar_prefers_rare_hub(ray_session, tmp_path):
    """Pair (1,2) connected through low-degree center 10 must outrank
    pair (3,4) connected through a high-degree hub 20."""
    edges = [(10, 1), (10, 2), (20, 3), (20, 4)]
    edges += [(20, k) for k in range(30, 40)]  # fatten the hub
    _write_basket_lineitem(tmp_path, edges)

    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_adamic_adar,
    )

    rows = q_parts_copurchase_adamic_adar(str(tmp_path)).take_all()
    score = {(r["id_a"], r["id_b"]): r["aa_q"] for r in rows}
    assert score[(1, 2)] > score[(3, 4)]


def test_source_cosine_planted(ray_session, tmp_path):
    """Identical sources have cosine 1.0; orthogonal vocabularies
    share no row; a half-overlap pair gets the hand-computed value."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["a", "b", "c", "d"], pa.string()),
        "text": pa.array(["x y", "x y", "z z", "x q"], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_documents_source_cosine,
    )

    rows = {(r["source_a"], r["source_b"]): r
            for r in q_documents_source_cosine(str(tmp_path))
            .take_all()}
    assert rows[("a", "b")]["cosine"] == 1.0
    assert rows[("a", "b")]["dot"] == 2
    assert ("a", "c") not in rows           # no shared token
    # a={x:1,y:1}, d={x:1,q:1}: dot 1, norms sqrt2 → 0.5
    assert rows[("a", "d")]["dot"] == 1
    assert rows[("a", "d")]["cosine"] == 0.5


def test_mcnemar_planted(ray_session, tmp_path):
    """Days 0..10, mid=5.  u1: both halves (n11); u2: only before
    (n10); u3,u4: only after (n01 ×2); u5: never (n00).
    χ² = (2-1)²/3."""
    rows = [
        (1, 0, "purchase"), (1, 9, "purchase"),
        (2, 1, "purchase"), (2, 8, "view"),
        (3, 2, "view"), (3, 7, "purchase"),
        (4, 3, "view"), (4, 10, "purchase"),
        (5, 0, "view"), (5, 10, "view"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(d) for _, d, _ in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, _, t in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }), str(tmp_path / "events.parquet"))

    from ocr_engine_ray.pipelines.queries import q_events_mcnemar

    r = q_events_mcnemar(str(tmp_path)).take_all()[0]
    assert (r["n00"], r["n01"], r["n10"], r["n11"]) == (1, 2, 1, 1)
    assert r["mcnemar_chi2"] == 1.0 / 3.0


def test_branch_revenue_planted(ray_session, tmp_path):
    """Only the Brand#12/size-in-range/qty-in-range line survives; the
    off-brand and out-of-quantity lines don't."""
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#12", "Brand#99"],
                            pa.string()),
        "p_size": pa.array([5, 40, 5], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_quantity": pa.array([5.0, 50.0, 5.0, 5.0], pa.float64()),
        "l_extendedprice": pa.array([100.0, 100.0, 100.0, 100.0],
                                    pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_lineitem_branch_revenue,
    )

    r = q_lineitem_branch_revenue(str(tmp_path)).take_all()[0]
    assert r["n_items"] == 1      # partkey 1 @ qty 5 only
    assert r["revenue"] == 90.0


# ---------------------------------------------------------------------------
# session-12 wave 3: readability, elasticity, ship lag, hapax richness
# ---------------------------------------------------------------------------

def test_readability_planted(ray_session, tmp_path):
    """Hand-computed FRE: 'the cat sat. it ran!' = 5 words, 2
    sentences, 5 vowel groups → 206.835 − 1.015·2.5 − 84.6·1.0."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the cat sat. it ran!", "zzz"], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import q_documents_readability

    rows = {r["doc_id"]: r
            for r in q_documents_readability(str(tmp_path)).take_all()}
    r = rows[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    assert r["fre"] == round(206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 6)
    # no vowels, no sentence punctuation: 1 word, 1 piece, 0 syllables
    r2 = rows[2]
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 0)


def test_discount_elasticity_planted(ray_session, tmp_path):
    """Brand#A: qty = 2·disc_pct exactly → slope 2, intercept 0.
    Brand#B has a single row → excluded (n < 2)."""
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#A", "Brand#B"], pa.string()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64()),
        "l_quantity": pa.array([2.0, 10.0, 20.0, 7.0], pa.float64()),
        "l_discount": pa.array([0.01, 0.05, 0.10, 0.03], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_parts_discount_elasticity,
    )

    rows = q_parts_discount_elasticity(str(tmp_path)).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["p_brand"] == "Brand#A"
    assert r["n"] == 3
    assert r["slope"] == 2.0
    assert r["intercept"] == 0.0


def test_ship_lag_planted_negative_lag(ray_session, tmp_path):
    """Supplier 7 ships at lags [-2, 0, 3]: the negative lag must
    survive day-index arithmetic (the floor-vs-truncate hazard);
    median is the ceil(3·0.5)−1 = index-1 element = 0."""
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 7], pa.int64()),
        "l_shipdate": pa.array([_ts(3), _ts(5), _ts(8)],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts(5), _ts(5), _ts(5)],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))

    from ocr_engine_ray.pipelines.queries import q_supplier_ship_lag

    r = q_supplier_ship_lag(str(tmp_path)).take_all()[0]
    assert r["s_suppkey"] == 7
    assert r["n_items"] == 3
    assert r["mean_lag_days"] == float(-2 + 0 + 3) / 3.0
    assert r["median_lag_days"] == 0
    assert r["max_lag_days"] == 3


def test_hapax_by_source_planted(ray_session, tmp_path):
    """src a: 'x x y' → vocab 2, tokens 3, hapax {y} → ttr 2/3,
    share 1/2.  src b: all distinct → ttr 1, share 1."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "source": pa.array(["a", "b"], pa.string()),
        "text": pa.array(["x x y", "p q"], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_documents_hapax_by_source,
    )

    rows = {r["source"]: r for r in
            q_documents_hapax_by_source(str(tmp_path)).take_all()}
    a, b = rows["a"], rows["b"]
    assert (a["vocab"], a["n_tokens"], a["n_hapax"]) == (2, 3, 1)
    assert a["ttr"] == 2.0 / 3.0 and a["hapax_share"] == 0.5
    assert (b["vocab"], b["n_tokens"], b["n_hapax"]) == (2, 2, 2)
    assert b["ttr"] == 1.0 and b["hapax_share"] == 1.0


# ---------------------------------------------------------------------------
# session-12 wave 4: sft pairs, tool chains, edge jaccard, lang mix
# ---------------------------------------------------------------------------

def test_sft_pairs_python_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_transcripts_sft_pairs

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"])
    ref = {}
    for conv, g in df.groupby("conv_id"):
        # r5 NUL hygiene: the engine strips embedded \x00 from the
        # rendered text (junk in training data + pandas C-string
        # factorizer hazard in row-sorted compares)
        texts = [(t if t is not None else "").replace("\x00", "")
                 for t in g["text"]]
        lines = [f"{r}: {t}" for r, t in zip(g["role"], texts)]
        roles = g["role"].tolist()
        idxs = g["turn_idx"].tolist()
        for i, role in enumerate(roles):
            if role == "assistant":
                ref.setdefault((conv, idxs[i]), []).append(
                    ("\n".join(lines[max(0, i - 3):i]), texts[i]))
    rows = q_transcripts_sft_pairs("/root/testdata/sf0.001").take_all()
    assert len(rows) == sum(len(v) for v in ref.values())
    for r in rows:
        assert (r["prompt"], r["response"]) in ref[
            (r["conv_id"], r["turn_idx"])]


def test_tool_chains_python_reference(ray_session):
    from collections import Counter

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_tool_chains,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"])
    ref = Counter()
    for _, g in df.groupby("conv_id"):
        run = 0
        for role in g["role"]:
            if role == "tool":
                run += 1
            elif run:
                ref[run] += 1
                run = 0
        if run:
            ref[run] += 1
    got = {r["chain_len"]: r["n_chains"] for r in
           q_transcripts_tool_chains("/root/testdata/sf0.001")
           .take_all()}
    assert got == dict(ref)


def test_edge_jaccard_planted(ray_session, tmp_path):
    """Triangle 1-2-3 plus pendant 4 on node 3: edge (1,2) has
    cn={3}, union=|{2,3}∪{1,3}|−{1,2}... deg1=2,deg2=2 → union
    2+2−2−1=1 → jaccard 1.0.  Edge (1,3): deg3=3 → union 2 →
    0.5.  Pendant edge (3,4) has no common neighbor → excluded."""
    _write_basket_lineitem(tmp_path,
                           [(1, 2), (2, 3), (1, 3), (3, 4)])

    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_edge_jaccard,
    )

    rows = {(r["id_a"], r["id_b"]): r for r in
            q_parts_copurchase_edge_jaccard(str(tmp_path)).take_all()}
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    assert rows[(1, 2)]["jaccard_q"] == 1_000_000
    assert rows[(1, 3)]["jaccard_q"] == 500_000
    assert rows[(1, 3)]["union_size"] == 2
    assert rows[(2, 3)]["jaccard_q"] == 500_000


def test_lang_mix_planted(ray_session, tmp_path):
    """Source a: 3 en + 1 fr → shares .75/.25, entropy of (3,1);
    source b monolingual → entropy 0."""
    import math

    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "source": pa.array(["a", "a", "a", "a", "b", "b"],
                           pa.string()),
        "lang": pa.array(["en", "en", "en", "fr", "de", "de"],
                         pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import q_documents_lang_mix

    rows = {(r["source"], r["lang"]): r for r in
            q_documents_lang_mix(str(tmp_path)).take_all()}
    assert rows[("a", "en")]["share"] == 0.75
    assert rows[("a", "fr")]["share"] == 0.25
    # quantized-ln entropy: ln(4) − (3·q(ln3) + 1·q(ln1))/1e6/4
    q3 = float(round(math.log(3.0) * 1e6))
    exp = round(math.log(4.0) - q3 * 3 / 1e6 / 4.0, 6)
    assert abs(rows[("a", "en")]["entropy"] - exp) < 1e-9
    assert rows[("b", "de")]["entropy"] == 0.0


# ---------------------------------------------------------------------------
# session-12 wave 5: lexical rank, bot audit, k-center coreset
# ---------------------------------------------------------------------------

def test_lexical_rank_planted(ray_session, tmp_path):
    """Corpus tf: x→3, y→2, z→1 ⇒ ranks x=1, y=2, z=3.  Doc 1
    ('x x y') mean = (1+1+2)/3; doc 2 ('x y z') mean = 2.0."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x x y", "x y z"], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_documents_lexical_rank,
    )

    rows = {r["doc_id"]: r for r in
            q_documents_lexical_rank(str(tmp_path)).take_all()}
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["mean_rank"] == 4.0 / 3.0
    assert rows[2]["mean_rank"] == 2.0


def test_lexical_rank_tf_tie_breaks_on_token(ray_session, tmp_path):
    """Equal-tf tokens rank by string: 'a' before 'b'."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a", "b"], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_documents_lexical_rank,
    )

    rows = {r["doc_id"]: r["mean_rank"] for r in
            q_documents_lexical_rank(str(tmp_path)).take_all()}
    assert rows[1] == 1.0 and rows[2] == 2.0


def test_bot_audit_planted(ray_session, tmp_path):
    """u1 fires 12 events in one minute (burst); u2 fires every 60 s
    for 7 events (metronome, var 0); u3 is organic (neither)."""
    uid, ts = [], []
    for i in range(12):                       # burst: same minute
        uid.append(1)
        ts.append(_ts(0, i * 4))
    for i in range(7):                        # metronome: 1/min
        uid.append(2)
        ts.append(_ts(0, 3600 + i * 60))
    for i, s in enumerate([0, 70, 400, 900]):  # organic
        uid.append(3)
        ts.append(_ts(1, s))
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(uid)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["x"] * len(uid), pa.string()),
        "value": pa.array([1.0] * len(uid), pa.float64()),
    }), str(tmp_path / "events.parquet"))

    from ocr_engine_ray.pipelines.queries import q_events_bot_audit

    rows = {r["user_id"]: r
            for r in q_events_bot_audit(str(tmp_path)).take_all()}
    assert rows[1]["is_burst"] and not rows[1]["is_metronome"]
    assert rows[1]["max_per_minute"] == 12
    assert rows[2]["is_metronome"] and not rows[2]["is_burst"]
    assert rows[2]["gap_var_num"] == 0 and rows[2]["n_gaps"] == 6
    assert not rows[3]["is_burst"] and not rows[3]["is_metronome"]


def test_kcenter_numpy_parity(ray_session):
    """Greedy farthest-point on the real sf0.001 embeddings must match
    a straight numpy replay (same quantization, same tie-break)."""
    import numpy as np

    from ocr_engine_ray.pipelines.queries import q_embeddings_kcenter

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    m = np.stack([np.asarray(v, np.float64)
                  for v in t.column("embedding").to_pylist()])
    order = np.argsort(ids)
    ids, m = ids[order], m[order]

    centers = [0]
    exp = [(0, 0, 0)]
    for step in range(1, 8):
        c = m[np.isin(ids, centers)]
        d2 = ((m * m).sum(1)[:, None] - 2.0 * (m @ c.T)
              + (c * c).sum(1)[None, :]).min(1)
        dq = np.floor(np.abs(d2 * 1e6) + 0.5).astype(np.int64) \
            * np.sign(d2 * 1e6).astype(np.int64)
        best = int(np.lexsort((ids, -dq))[0])
        exp.append((step, int(ids[best]), int(dq[best])))
        centers.append(int(ids[best]))

    got = [(r["step"], r["vec_id"], r["dist_q"]) for r in sorted(
        q_embeddings_kcenter("/root/testdata/sf0.001").take_all(),
        key=lambda r: r["step"])]
    assert got == exp


def test_sft_pairs_jsonl_roundtrip(ray_session, tmp_path):
    """The training-data handoff: SFT pairs → distributed JSONL part
    files → read back identical (the S7 jsonl sink on real output)."""
    import json as _json
    import os

    from ocr_engine_ray.pipelines.queries import q_transcripts_sft_pairs

    ds = q_transcripts_sft_pairs("/root/testdata/sf0.001")
    out = str(tmp_path / "sft_jsonl")
    ds.write_json(out)
    rows = []
    for f in sorted(os.listdir(out)):
        with open(os.path.join(out, f)) as fh:
            rows += [_json.loads(line) for line in fh if line.strip()]
    ref = sorted(
        ((r["conv_id"], r["turn_idx"], r["prompt"], r["response"])
         for r in ds.take_all()))
    got = sorted(((r["conv_id"], r["turn_idx"], r["prompt"],
                   r["response"]) for r in rows))
    assert got == ref


# ---------------------------------------------------------------------------
# session-12 wave 6: ACF, tool followup, burstiness, compression
# ---------------------------------------------------------------------------

def test_acf_planted_alternating(ray_session, tmp_path):
    """Daily counts 1,3,1,3,... over 10 consecutive days: perfect
    anti-correlation at lag 1 (r = −1) and perfect correlation at
    lag 2 (r = +1)."""
    uid, ts = [], []
    eid = 0
    for d in range(10):
        for _ in range(1 if d % 2 == 0 else 3):
            uid.append(1)
            ts.append(_ts(d, eid % 3600))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(uid)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["x"] * len(uid), pa.string()),
        "value": pa.array([1.0] * len(uid), pa.float64()),
    }), str(tmp_path / "events.parquet"))

    from ocr_engine_ray.pipelines.queries import q_events_acf

    rows = {r["lag"]: r for r in q_events_acf(str(tmp_path))
            .take_all()}
    assert rows[1]["autocorr"] == -1.0
    assert rows[1]["n_pairs"] == 9
    assert rows[2]["autocorr"] == 1.0


def test_tool_followup_python_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_tool_followup,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"])
    n_tool = n_cons = 0
    for _, g in df.groupby("conv_id"):
        roles = g["role"].tolist()
        for i, role in enumerate(roles):
            if role != "tool":
                continue
            n_tool += 1
            nxt = next((r for r in roles[i + 1:] if r != "tool"),
                       None)
            if nxt == "assistant":
                n_cons += 1
    r = q_transcripts_tool_followup(
        "/root/testdata/sf0.001").take_all()[0]
    assert r["n_tool_turns"] == n_tool
    assert r["n_consumed"] == n_cons
    assert r["n_dangling"] == n_tool - n_cons
    assert r["consumed_rate"] == float(n_cons) / float(n_tool)


def test_burstiness_planted(ray_session, tmp_path):
    """'steady' fires exactly 2/day (variance 0 → fano 0, burstiness
    −1); 'bursty' fires 1 and 7 → hand-computed dispersion."""
    import math

    uid, ts, et = [], [], []
    for d in range(4):
        for _ in range(2):
            uid.append(1)
            ts.append(_ts(d, len(ts) % 1000))
            et.append("steady")
    for d, k in [(0, 1), (1, 7)]:
        for _ in range(k):
            uid.append(2)
            ts.append(_ts(d, 2000 + len(ts)))
            et.append("bursty")
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(uid)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array([1.0] * len(uid), pa.float64()),
    }), str(tmp_path / "events.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_events_type_burstiness,
    )

    rows = {r["event_type"]: r for r in
            q_events_type_burstiness(str(tmp_path)).take_all()}
    st = rows["steady"]
    assert st["fano"] == 0.0 and st["burstiness"] == -1.0
    bu = rows["bursty"]
    # n=2, S=8, S2=50: vn = 2*50-64 = 36; F = 36/16; B=(6-8)/(6+8)
    assert bu["fano"] == round(36.0 / 16.0, 6)
    assert bu["burstiness"] == round((6.0 - 8.0) / (6.0 + 8.0), 6)
    assert bu["n_days"] == 2 and bu["n_total"] == 8


def test_compression_ratio_zlib_parity(ray_session, tmp_path):
    import zlib

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["ab" * 500, "the quick brown fox", None],
                         pa.string()),
    }), str(tmp_path / "documents.parquet"))

    from ocr_engine_ray.pipelines.queries import (
        q_documents_compression_ratio,
    )

    rows = {r["doc_id"]: r for r in
            q_documents_compression_ratio(str(tmp_path)).take_all()}
    for did, txt in [(1, "ab" * 500), (2, "the quick brown fox"),
                     (3, "")]:
        enc = txt.encode()
        assert rows[did]["raw_bytes"] == len(enc)
        assert rows[did]["compressed_bytes"] == len(
            zlib.compress(enc, 6))
    assert rows[1]["ratio"] < 0.1      # template spam compresses away
    assert rows[2]["ratio"] > 0.5      # short natural text doesn't
    assert rows[3]["ratio"] == 1.0     # empty-doc convention


# ---------------------------------------------------------------------------
# session-12 wave 7: link density, md structure, system prompts
# ---------------------------------------------------------------------------

def _write_transcript_synth_override():
    """Wave-7 transcripts queries read the derived synth corpus; the
    planted tests therefore assert against a Python re reference on
    that same corpus rather than a tmp table."""


def test_link_density_python_reference(ray_session):
    import re as _re

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_link_density,
    )

    df = _synth_df()
    html = df[df["text"].fillna("").str.startswith("<!DOCTYPE")]
    pat = _re.compile(r"<a [^>]*>[^<]*</a>")
    rows = q_transcripts_link_density(
        "/root/testdata/sf0.001").take_all()
    assert len(rows) == len(html)
    by = {}
    for _, r in html.iterrows():
        t = r["text"]
        stripped = pat.sub("", t)
        by.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (len(pat.findall(t)), len(t), len(t) - len(stripped)))
    for r in rows:
        assert (r["n_links"], r["total_chars"], r["link_chars"]) \
            in by[(r["conv_id"], r["turn_idx"])]
        assert r["link_density"] == float(r["link_chars"]) / float(
            max(r["total_chars"], 1))
        # boilerplate-heavy synth HTML: nav links must be detected
        assert r["n_links"] >= 1


def test_md_structure_python_reference(ray_session):
    import re as _re

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_md_structure,
    )

    df = _synth_df()
    h = _re.compile(r"^#+ ", _re.M)
    link = _re.compile(r"\[[^\]]*\]\([^)]*\)")
    code = _re.compile(r"`[^`]+`")
    md = df[df["text"].fillna("").apply(lambda t: bool(h.search(t)))]
    rows = q_transcripts_md_structure(
        "/root/testdata/sf0.001").take_all()
    assert len(rows) == len(md)
    by = {}
    for _, r in md.iterrows():
        t = r["text"]
        by.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (len(h.findall(t)), len(link.findall(t)),
             len(code.findall(t))))
    for r in rows:
        assert (r["n_headers"], r["n_links"], r["n_code_spans"]) \
            in by[(r["conv_id"], r["turn_idx"])]


def test_system_prompts_python_reference(ray_session):
    import hashlib

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_system_prompts,
    )

    df = _synth_df()
    sysd = df[df["role"] == "system"].copy()
    sysd["md5"] = sysd["text"].fillna("").apply(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    agg = sysd.groupby("md5").agg(
        n_turns=("md5", "size"), n_convs=("conv_id", "nunique"))
    top = agg.sort_values(["n_turns", "md5"],
                          ascending=[False, True]).head(10)
    rows = q_transcripts_system_prompts(
        "/root/testdata/sf0.001").take_all()
    got = [(r["sys_md5"], r["n_turns"], r["n_convs"]) for r in rows]
    exp = [(i, int(r["n_turns"]), int(r["n_convs"]))
           for i, r in top.iterrows()]
    assert got == exp
