"""Independent Python-reference tests for the round-5r wave:
tool-retry census and the conversation-length histogram.
"""

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _synth_df():
    from ocr_engine_ray.pipelines.queries import transcript_paths

    return pd.concat([pq.read_table(p).to_pandas()
                      for p in transcript_paths(SF)],
                     ignore_index=True)


def test_tool_retry_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_tool_retry_rate,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"],
                                 kind="stable")
    ref = {}
    for _, g in df.groupby("conv_id", sort=False):
        seq = [(r, t or "", x or "")
               for r, t, x in zip(g["role"], g["tool"], g["text"])
               if r == "tool" and (t or "") != ""]
        prev = None
        for _, tool, text in seq:
            st = ref.setdefault(tool, [0, 0, 0])
            st[0] += 1
            if prev is not None and prev[0] == tool:
                st[1] += 1
                if prev[1] != text:
                    st[2] += 1
            prev = (tool, text)
    rows = {r["tool"]: r for r in
            q_transcripts_tool_retry_rate(SF).take_all()}
    assert set(rows) == set(ref)
    for tool, (n, rep, dif) in ref.items():
        r = rows[tool]
        assert r["n_calls"] == n
        assert r["n_repeats"] == rep
        assert r["n_changed_repeats"] == dif
        assert abs(r["repeat_rate"] - rep / n) < 1e-12
    assert sum(st[1] for st in ref.values()) > 0


def test_conv_length_hist_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_conv_length_hist,
    )

    df = _synth_df()
    sizes = df.groupby("conv_id").size()
    ref = sizes.value_counts().to_dict()
    rows = {r["n_turns"]: r for r in
            q_transcripts_conv_length_hist(SF).take_all()}
    assert set(rows) == set(ref)
    for n, c in ref.items():
        assert rows[n]["n_convs"] == c
        assert rows[n]["total_turns"] == n * c
    assert sum(r["total_turns"] for r in rows.values()) == len(df)


def test_pr_length_joint_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_pr_length_joint,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"],
                                 kind="stable")
    ref = {}
    for _, g in df.groupby("conv_id", sort=False):
        toks = [len((t or "").split(" ")) for t in g["text"]]
        roles = list(g["role"])
        for i, r in enumerate(roles):
            if r != "assistant":
                continue
            x = sum(toks[max(0, i - 3):i])
            y = toks[i]
            bp = x.bit_length() - 1 if x > 0 else -1
            br = y.bit_length() - 1 if y > 0 else -1
            ref[(bp, br)] = ref.get((bp, br), 0) + 1
    rows = {(r["prompt_bucket"], r["response_bucket"]): r["n_pairs"]
            for r in q_transcripts_pr_length_joint(SF).take_all()}
    assert rows == ref
    assert sum(ref.values()) == sum(
        1 for r in df["role"] if r == "assistant")


def test_weight_hist_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_weight_hist,
    )

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]) \
        .to_pandas().drop_duplicates()
    pairs = {}
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                k = (ps[i], ps[j])
                pairs[k] = pairs.get(k, 0) + 1
    from collections import Counter
    ref = Counter(pairs.values())
    m = len(pairs)
    rows = {r["w"]: r for r in
            q_parts_copurchase_weight_hist(SF).take_all()}
    assert set(rows) == set(ref)
    for w, c in ref.items():
        assert rows[w]["n_edges"] == c
        assert abs(rows[w]["edge_share"] - c / m) < 1e-12
    assert sum(r["n_edges"] for r in rows.values()) == m


def test_xcorr_reference(ray_session):
    import math

    import numpy as np

    from ocr_engine_ray.pipelines.queries import q_events_xcorr

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["day"] = ev["ts"].dt.floor("D")
    v = ev[ev.event_type == "view"].groupby("day").size()
    p = ev[ev.event_type == "purchase"].groupby("day").size()
    rows = {r["lag"]: r for r in q_events_xcorr(SF).take_all()}
    import datetime as dt
    for k in range(-7, 8):
        xs, ys = [], []
        for d, n in v.items():
            d2 = d + dt.timedelta(days=k)
            if d2 in p.index:
                xs.append(n)
                ys.append(p[d2])
        if len(xs) < 2:
            assert k not in rows
            continue
        r = np.corrcoef(xs, ys)[0, 1]
        assert rows[k]["n_pairs"] == len(xs)
        assert abs(rows[k]["xcorr"] - r) < 1e-6
    assert len(rows) > 5


def test_tool_depth_profile_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_tool_depth_profile,
    )

    df = _synth_df()
    df = df[(df.role == "tool") & (df.tool.fillna("") != "")]

    def bucket(i):
        return 0 if i < 5 else 1 if i < 10 else 2 if i < 20 else 3

    ref = {}
    for _, row in df.iterrows():
        k = (row["tool"], bucket(row["turn_idx"]))
        ref[k] = ref.get(k, 0) + 1
    totals = {}
    for (t, _), n in ref.items():
        totals[t] = totals.get(t, 0) + n
    out = q_transcripts_tool_depth_profile(SF)
    rows = {(r["tool"], r["depth_bucket"]): r
            for r in out.to_pylist()}
    assert set(rows) == set(ref)
    for k, n in ref.items():
        assert rows[k]["n_calls"] == n
        assert abs(rows[k]["share"] - n / totals[k[0]]) < 1e-12


def test_degree_matrix_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_degree_matrix,
    )

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]) \
        .to_pandas().drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ref = {}
    for a, b in edges:
        ba = deg[a].bit_length() - 1
        bb = deg[b].bit_length() - 1
        k = (min(ba, bb), max(ba, bb))
        ref[k] = ref.get(k, 0) + 1
    m = len(edges)
    rows = {(r["bucket_a"], r["bucket_b"]): r for r in
            q_parts_copurchase_degree_matrix(SF).take_all()}
    assert set(rows) == set(ref)
    for k, n in ref.items():
        assert rows[k]["n_edges"] == n
        assert abs(rows[k]["edge_share"] - n / m) < 1e-12


def test_weekly_role_mix_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_weekly_role_mix,
    )

    df = _synth_df()
    df["week"] = df["ts"].dt.to_period("W-SUN").dt.start_time
    df["tok"] = [len((t or "").split(" ")) for t in df["text"]]
    ref = {}
    for (w, r), g in df.groupby(["week", "role"]):
        ref[(w, r)] = (len(g), int(g["tok"].sum()))
    wk_tot = {}
    for (w, _), (_, t) in ref.items():
        wk_tot[w] = wk_tot.get(w, 0) + t
    out = q_transcripts_weekly_role_mix(SF)
    rows = {(pd.Timestamp(r["week"]), r["role"]): r
            for r in out.to_pylist()}
    assert set(rows) == set(ref)
    for k, (n, t) in ref.items():
        assert rows[k]["n_turns"] == n
        assert rows[k]["sum_tokens"] == t
        assert abs(rows[k]["token_share"] - t / wk_tot[k[0]]) \
            < 1e-12


def test_quality_census_consistency(ray_session):
    """The composed census must agree with the three standalone gate
    Datasets it reuses."""
    from ocr_engine_ray.pipelines.queries import (
        q_documents_c4_gate, q_documents_gopher_gate,
        q_documents_quality_census, q_documents_repetition,
    )

    c4 = {r["doc_id"]: r["keep"]
          for r in q_documents_c4_gate(SF).take_all()}
    go = {r["doc_id"]: r["keep"]
          for r in q_documents_gopher_gate(SF).take_all()}
    rep = {r["doc_id"]: bool(r["keep"])
           for r in q_documents_repetition(SF).take_all()}
    rows = {r["reason"]: r for r in
            q_documents_quality_census(SF).take_all()}
    n = len(c4)
    assert all(r["n_docs"] == n for r in rows.values())
    assert rows["c4"]["n_flagged"] == sum(
        1 for v in c4.values() if not v)
    assert rows["gopher"]["n_flagged"] == sum(
        1 for v in go.values() if not v)
    assert rows["repetition"]["n_flagged"] == sum(
        1 for v in rep.values() if not v)
    assert rows["pass"]["n_flagged"] == sum(
        1 for d in c4 if c4[d] and go[d] and rep[d])


def test_totals_reconciliation_consistency(ray_session):
    """The census must agree with the bit-exact per-turn totals."""
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_totals, q_transcripts_totals_reconciliation,
    )

    rows = q_transcripts_totals(SF).take_all()
    all3 = [(r["grand_total_cents"], r["taxes_cents"],
             r["final_total_cents"]) for r in rows
            if r["grand_total_cents"] is not None
            and r["taxes_cents"] is not None
            and r["final_total_cents"] is not None]
    gaps = [abs(g + t - f) for g, t, f in all3]
    rec = q_transcripts_totals_reconciliation(SF).take_all()[0]
    assert rec["n_all3"] == len(all3)
    assert rec["n_reconciled"] == sum(1 for g in gaps if g == 0)
    assert rec["n_mismatch"] == sum(1 for g in gaps if g != 0)
    assert rec["max_abs_gap_cents"] == (max(gaps) if gaps else 0)
    assert rec["n_all3"] > 0


def test_supplier_otif_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_supplier_otif

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_suppkey", "l_orderkey",
                                "l_shipdate"]).to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderkey",
                                "o_orderdate"]).to_pandas()
    m = dict(zip(od["o_orderkey"], od["o_orderdate"]))
    ref = {}
    for _, row in li.iterrows():
        lag = (row["l_shipdate"].floor("D")
               - m[row["l_orderkey"]].floor("D")).days
        st = ref.setdefault(row["l_suppkey"], [0, 0])
        st[0] += 1
        st[1] += 1 if lag <= 30 else 0
    rows = {r["l_suppkey"]: r for r in
            q_supplier_otif(SF).take_all()}
    assert set(rows) == set(ref)
    for k, (n, o) in ref.items():
        assert rows[k]["n_items"] == n
        assert rows[k]["n_ontime"] == o
        assert abs(rows[k]["ontime_rate"] - o / n) < 1e-12


def test_week_retention_jaccard_reference(ray_session):
    import datetime as dt

    from ocr_engine_ray.pipelines.queries import (
        q_events_week_retention_jaccard,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["week"] = ev["ts"].dt.to_period("W-SUN").dt.start_time
    sets = {w: set(g["user_id"]) for w, g in ev.groupby("week")}
    weeks = sorted(sets)
    rows = {pd.Timestamp(r["week"]): r for r in
            q_events_week_retention_jaccard(SF).take_all()}
    for w in weeks:
        nxt = w + dt.timedelta(days=7)
        if nxt not in sets:
            assert w not in rows or rows[w]["n_shared"] == 0
            continue
        c = len(sets[w] & sets[nxt])
        if c == 0:
            assert w not in rows
            continue
        r = rows[w]
        assert r["n_week"] == len(sets[w])
        assert r["n_next"] == len(sets[nxt])
        assert r["n_shared"] == c
        un = len(sets[w] | sets[nxt])
        assert abs(r["jaccard"] - c / un) < 1e-12
    assert len(rows) > 0


def test_weekly_priority_mix_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_orders_weekly_priority_mix,
    )

    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderdate",
                                "o_orderpriority"]).to_pandas()
    od["week"] = pd.to_datetime(od["o_orderdate"]) \
        .dt.to_period("W-SUN").dt.start_time
    ref = od.groupby(["week", "o_orderpriority"]).size().to_dict()
    wk_tot = od.groupby("week").size().to_dict()
    out = q_orders_weekly_priority_mix(SF)
    rows = {(pd.Timestamp(r["week"]), r["priority"]): r
            for r in out.to_pylist()}
    assert set(rows) == set(ref)
    for k, n in ref.items():
        assert rows[k]["n_orders"] == n
        assert abs(rows[k]["share"] - n / wk_tot[k[0]]) < 1e-12


def test_amount_stats_reference(ray_session):
    import re

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_amount_stats,
    )

    df = _synth_df()
    pat = re.compile(r"[\d,]+\.\d{2}")
    ref = {}
    for _, row in df.iterrows():
        found = pat.findall(row["text"] or "")
        if not found:
            continue
        st = ref.setdefault(row["role"], [0, 0, 0, 0])
        st[1] += 1
        for m in found:
            c = int(round(float(m.replace(",", "")) * 100))
            st[0] += 1
            st[2] += c
            st[3] = max(st[3], c)
    rows = {r["role"]: r for r in
            q_transcripts_amount_stats(SF).take_all()}
    assert set(rows) == set(ref)
    for role, (na, nt, s, mx) in ref.items():
        r = rows[role]
        assert r["n_amounts"] == na
        assert r["n_amount_turns"] == nt
        assert r["sum_cents"] == s
        assert r["max_cents"] == mx
    assert sum(st[0] for st in ref.values()) > 0


def test_weekly_gini_reference(ray_session):
    import numpy as np

    from ocr_engine_ray.pipelines.queries import q_events_weekly_gini

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["week"] = ev["ts"].dt.to_period("W-SUN").dt.start_time
    rows = {pd.Timestamp(r["week"]): r for r in
            q_events_weekly_gini(SF).take_all()}
    for w, g in ev.groupby("week"):
        x = np.sort(g.groupby("user_id").size().to_numpy())
        n = len(x)
        tot = int(x.sum())
        i = np.arange(1, n + 1)
        gini = ((2 * i - n - 1) * x).sum() / (n * tot)
        r = rows[pd.Timestamp(w)]
        assert r["n_users"] == n
        assert r["n_events"] == tot
        assert abs(r["gini"] - gini) < 1e-12
        assert 0 <= r["gini"] < 1


def test_session_count_hist_reference(ray_session):
    import numpy as np

    from ocr_engine_ray.pipelines.queries import (
        q_events_session_count_hist,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ref = {}
    for _, g in ev.groupby("user_id"):
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]")
                     .astype(np.int64))
        breaks = int((np.diff(ts) > 30 * 60 * 1_000_000).sum()) \
            if len(ts) > 1 else 0
        k = breaks + 1
        ref[k] = ref.get(k, 0) + 1
    rows = {r["n_sessions"]: r["n_users"] for r in
            q_events_session_count_hist(SF).take_all()}
    assert rows == ref
    assert sum(ref.values()) == ev["user_id"].nunique()


def test_repeat_rate_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_orders_repeat_rate

    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_custkey"]).to_pandas()
    per = od.groupby("o_custkey").size()
    row = q_orders_repeat_rate(SF).take_all()[0]
    assert row["n_customers"] == len(per)
    assert row["n_repeat_customers"] == int((per >= 2).sum())
    assert row["n_orders"] == int(per.sum())
    assert row["n_repeat_orders"] == int((per - 1).sum())
    assert abs(row["repeat_customer_rate"]
               - (per >= 2).mean()) < 1e-12


def test_start_hour_profile_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_start_hour_profile,
    )

    df = _synth_df()
    starts = df.groupby("conv_id")["ts"].min()
    ref = starts.dt.hour.value_counts().to_dict()
    total = len(starts)
    rows = {r["hour"]: r for r in
            q_transcripts_start_hour_profile(SF).to_pylist()}
    assert set(rows) == set(ref)
    for h, n in ref.items():
        assert rows[h]["n_convs"] == n
        assert abs(rows[h]["share"] - n / total) < 1e-12


def test_latency_by_depth_reference(ray_session):
    import math

    import numpy as np

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_latency_by_depth,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"],
                                 kind="stable")
    per = {}
    for _, g in df.groupby("conv_id", sort=False):
        ts = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        idx = g["turn_idx"].to_numpy()
        roles = list(g["role"])
        for i in range(1, len(ts)):
            if roles[i] != "assistant":
                continue
            d = idx[i]
            b = 0 if d < 5 else 1 if d < 10 else 2 if d < 20 else 3
            per.setdefault(b, []).append(int(ts[i] - ts[i - 1]))
    rows = {r["depth_bucket"]: r for r in
            q_transcripts_latency_by_depth(SF).take_all()}
    assert set(rows) == set(per)
    for b, gaps in per.items():
        gaps = sorted(gaps)
        n = len(gaps)

        def qd(q):
            return gaps[max(math.ceil(q * n), 1) - 1]

        assert rows[b]["n_gaps"] == n
        assert rows[b]["p50_us"] == qd(0.5)
        assert rows[b]["p90_us"] == qd(0.9)


def test_revenue_by_dow_reference(ray_session):
    import numpy as np

    from ocr_engine_ray.pipelines.queries import (
        q_events_revenue_by_dow,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    ev = ev[ev["value"].notna()].copy()
    ev["dow"] = ev["ts"].dt.dayofweek + 1
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    tot = int(ev["cents"].sum())
    rows = {r["isodow"]: r for r in
            q_events_revenue_by_dow(SF).to_pylist()}
    for d, g in ev.groupby("dow"):
        r = rows[d]
        assert r["n_events"] == len(g)
        assert r["sum_cents"] == int(g["cents"].sum())
        assert abs(r["revenue_share"]
                   - g["cents"].sum() / tot) < 1e-12


def test_discount_profile_reference(ray_session):
    import numpy as np

    from ocr_engine_ray.pipelines.queries import (
        q_lineitem_discount_profile,
    )

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_discount",
                                "l_extendedprice"]).to_pandas()
    def half_away(x):
        a = np.abs(x)
        fa = np.floor(a)
        return (np.sign(x) * np.where(a - fa >= 0.5, fa + 1, fa)) \
            .astype(np.int64)

    li["pct"] = half_away(li["l_discount"].to_numpy() * 100.0)
    li["rev"] = half_away(li["l_extendedprice"].to_numpy()
                          * (1.0 - li["l_discount"].to_numpy())
                          * 100.0)
    tot = int(li["rev"].sum())
    rows = {r["discount_pct"]: r for r in
            q_lineitem_discount_profile(SF).to_pylist()}
    for p, g in li.groupby("pct"):
        r = rows[p]
        assert r["n_items"] == len(g)
        assert r["revenue_cents"] == int(g["rev"].sum())
        assert abs(r["revenue_share"] - g["rev"].sum() / tot) < 1e-12


def test_daily_volume_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_daily_volume,
    )

    df = _synth_df()
    df["day"] = df["ts"].dt.floor("D")
    df["tok"] = [len((t or "").split(" ")) for t in df["text"]]
    rows = {pd.Timestamp(r["day"]): r for r in
            q_transcripts_daily_volume(SF).to_pylist()}
    for d, g in df.groupby("day"):
        r = rows[pd.Timestamp(d)]
        assert r["n_turns"] == len(g)
        assert r["sum_tokens"] == int(g["tok"].sum())
        assert r["n_convs_active"] == g["conv_id"].nunique()
        assert abs(r["tokens_per_turn"]
                   - g["tok"].sum() / len(g)) < 1e-9
    assert set(rows) == set(pd.Timestamp(d)
                            for d in df["day"].unique())


def test_cohort_matrix_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_events_cohort_matrix

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["week"] = ev["ts"].dt.to_period("W-SUN").dt.start_time
    wu = ev[["week", "user_id"]].drop_duplicates()
    first = wu.groupby("user_id")["week"].min()
    ref = {}
    for _, row in wu.iterrows():
        c = first[row["user_id"]]
        k = (row["week"] - c).days // 7
        ref[(pd.Timestamp(c), k)] = ref.get((pd.Timestamp(c), k),
                                            0) + 1
    rows = {(pd.Timestamp(r["cohort"]), r["weeks_since"]): r
            for r in q_events_cohort_matrix(SF).take_all()}
    assert set(rows) == set(ref)
    for (c, k), n in ref.items():
        r = rows[(c, k)]
        assert r["n_active"] == n
        assert abs(r["retention"] - n / ref[(c, 0)]) < 1e-12
    # diagonal is 1.0 by construction
    assert all(abs(rows[(c, 0)]["retention"] - 1.0) < 1e-12
               for (c, k) in rows if k == 0)


def test_transcripts_vocab_growth_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_vocab_growth,
    )

    df = _synth_df().sort_values(
        ["conv_id", "turn_idx", "role", "text"], kind="stable")
    stream = []
    for t in df["text"]:
        stream.extend((t or "").split(" "))
    total = len(stream)
    cps = []
    c = 256
    while c < total:
        cps.append(c)
        c *= 4
    cps.append(total)
    rows = {r["checkpoint"]: r["vocab"] for r in
            q_transcripts_vocab_growth(SF).take_all()}
    assert sorted(rows) == cps
    for cp in cps:
        assert rows[cp] == len(set(stream[:cp]))
    vals = [rows[cp] for cp in cps]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    # the transcript vocabulary keeps growing across checkpoints
    assert vals[0] < vals[-1]


def test_linenumber_profile_reference(ray_session):
    import numpy as np

    from ocr_engine_ray.pipelines.queries import (
        q_lineitem_linenumber_profile,
    )

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_linenumber", "l_extendedprice",
                                "l_discount"]).to_pandas()

    def half_away(x):
        a = np.abs(x)
        fa = np.floor(a)
        return (np.sign(x) * np.where(a - fa >= 0.5, fa + 1, fa)) \
            .astype(np.int64)

    li["rev"] = half_away(li["l_extendedprice"].to_numpy()
                          * (1.0 - li["l_discount"].to_numpy())
                          * 100.0)
    tot = int(li["rev"].sum())
    rows = {r["l_linenumber"]: r for r in
            q_lineitem_linenumber_profile(SF).to_pylist()}
    for ln, g in li.groupby("l_linenumber"):
        r = rows[ln]
        assert r["n_items"] == len(g)
        assert r["revenue_cents"] == int(g["rev"].sum())
        assert abs(r["revenue_share"] - g["rev"].sum() / tot) < 1e-12


def test_totalprice_audit_reference(ray_session):
    import numpy as np

    from ocr_engine_ray.pipelines.queries import (
        q_orders_totalprice_audit,
    )

    def half_away(x):
        a = np.abs(x)
        fa = np.floor(a)
        return (np.sign(x) * np.where(a - fa >= 0.5, fa + 1, fa)) \
            .astype(np.int64)

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice",
                                "l_discount", "l_tax"]).to_pandas()
    li["c"] = half_away(li["l_extendedprice"].to_numpy()
                        * (1.0 - li["l_discount"].to_numpy())
                        * (1.0 + li["l_tax"].to_numpy()) * 100.0)
    lsum = li.groupby("l_orderkey")["c"].sum()
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderkey",
                                "o_totalprice"]).to_pandas()
    od["oc"] = half_away(od["o_totalprice"].to_numpy() * 100.0)
    j = od[od["o_orderkey"].isin(lsum.index)]
    gap = np.abs(j["oc"].to_numpy()
                 - lsum.loc[j["o_orderkey"]].to_numpy())
    row = q_orders_totalprice_audit(SF).take_all()[0]
    assert row["n_orders"] == len(j)
    assert row["n_reconciled"] == int((gap <= 1).sum())
    assert row["n_mismatch"] == int((gap > 1).sum())
    assert abs(row["mean_abs_gap_cents"]
               - gap.sum() / len(j)) < 1e-9
    assert row["max_abs_gap_cents"] == int(gap.max())
