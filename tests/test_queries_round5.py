"""Python-reference semantic tests for the round-5 transcripts wave:
turn-order integrity audit, conversation-prefix duplicate groups,
agent-loop run detection, per-tool latency quantiles, and extraction
anchor spans.  Bit-exactness vs DuckDB is pinned by the contract
sweep; these pin SEMANTICS against independent pandas/Python
references on the sf0.001 synthetic corpus.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _synth_df():
    from ocr_engine_ray.pipelines.queries import transcript_paths

    paths = transcript_paths("/root/testdata/sf0.001")
    return pd.concat([pq.read_table(p).to_pandas() for p in paths],
                     ignore_index=True)


def test_turn_integrity_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_turn_integrity,
    )

    df = _synth_df()
    rows = {r["conv_id"]: r for r in q_transcripts_turn_integrity(
        "/root/testdata/sf0.001").take_all()}
    assert len(rows) == df["conv_id"].nunique()
    for cid, g in df.groupby("conv_id"):
        r = rows[cid]
        idx = g["turn_idx"].astype("int64")
        assert r["n_turns"] == len(g)
        assert r["n_distinct"] == idx.nunique()
        assert r["min_idx"] == int(idx.min())
        assert r["max_idx"] == int(idx.max())
        assert r["n_gaps"] == int(idx.max() - idx.min() + 1
                                  - idx.nunique())
        assert r["n_dup_idx"] == len(g) - idx.nunique()
        assert r["is_contiguous"] == (
            int(idx.min()) == 0 and r["n_gaps"] == 0
            and r["n_dup_idx"] == 0)
    # the synthetic corpus plants full-row duplicate turns → at least
    # one conv must be flagged non-contiguous
    assert any(not r["is_contiguous"] for r in rows.values())


def test_conv_prefix_groups_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_conv_prefix_groups,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "role",
                                  "text"], kind="stable")
    ref = {}
    for cid, g in df.groupby("conv_id"):
        head = g.head(2)
        joined = "\x1f".join(
            f"{r}:{t}" for r, t in zip(head["role"], head["text"]))
        h = hashlib.md5(joined.encode("utf-8")).hexdigest()
        ref.setdefault(h, []).append(cid)
    rows = q_transcripts_conv_prefix_groups(
        "/root/testdata/sf0.001").take_all()
    got = {r["prefix_md5"]: (r["n_convs"], r["example_conv"])
           for r in rows}
    assert got == {h: (len(v), min(v)) for h, v in ref.items()}
    # every conv lands in exactly one group
    assert sum(n for n, _ in got.values()) == df["conv_id"].nunique()


def test_loop_runs_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_loop_runs,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "role",
                                  "text"], kind="stable")
    rows = {r["conv_id"]: r for r in q_transcripts_loop_runs(
        "/root/testdata/sf0.001").take_all()}
    planted_repeats = 0
    for cid, g in df.groupby("conv_id"):
        trip = list(zip(g["role"], g["tool"], g["text"]))
        max_run, cur, rep = 1, 1, 0
        for a, b in zip(trip, trip[1:]):
            if a == b:
                cur += 1
                rep += 1
            else:
                cur = 1
            max_run = max(max_run, cur)
        r = rows[cid]
        assert (r["n_turns"], r["max_run"],
                r["n_repeat_turns"]) == (len(g), max_run, rep)
        planted_repeats += rep
    # the planted full-row duplicates make adjacent identical pairs
    assert planted_repeats > 0


def test_tool_latency_quantiles_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_tool_latency_quantiles,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"],
                                 kind="stable")
    gaps = {}
    for cid, g in df.groupby("conv_id"):
        us = (g["ts"].astype("datetime64[us]").astype("int64")
              ).to_numpy()
        d = np.diff(us)
        roles = g["role"].to_numpy()[1:]
        tools = g["tool"].to_numpy()[1:]
        for gap, ro, to in zip(d, roles, tools):
            if ro == "tool" and to:
                gaps.setdefault(to, []).append(int(gap))

    def qdisc(vals, q):
        s = sorted(vals)
        return float(s[int(np.ceil(len(s) * q)) - 1])

    rows = {r["tool"]: r for r in q_transcripts_tool_latency_quantiles(
        "/root/testdata/sf0.001").take_all()}
    assert set(rows) == set(gaps)
    for t, vals in gaps.items():
        assert rows[t]["q50"] == qdisc(vals, 0.5)
        assert rows[t]["q90"] == qdisc(vals, 0.9)


def test_anchor_spans_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_anchor_spans,
    )

    df = _synth_df()
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["pos_invoice"],
         r["pos_total"], r["pos_date"])
        for r in q_transcripts_anchor_spans(
            "/root/testdata/sf0.001").take_all())

    def pos(text, a):
        # CHARACTER-based 1-indexed (strpos semantics); absent → 0.
        # Python str.find is already char-based.
        return text.find(a) + 1

    # multiset compare: planted duplicate turns legitimately emit one
    # output row per input row
    exp = []
    for _, r in df.iterrows():
        p = [pos(r["text"], a) for a in ("Invoice", "Total", "Date")]
        if any(v > 0 for v in p):
            exp.append((r["conv_id"], int(r["turn_idx"]), *p))
    assert got == sorted(exp) and len(got) > 0


def test_episodes_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_transcripts_episodes

    df = _synth_df().sort_values(["conv_id", "turn_idx", "ts"],
                                 kind="stable")
    rows = {r["conv_id"]: r for r in q_transcripts_episodes(
        "/root/testdata/sf0.001").take_all()}
    split_seen = False
    for cid, g in df.groupby("conv_id"):
        us = (g["ts"].astype("datetime64[us]").astype("int64")
              ).to_numpy()
        d = np.diff(us)
        brk = d > 90_000_000
        max_ep, cur = 1, 1
        for b in brk:
            cur = 1 if b else cur + 1
            max_ep = max(max_ep, cur)
        r = rows[cid]
        assert r["n_turns"] == len(g)
        assert r["n_episodes"] == 1 + int(brk.sum())
        assert r["max_episode_turns"] == max_ep
        assert r["max_gap_us"] == (int(d.max()) if len(d) else 0)
        split_seen = split_seen or brk.any()
    assert split_seen  # the 90 s threshold must actually split


def test_communities_reference(ray_session):
    """Union-find reference over the strong (w>=3) co-purchase edges
    of the sf0.001 corpus."""
    import duckdb

    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_communities,
    )

    con = duckdb.connect()
    edges = con.execute("""
        WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
                    FROM '/root/testdata/sf0.001/lineitem.parquet'),
        e AS (SELECT a.p a, b.p b, COUNT(*) w FROM op a
              JOIN op b USING (o) WHERE a.p < b.p GROUP BY 1, 2)
        SELECT a, b FROM e WHERE w >= 3""").fetchall()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {}
    for a, b in edges:
        for x in (a, b):
            ref.setdefault(find(x), set()).add(x)
    exp = sorted((min(v), len(v)) for v in ref.values())
    got = sorted((r["component"], r["n_parts"])
                 for r in q_parts_copurchase_communities(
                     "/root/testdata/sf0.001").take_all())
    assert got == exp and len(got) > 0


def test_role_balance_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_role_balance,
    )

    df = _synth_df().sort_values(["conv_id", "turn_idx", "role",
                                  "text"], kind="stable")
    rows = {r["conv_id"]: r for r in q_transcripts_role_balance(
        "/root/testdata/sf0.001").take_all()}
    for cid, g in df.groupby("conv_id"):
        r = rows[cid]
        vc = g["role"].value_counts()
        for role in ("system", "user", "assistant", "tool"):
            assert r[f"n_{role}"] == int(vc.get(role, 0))
        assert r["has_system"] == (int(vc.get("system", 0)) > 0)
        assert r["first_role"] == g["role"].iloc[0]


def test_embeddings_qa_reference(ray_session):
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_embeddings_qa
    from ocr_engine_ray.util import scaled_int_sql

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["embedding"])
    m = np.asarray(t.column("embedding").to_pylist(), np.float64)
    norm2 = np.cumsum(m * m, axis=1)[:, -1]
    nq = scaled_int_sql(norm2, 1e6)
    r = q_embeddings_qa("/root/testdata/sf0.001").take_all()[0]
    assert r["n_vecs"] == len(m)
    assert r["dim_min"] == r["dim_max"] == m.shape[1]
    assert r["n_zero"] == int((nq == 0).sum())
    assert r["norm2q_min"] == int(nq.min())
    assert r["norm2q_max"] == int(nq.max())
    assert r["norm2q_sum"] == int(nq.sum())


def test_copurchase_edge_cache_reuse(ray_session):
    """The per-process edge memo returns the SAME materialized
    Dataset for repeat calls on one sf_dir and distinct ones for
    distinct dirs."""
    from ocr_engine_ray.pipelines import queries as q

    q._COPURCHASE_EDGE_CACHE.clear()
    a = q._copurchase_edges("/root/testdata/sf0.001")
    b = q._copurchase_edges("/root/testdata/sf0.001")
    assert a is b
    assert a.count() == b.count() > 0


def test_betweenness_independent_reference(ray_session):
    """Sampled-Brandes betweenness vs an INDEPENDENT pure-Python
    dict-based Brandes (Ulrik Brandes 2001, textbook form) on the
    sf0.001 co-purchase graph, same md5-ranked source sample and the
    same per-source 1e9 quantization."""
    import hashlib
    from collections import defaultdict, deque

    import duckdb

    from ocr_engine_ray.pipelines import queries as q
    from ocr_engine_ray.util import scaled_int_sql

    con = duckdb.connect()
    edges = con.execute("""
        WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
                    FROM '/root/testdata/sf0.001/lineitem.parquet')
        SELECT DISTINCT a.p, b.p FROM op a JOIN op b USING (o)
        WHERE a.p < b.p""").fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    ranked = sorted(
        nodes, key=lambda v: (hashlib.md5(
            f"{v}\x1f42".encode()).hexdigest(), v))
    sources = sorted(ranked[:q.BETWEENNESS_SOURCES])

    acc = defaultdict(int)
    for s in sources:
        # textbook Brandes: BFS with path counts, stack-order backprop
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = []
        dq = deque([s])
        while dq:
            u = dq.popleft()
            order.append(u)
            for v in sorted(adj[u]):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = defaultdict(float)
        for w in reversed(order):
            for u in sorted(adj[w]):
                if dist.get(u, -2) == dist[w] - 1:
                    delta[u] += (sigma[u] / sigma[w]) * (1 + delta[w])
        delta[s] = 0.0
        for v, d in delta.items():
            if v != s:
                acc[v] += int(scaled_int_sql(
                    __import__("numpy").array([d]), 1e9)[0])

    exp = sorted(((v, c) for v, c in acc.items() if c),
                 key=lambda t: (-t[1], t[0]))[:20]
    got = [(r["p"], r["bc_q"]) for r in
           q.q_parts_copurchase_betweenness(
               "/root/testdata/sf0.001").take_all()]
    assert got == exp and len(got) > 0


def test_small_qty_revenue_planted(ray_session, tmp_path):
    """Part 1: quantities 1,10,10,19 → avg 10, threshold 2 (integer
    cross-multiply 5·q·n < Σq ⟺ 20·q < 40 ⟺ q < 2): only the q=1 row
    (price 70.00) qualifies → 70/7 = 10.0 yearly."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import (
        q_parts_small_qty_revenue,
    )

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 10.0, 19.0], pa.float64()),
        "l_extendedprice": pa.array([70.0, 5.0, 5.0, 5.0],
                                    pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    rows = q_parts_small_qty_revenue(str(tmp_path)).take_all()
    assert rows == [{"avg_yearly": 10.0}]


def test_suppliers_sole_late_planted(ray_session, tmp_path):
    """Order 1: suppliers A,B — B ships 40 days after first → sole
    late, charged.  Order 2: B,C both late → nobody.  Order 3: only
    supplier A (single-supplier) → excluded even though late."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import (
        q_suppliers_sole_late,
    )

    def ts(day):
        return dt.datetime(2025, 1, 1) + dt.timedelta(days=day)

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 2, 3, 3], pa.int64()),
        "l_suppkey": pa.array([10, 11, 11, 12, 10, 10, 10],
                              pa.int64()),
        "l_shipdate": pa.array(
            [ts(0), ts(40), ts(0), ts(40), ts(45), ts(0), ts(50)],
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["SUP-A", "SUP-B", "SUP-C"], pa.string()),
    }), str(tmp_path / "supplier.parquet"))
    rows = q_suppliers_sole_late(str(tmp_path)).take_all()
    assert rows == [{"s_name": "SUP-B", "numwait": 1}]


def test_closeness_independent_reference(ray_session):
    """Sampled harmonic closeness vs an independent dict-based BFS on
    the sf0.001 co-purchase graph, same source sample and 1e9
    quantization."""
    import hashlib
    from collections import defaultdict, deque

    import duckdb

    from ocr_engine_ray.pipelines import queries as q
    from ocr_engine_ray.util import scaled_int_sql

    con = duckdb.connect()
    edges = con.execute("""
        WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
                    FROM '/root/testdata/sf0.001/lineitem.parquet')
        SELECT DISTINCT a.p, b.p FROM op a JOIN op b USING (o)
        WHERE a.p < b.p""").fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    ranked = sorted(
        nodes, key=lambda v: (hashlib.md5(
            f"{v}\x1f42".encode()).hexdigest(), v))
    sources = sorted(ranked[:q.BETWEENNESS_SOURCES])

    acc = defaultdict(int)
    for s in sources:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for v, d in dist.items():
            if d > 0:
                acc[v] += int(scaled_int_sql(
                    __import__("numpy").array([1.0 / d]), 1e9)[0])
    exp = sorted(((v, c) for v, c in acc.items() if c),
                 key=lambda t: (-t[1], t[0]))[:20]
    got = [(r["p"], r["hc_q"]) for r in
           q.q_parts_copurchase_closeness(
               "/root/testdata/sf0.001").take_all()]
    assert got == exp and len(got) > 0


def test_cusum_changepoint_planted(ray_session, tmp_path):
    """10 days at 10 events, then 10 days at 100 → the CUSUM argmax
    lands exactly on the regime boundary (k=10) with the level means
    recovered."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import (
        q_events_cusum_changepoint,
    )

    rows_ts = []
    for d in range(20):
        per = 10 if d < 10 else 100
        rows_ts += [dt.datetime(2025, 1, 1 + d, 0, 0, s % 60, s)
                    for s in range(per)]
    pq.write_table(pa.table({
        "ts": pa.array(rows_ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    r = q_events_cusum_changepoint(str(tmp_path)).take_all()[0]
    assert r["k"] == 10
    assert r["change_day"] == dt.datetime(2025, 1, 10)
    assert r["mean_before"] == 10.0 and r["mean_after"] == 100.0


def test_training_prep_dedups_whole_conversations(ray_session,
                                                  tmp_path,
                                                  monkeypatch):
    """Two byte-identical conversations → only the min-conv_id winner
    contributes SFT pairs; a distinct third conversation survives.
    Windowing: with BUDGET tokens per shard the exclusive prefix sum
    assigns the planted long pair to window 1."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines import queries as q

    def conv(cid, long_resp=False):
        resp = " ".join(["tok"] * 2000) if long_resp else "short reply"
        base = dt.datetime(2025, 1, 1)
        return [
            {"conv_id": cid, "turn_idx": 0, "role": "user",
             "text": "hello there", "tool": "", "ts": base},
            {"conv_id": cid, "turn_idx": 1, "role": "assistant",
             "text": "first answer", "tool": "",
             "ts": base + dt.timedelta(seconds=10)},
            {"conv_id": cid, "turn_idx": 2, "role": "assistant",
             "text": resp, "tool": "",
             "ts": base + dt.timedelta(seconds=20)},
        ]

    rows = conv("conv-a") + conv("conv-b") + conv("conv-c",
                                                  long_resp=True)
    shard_dir = tmp_path / "synth"
    shard_dir.mkdir()
    pq.write_table(pa.Table.from_pylist(rows),
                   str(shard_dir / "part-0.parquet"))
    monkeypatch.setattr(
        q, "transcript_paths",
        lambda sf_dir, seed=42: [str(shard_dir / "part-0.parquet")])

    out = q.q_transcripts_training_prep(str(tmp_path)).take_all()
    convs = {r["conv_id"] for r in out}
    # conv-a == conv-b byte-identical → only conv-a (min id) survives
    assert convs == {"conv-a", "conv-c"}
    by = {(r["conv_id"], r["turn_idx"]): r for r in out}
    # conv-c's long response (2000 tokens) pushes its second pair
    # past the 1024-token budget → window 1
    assert by[("conv-c", 1)]["window_idx"] == 0
    assert by[("conv-c", 2)]["window_idx"] == 0 or \
        by[("conv-c", 2)]["response_tokens"] == 2000
    # exclusive prefix: pair at turn 1 has (prompt+resp) tokens small,
    # so pair at turn 2 starts below budget → window 0; its OWN size
    # doesn't move it (greedy exclusive semantics)
    assert by[("conv-a", 2)]["window_idx"] == 0


def test_trimmed_mean_planted(ray_session, tmp_path):
    """Values 1..10 → k = 1 trimmed from each side, mean(2..9) = 5.5;
    a second type with 5 equal values trims nothing below n=10."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_events_trimmed_mean

    rows = [{"event_type": "a", "value": float(v),
             "ts": dt.datetime(2025, 1, 1)} for v in range(1, 11)]
    rows += [{"event_type": "b", "value": 7.0,
              "ts": dt.datetime(2025, 1, 1)} for _ in range(5)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    got = {r["event_type"]: r for r in q_events_trimmed_mean(
        str(tmp_path)).take_all()}
    assert got["a"]["n_values"] == 10
    assert got["a"]["n_trimmed"] == 8
    assert got["a"]["trimmed_mean"] == 5.5
    assert got["b"]["n_trimmed"] == 5
    assert got["b"]["trimmed_mean"] == 7.0


def test_backend_agreement_invariants(ray_session):
    """Content types NOT routed through the template backend must
    agree 100% between the two flagship runs; every type satisfies
    n_turns >= n_agree >= 0 and the pdf rows exist (the routed
    family)."""
    from ocr_engine_ray.pipelines.queries import (
        q_flagship_backend_agreement,
    )

    rows = q_flagship_backend_agreement(
        "/root/testdata/sf0.001").take_all()
    by = {r["content_type"]: r for r in rows}
    assert "pdf" in by
    for ct, r in by.items():
        assert 0 <= r["n_agree"] <= r["n_turns"]
        if ct != "pdf":
            # only pdf_reader-tool turns route through templates
            assert r["n_agree"] == r["n_turns"], ct
