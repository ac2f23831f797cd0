"""Planted-corpus semantic tests for the round-4 session-6 batch:
hard-negative mining, label-centroid outliers, the leakage-safe
(text-keyed) split, and length-bucketed batch planning.  Bit-exactness
vs DuckDB is pinned by the contract sweep; these pin the SEMANTICS on
hand-checkable corpora, including the tie-break paths."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _tab(res) -> pa.Table:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        rows = res.take_all()
        if not rows:
            return res.schema().base_schema.empty_table()
        return pa.Table.from_pylist(rows)
    return res


def _vec(i: int, j: int = -1, a: float = 1.0, b: float = 0.0):
    v = np.zeros(64, np.float32)
    v[i] = a
    if j >= 0:
        v[j] = b
    return list(map(float, v))


def _write_emb(tmp_path, rows):
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))


def test_hard_negatives_masks_own_label(ray_session, tmp_path):
    """The identical same-label twin (cosine 1.0) must NEVER appear;
    the closest different-label vector ranks 1."""
    rows = [
        (0, _vec(0), 0),                        # the query (label 0)
        (10, _vec(0), 0),                       # identical, same label
        (11, _vec(0, 1, 0.9, 0.1), 1),          # close, label 1
        (12, _vec(1), 2),                       # orthogonal, label 2
        (13, _vec(2), 1),                       # orthogonal, label 1
    ]
    _write_emb(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_embeddings_hard_negatives

    out = _tab(q_embeddings_hard_negatives(str(tmp_path))).to_pylist()
    mine = sorted([r for r in out if r["query_id"] == 0],
                  key=lambda r: r["rank"])
    ids = [r["vec_id"] for r in mine]
    assert 10 not in ids and 0 not in ids       # same-label masked
    assert ids[0] == 11                         # closest wrong class
    assert mine[0]["cosine"] > mine[-1]["cosine"] - 1e-12


def test_hard_negatives_tie_breaks_on_vec_id(ray_session, tmp_path):
    rows = [
        (0, _vec(0), 0),
        (21, _vec(1), 1),   # cosine 0 to the query — exact tie
        (20, _vec(2), 1),   # cosine 0 too; smaller vec_id ranks first
    ]
    _write_emb(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_embeddings_hard_negatives

    out = _tab(q_embeddings_hard_negatives(str(tmp_path))).to_pylist()
    mine = sorted([r for r in out if r["query_id"] == 0],
                  key=lambda r: r["rank"])
    assert [r["vec_id"] for r in mine] == [20, 21]


def test_centroid_outliers_flags_the_planted_outlier(ray_session,
                                                     tmp_path):
    """Three aligned members + one orthogonal outlier: the outlier is
    rank 1 (least similar to its own label centroid); ties resolve to
    the smaller vec_id."""
    rows = [
        (0, _vec(0), 0),
        (1, _vec(0), 0),
        (2, _vec(0), 0),
        (3, _vec(1), 0),               # the outlier
        (5, _vec(3), 1),               # a second label, two members
        (4, _vec(3), 1),
    ]
    _write_emb(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import (
        q_embeddings_centroid_outliers,
    )

    out = _tab(q_embeddings_centroid_outliers(str(tmp_path))).to_pylist()
    lab0 = sorted([r for r in out if r["label"] == 0],
                  key=lambda r: r["rank"])
    assert lab0[0]["vec_id"] == 3
    assert lab0[0]["cosine"] < lab0[1]["cosine"]
    # label 1: both members identical → equal cosine; smaller vec_id
    # ranks first (the twin's ORDER BY cosine ASC, vec_id ASC)
    lab1 = sorted([r for r in out if r["label"] == 1],
                  key=lambda r: r["rank"])
    assert [r["vec_id"] for r in lab1] == [4, 5]


def test_leakage_safe_split_colocates_exact_dups(ray_session, tmp_path):
    """Every copy of an identical text lands in the SAME split band —
    the property the doc_id-keyed split cannot give."""
    texts = (["alpha beta gamma"] * 3
             + ["delta epsilon"] * 2
             + ["zeta eta theta iota"])
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "source": pa.array(["s0"] * len(texts)),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import (
        q_documents_leakage_safe_split,
    )

    out = _tab(q_documents_leakage_safe_split(str(tmp_path))).to_pylist()
    assert len(out) == len(texts)
    by_doc = {r["doc_id"]: r["split"] for r in out}
    assert len({by_doc[i] for i in (0, 1, 2)}) == 1
    assert len({by_doc[i] for i in (3, 4)}) == 1
    # and the band is the shared sampler hash, not an accident
    from ocr_engine_ray.stages.partition import row_hash_hex
    h = row_hash_hex(("alpha beta gamma",), 42)[:8]
    want = ("train" if h <= "cccccccc"
            else "val" if h <= "e6666665" else "test")
    assert by_doc[0] == want


def test_length_batches_packing_and_waste(ray_session, tmp_path):
    """70 one-token docs → bucket 1 in batches of 32/32/6 with zero
    waste; a 200- and a 130-token doc share bucket 2 with pad 200 and
    waste 70."""
    texts = ["w"] * 70 + ["w " * 200, "w " * 130]
    texts = [t.strip() for t in texts]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "source": pa.array(["s0"] * len(texts)),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_length_batches

    out = _tab(q_documents_length_batches(str(tmp_path))).to_pylist()
    plan = {(r["bucket"], r["batch_id"]): r for r in out}
    assert plan[(1, 0)]["n_docs"] == 32 and plan[(1, 0)]["waste_tokens"] == 0
    assert plan[(1, 1)]["n_docs"] == 32
    assert plan[(1, 2)]["n_docs"] == 6 and plan[(1, 2)]["pad_len"] == 1
    b2 = plan[(2, 0)]
    assert b2["n_docs"] == 2 and b2["pad_len"] == 200
    assert b2["waste_tokens"] == 200 * 2 - 330
    assert len(out) == 4


def test_bpe_pair_counts_planted(ray_session, tmp_path):
    """'abab ab' has pairs ab:3, ba:1; a non-ASCII doc exercises the
    per-word fallback with identical character-pair semantics."""
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "source": pa.array(["s0", "s0"]),
        "text": pa.array(["abab ab", "héé"]),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_bpe_pair_counts

    out = {r["pair"]: r["n"]
           for r in q_documents_bpe_pair_counts(str(tmp_path)).to_pylist()}
    assert out["ab"] == 3 and out["ba"] == 1
    assert out["hé"] == 1 and out["éé"] == 1


def test_bpe_pair_counts_ascii_buffer_path_matches_python(ray_session,
                                                          tmp_path):
    """The vectorized Arrow-buffer path agrees with a plain Python
    recount on a word-soup corpus (boundary masking, empty words from
    double spaces, single-char words)."""
    texts = ["the  quick brown fox a", "sphinx of black quartz x y",
             "aa a aaa  aaaa", ""]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "source": pa.array(["s0"] * len(texts)),
        "text": pa.array(texts),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_bpe_pair_counts

    want: dict = {}
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                want[w[i:i + 2]] = want.get(w[i:i + 2], 0) + 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["n"])
           for r in q_documents_bpe_pair_counts(str(tmp_path)).to_pylist()]
    assert got == top


def test_dup_weights_against_python_reference(ray_session):
    """On the real sf0.001 transcript corpus (189-dup seeded corpus
    family): n_copies and weight match an independent Python recount,
    and Σ 1/n over rows equals the distinct-text count."""
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_dup_weights, transcript_paths,
    )

    paths = transcript_paths("/root/testdata/sf0.001")
    counts: dict = {}
    rows = []
    for p in paths:
        t = pq.read_table(p, columns=["conv_id", "turn_idx", "text"])
        for cid, ti, tx in zip(t.column("conv_id").to_pylist(),
                               t.column("turn_idx").to_pylist(),
                               t.column("text").to_pylist()):
            counts[tx] = counts.get(tx, 0) + 1
            rows.append((cid, ti, tx))
    out = q_transcripts_dup_weights("/root/testdata/sf0.001").take_all()
    assert len(out) == len(rows)
    got = {}
    for r in out:
        got.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (r["n_copies"], r["weight"]))
    import collections
    by_key = collections.defaultdict(list)
    for cid, ti, tx in rows:
        by_key[(cid, ti)].append(counts[tx])
    n_dup_rows = 0
    for k, ns in by_key.items():
        assert sorted(n for n, _ in got[k]) == sorted(ns)
        n_dup_rows += sum(1 for n in ns if n > 1)
    assert n_dup_rows > 0, "corpus must exercise the dup path"
    total_weight = sum(w for r in out for _, w in [(r["n_copies"],
                                                    r["weight"])])
    # Σ round(1/n, 6) per row ≈ distinct texts (rounding-tolerant)
    assert abs(total_weight - len(counts)) < 1e-3 * len(counts)


def test_dup_token_mass_against_python_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_dup_token_mass, transcript_paths,
    )

    paths = transcript_paths("/root/testdata/sf0.001")
    counts: dict = {}
    for p in paths:
        for tx in pq.read_table(p, columns=["text"]) \
                .column("text").to_pylist():
            counts[tx] = counts.get(tx, 0) + 1
    total = sum(len(tx.split(" ")) * n for tx, n in counts.items())
    dup = sum(len(tx.split(" ")) * (n - 1) for tx, n in counts.items())
    row = q_transcripts_dup_token_mass("/root/testdata/sf0.001") \
        .take_all()[0]
    assert row["total_tokens"] == total
    assert row["dup_tokens"] == dup
    assert dup > 0


def test_top_terms_per_source_counts_and_ties(ray_session, tmp_path):
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array(["a", "a", "b"]),
        "text": pa.array(["x x y z", "y x w q r", "m m n"]),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import (
        q_documents_top_terms_per_source,
    )

    out = q_documents_top_terms_per_source(str(tmp_path)).take_all()
    a = sorted([r for r in out if r["source"] == "a"],
               key=lambda r: r["rank"])
    # x:3, y:2, then q/r/w/z all 1 → tie broken term ASC, top-5 cuts z
    assert [(r["tok"], r["n"]) for r in a] == [
        ("x", 3), ("y", 2), ("q", 1), ("r", 1), ("w", 1)]
    b = sorted([r for r in out if r["source"] == "b"],
               key=lambda r: r["rank"])
    assert [(r["tok"], r["n"]) for r in b] == [("m", 2), ("n", 1)]


def test_winsorize_clips_to_group_band(ray_session, tmp_path):
    """20 values 1..20 for one type: P5 = 1st value (quantile_disc
    ceil(20·.05)=1), P95 = 19th; so 1→1 kept, 20→19 clipped; a second
    type is untouched by the first's band."""
    import datetime

    n = 20
    pq.write_table(pa.table({
        "event_id": pa.array(range(n + 1), pa.int64()),
        "event_type": pa.array(["p"] * n + ["v"]),
        "value": pa.array([float(i + 1) for i in range(n)] + [500.0]),
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * (n + 1),
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    from ocr_engine_ray.pipelines.queries import q_events_winsorize_values

    out = {r["event_id"]: r["value_w"]
           for r in q_events_winsorize_values(str(tmp_path)).take_all()}
    assert out[0] == 1.0            # at the low band edge
    assert out[18] == 19.0          # the P95 pick itself
    assert out[19] == 19.0          # 20 clipped down to P95
    assert out[n] == 500.0          # singleton type: its own band


def test_windowed_dedup_matches_python_lag_rule(ray_session):
    """Independent recount of the LAG rule on the sf0.001 corpus: a row
    survives iff no identical text occurred within the 7 days strictly
    before it; the corpus must actually exercise both drop and
    re-admit (gap > window) paths."""
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_windowed_dedup, transcript_paths,
    )

    WIN = 7 * 86_400_000_000
    rows = []
    for p in transcript_paths("/root/testdata/sf0.001"):
        t = pq.read_table(p, columns=["conv_id", "turn_idx", "text", "ts"])
        rows += list(zip(t.column("conv_id").to_pylist(),
                         t.column("turn_idx").to_pylist(),
                         t.column("text").to_pylist(),
                         t.column("ts").cast(pa.int64()).to_pylist()))
    by_text: dict = {}
    for cid, ti, tx, ts in rows:
        by_text.setdefault(tx, []).append((ts, cid, ti))
    want = set()
    n_dropped = n_readmitted = 0
    for tx, occ in by_text.items():
        occ.sort()
        prev = None
        for ts, cid, ti in occ:
            if prev is None or ts - prev > WIN:
                want.add((cid, ti, ts))
                if prev is not None:
                    n_readmitted += 1
            else:
                n_dropped += 1
            prev = ts
    got = {(r["conv_id"], r["turn_idx"],
            int(r["ts"].timestamp() * 1e6) if hasattr(r["ts"], "timestamp")
            else r["ts"])
           for r in q_transcripts_windowed_dedup(
               "/root/testdata/sf0.001").take_all()}
    assert len(got) == len(want)
    assert n_dropped > 0


def test_daily_ewma_recursion(ray_session, tmp_path):
    """Counts 4, 2, 8 on three days: e = 4, 3, 5.5 by the textbook
    recursion e_t = x_t/2 + e_{t-1}/2."""
    import datetime

    ts = ([datetime.datetime(2024, 1, 1)] * 4
          + [datetime.datetime(2024, 1, 2)] * 2
          + [datetime.datetime(2024, 1, 3)] * 8)
    pq.write_table(pa.table({"ts": pa.array(ts, pa.timestamp("us"))}),
                   str(tmp_path / "events.parquet"))
    from ocr_engine_ray.pipelines.queries import q_events_daily_ewma

    rows = sorted(q_events_daily_ewma(str(tmp_path)).take_all(),
                  key=lambda r: r["day"])
    assert [r["n_events"] for r in rows] == [4, 2, 8]
    assert [r["ewma"] for r in rows] == [4.0, 3.0, 5.5]


def test_rfm_scores_planted(ray_session, tmp_path):
    """Five customers in one nation with strictly ordered metrics get
    distinct 1..5 scores; the most-recent/most-frequent/biggest-spender
    customer scores 1 on each axis."""
    import datetime

    o_rows = []
    for ci in range(5):
        for k in range(5 - ci):       # cust 0: 5 orders ... cust 4: 1
            o_rows.append((100 * ci + k, ci,
                           datetime.datetime(2024, 1, 20 - ci),
                           100.0 * (5 - ci)))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in o_rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in o_rows], pa.int64()),
        "o_orderdate": pa.array([r[2] for r in o_rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([r[3] for r in o_rows], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(5), pa.int64()),
        "c_nationkey": pa.array([7] * 5, pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    from ocr_engine_ray.pipelines.queries import q_customers_rfm_segments

    out = {r["c_custkey"]: r
           for r in q_customers_rfm_segments(str(tmp_path)).take_all()}
    assert len(out) == 5
    for ci in range(5):
        r = out[ci]
        assert r["r_score"] == ci + 1
        assert r["f_score"] == ci + 1
        assert r["m_score"] == ci + 1
        assert r["c_nationkey"] == 7
    assert out[0]["n_orders"] == 5
    assert out[0]["monetary_cents"] == 5 * 50000


def test_pareto_share_planted(ray_session, tmp_path):
    """10 users with values 1..10: top-1 user (CEIL(10/10)) holds
    10/55; an all-NULL-value user is excluded from the population."""
    import datetime

    uid = list(range(10)) + [99]
    val = [float(i + 1) for i in range(10)] + [None]
    pq.write_table(pa.table({
        "event_id": pa.array(range(11), pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["p"] * 11),
        "value": pa.array(val, pa.float64()),
        "ts": pa.array([datetime.datetime(2024, 1, 1)] * 11,
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    from ocr_engine_ray.pipelines.queries import q_events_pareto_share

    r = q_events_pareto_share(str(tmp_path)).take_all()[0]
    assert r["n_users"] == 10 and r["top_users"] == 1
    assert r["total_cents"] == 5500 and r["top_cents"] == 1000
    assert abs(r["top_share"] - round(1000 / 5500, 6)) < 1e-12


def test_new_vs_returning_split(ray_session, tmp_path):
    """User A appears day 1 (2 events) and day 2 (1); user B only
    day 2 (3 events): day 1 = 1 new user / 2 events, day 2 = 1 new
    (B, 3 events) + 1 returning (A, 1 event)."""
    import datetime

    rows = [(0, datetime.datetime(2024, 1, 1, 5)),
            (0, datetime.datetime(2024, 1, 1, 6)),
            (0, datetime.datetime(2024, 1, 2, 5)),
            (1, datetime.datetime(2024, 1, 2, 6)),
            (1, datetime.datetime(2024, 1, 2, 7)),
            (1, datetime.datetime(2024, 1, 2, 8))]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    from ocr_engine_ray.pipelines.queries import q_events_new_vs_returning

    out = {r["day"].day if hasattr(r["day"], "day") else r["day"]: r
           for r in q_events_new_vs_returning(str(tmp_path)).take_all()}
    d1, d2 = out[1], out[2]
    assert d1["n_new_users"] == 1 and d1["new_events"] == 2
    assert d1["n_returning_users"] == 0
    assert d2["n_new_users"] == 1 and d2["new_events"] == 3
    assert d2["n_returning_users"] == 1 and d2["returning_events"] == 1
