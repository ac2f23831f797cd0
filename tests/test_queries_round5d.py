"""Independent Python-reference tests for the round-5d wave:
Dirichlet query-likelihood retrieval, the Bloom-filter membership
audit, and outlink extraction.
"""

import hashlib
import math
import re

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_query_likelihood_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        QL_MU, QL_QUERIES, q_documents_query_likelihood,
    )

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    tot = sum(len(t) for t in toks.values())
    # query set: 16 lowest md5(doc_id \x1f 13)
    ranked = sorted(
        toks, key=lambda d: (hashlib.md5(
            f"{d}\x1f13".encode()).hexdigest(), d))
    qids = ranked[:QL_QUERIES]
    cf = {}
    for t in toks.values():
        for w in t:
            cf[w] = cf.get(w, 0) + 1

    rows = {}
    for r in q_documents_query_likelihood(SF).take_all():
        rows.setdefault(r["query_id"], []).append(r)

    assert set(rows) == set(qids)
    for qid in qids:
        qterms = sorted(set(toks[qid]))
        qconst = sum(round(math.log(QL_MU * (cf[t] / tot)) * 1e6)
                     for t in qterms)
        scores = {}
        for did, dt in toks.items():
            if did == qid:
                continue
            tf = {}
            for w in dt:
                tf[w] = tf.get(w, 0) + 1
            shared = [t for t in qterms if t in tf]
            if not shared:
                continue
            osum = sum(round(math.log(
                1.0 + tf[t] / (QL_MU * (cf[t] / tot))) * 1e6)
                for t in shared)
            lend = round(math.log(len(dt) + QL_MU) * 1e6)
            scores[did] = qconst + osum - len(qterms) * lend
        want = sorted(scores, key=lambda d: (-scores[d], d))[:5]
        got = sorted(rows[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == want
        for r in got:
            assert r["score"] == scores[r["doc_id"]]


def test_bloom_filter_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_events_bloom_filter

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    users = sorted(set(ev["user_id"]))
    mem = [u for u in users if u % 7 == 0]

    def pos(u):
        return [int(hashlib.md5(
            f"{u}\x1f{j}".encode()).hexdigest()[:4], 16) % 512
            for j in range(4)]

    bits = set()
    for u in mem:
        bits.update(pos(u))
    hits = [u for u in users if all(p in bits for p in pos(u))]
    fp = [u for u in hits if u % 7 != 0]

    row = q_events_bloom_filter(SF).take_all()[0]
    assert row["n_members"] == len(mem)
    assert row["n_probes"] == len(users)
    assert row["n_hits"] == len(hits)
    assert row["n_false_positives"] == len(fp)
    # a Bloom filter never false-negatives: every member must hit
    assert row["n_hits"] >= row["n_members"]
    nonmem = len(users) - len(mem)
    want_rate = len(fp) / nonmem if nonmem else 0.0
    assert abs(row["fp_rate"] - want_rate) < 1e-12


def test_outlinks_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_outlinks, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True)
    pat = re.compile(r'href="([^"]*)"')
    links, turns, convs = {}, {}, {}
    for _, row in df.iterrows():
        found = pat.findall(row["text"] or "")
        for t in found:
            links[t] = links.get(t, 0) + 1
        for t in set(found):
            turns[t] = turns.get(t, 0) + 1
            convs.setdefault(t, set()).add(row["conv_id"])

    rows = {r["target"]: r for r in
            q_transcripts_outlinks(SF).take_all()}
    assert set(rows) == set(links)
    for t in links:
        assert rows[t]["n_links"] == links[t]
        assert rows[t]["n_turns"] == turns[t]
        assert rows[t]["n_convs"] == len(convs[t])
    assert len(links) > 0
