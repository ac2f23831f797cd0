"""Independent Python-reference tests for the round-5g wave:
extractive top-sentence selection, 1-NN label evaluation, and
numeric-token density.
"""

import math
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_extractive_topsent_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_documents_extractive_topsent,
    )

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    split = re.compile(r"[.!?]+")
    sents = {}   # doc_id -> [(raw_idx, sent)]
    for r in docs.itertuples():
        pieces = split.split(r.text or "")
        sents[r.doc_id] = [
            (i + 1, p.strip(" ")) for i, p in enumerate(pieces)
            if p.strip(" ") != ""]
    df = {}
    for did, ss in sents.items():
        toks = set()
        for _, s in ss:
            toks.update(s.split(" "))
        for t in toks:
            df[t] = df.get(t, 0) + 1
    N = len(docs)

    def w(t):
        x = math.log(np.float64(N) / np.float64(df[t])) * 1e6
        a = abs(x)
        fa = math.floor(a)
        r = fa + 1 if a - fa >= 0.5 else fa
        return int(math.copysign(r, x))

    rows = {}
    for r in q_documents_extractive_topsent(SF).take_all():
        rows.setdefault(r["doc_id"], []).append(r)
    for did, ss in sents.items():
        if not ss:
            assert did not in rows
            continue
        scored = sorted(
            ((sum(w(t) for t in s.split(" ")), idx)
             for idx, s in ss),
            key=lambda x: (-x[0], x[1]))[:2]
        got = sorted(rows[did], key=lambda r: r["rank"])
        assert [(r["score"], r["sent_idx"]) for r in got] == scored


def test_knn_eval_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_embeddings_knn_eval

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    mat = np.array(emb["embedding"].tolist(), np.float64)
    s = mat * 1048576.0
    a = np.abs(s)
    fa = np.floor(a)
    q = (np.sign(s) * np.where(a - fa >= 0.5, fa + 1, fa)) \
        .astype(np.int64)
    ids = emb["vec_id"].to_numpy()
    lab = emb["label"].to_numpy()
    ref = {}
    for i in range(len(ids)):
        if ids[i] % 10 != 0:
            continue
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        best = None
        for j in range(len(ids)):
            if j == i:
                continue
            key = (d2[j], ids[j])
            if best is None or key < best[0:2]:
                best = (d2[j], ids[j], lab[j])
        st = ref.setdefault(int(lab[i]), [0, 0])
        st[0] += 1
        st[1] += 1 if best[2] == lab[i] else 0
    rows = {r["label"]: r for r in
            q_embeddings_knn_eval(SF).take_all()}
    assert set(rows) == set(ref)
    for lbl, (n, c) in ref.items():
        assert rows[lbl]["n_anchors"] == n
        assert rows[lbl]["n_correct"] == c
        assert abs(rows[lbl]["accuracy"] - c / n) < 1e-12


def test_number_density_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_number_density, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True)
    num = re.compile(r"^\$?[0-9][0-9.,%]*$")
    amt = re.compile(r"[\d,]+\.\d{2}")
    ref = {}
    for _, row in df.iterrows():
        t = row["text"] or ""
        toks = t.split(" ")
        st = ref.setdefault(row["role"], [0, 0, 0, 0])
        st[0] += 1
        st[1] += len(toks)
        st[2] += sum(1 for x in toks if num.match(x))
        st[3] += 1 if amt.search(t) else 0
    rows = {r["role"]: r for r in
            q_transcripts_number_density(SF).take_all()}
    assert set(rows) == set(ref)
    for role, (n, tk, nm, am) in ref.items():
        r = rows[role]
        assert r["n_turns"] == n
        assert r["n_tokens"] == tk
        assert r["n_numeric_tokens"] == nm
        assert r["n_amount_turns"] == am
        assert abs(r["numeric_density"] - nm / tk) < 1e-12
    assert sum(st[2] for st in ref.values()) > 0
