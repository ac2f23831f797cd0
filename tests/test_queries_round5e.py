"""Independent Python-reference tests for the round-5e wave:
HTML tag census, n-gram loop audit, and the triplet-margin audit.
"""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _synth_df():
    from ocr_engine_ray.pipelines.queries import transcript_paths

    return pd.concat([pq.read_table(p).to_pandas()
                      for p in transcript_paths(SF)],
                     ignore_index=True)


def test_html_tags_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_transcripts_html_tags

    df = _synth_df()
    pat = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)")
    occ, turns, convs = {}, {}, {}
    for _, row in df.iterrows():
        found = pat.findall(row["text"] or "")
        for t in found:
            occ[t] = occ.get(t, 0) + 1
        for t in set(found):
            turns[t] = turns.get(t, 0) + 1
            convs.setdefault(t, set()).add(row["conv_id"])
    rows = {r["tag"]: r for r in
            q_transcripts_html_tags(SF).take_all()}
    assert set(rows) == set(occ)
    for t in occ:
        assert rows[t]["n_tags"] == occ[t]
        assert rows[t]["n_turns"] == turns[t]
        assert rows[t]["n_convs"] == len(convs[t])
    # the boilerplate chrome the stripper removes must be visible
    assert "script" in rows and "nav" in rows


def test_ngram_loop_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_transcripts_ngram_loop

    df = _synth_df()
    ref = {}
    for _, row in df.iterrows():
        toks = (row["text"] or "").split(" ")
        cnt = {}
        for i in range(len(toks) - 2):
            g = " ".join(toks[i:i + 3])
            cnt[g] = cnt.get(g, 0) + 1
        mx = max(cnt.values()) if cnt else 0
        st = ref.setdefault(row["role"], [0, 0, 0])
        st[0] += 1
        st[1] += 1 if mx >= 3 else 0
        st[2] = max(st[2], mx)
    rows = {r["role"]: r for r in
            q_transcripts_ngram_loop(SF).take_all()}
    assert set(rows) == set(ref)
    for role, (n, nl, mx) in ref.items():
        assert rows[role]["n_turns"] == n
        assert rows[role]["n_looping_turns"] == nl
        assert rows[role]["max_repeat"] == mx
    assert any(r["max_repeat"] >= 3 for r in rows.values())


def test_triplet_margin_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_embeddings_triplet_margin,
    )

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
    rows = {r["vec_id"]: r for r in
            q_embeddings_triplet_margin(SF).take_all()}
    anchors = [i for i, v in enumerate(ids) if v % 10 == 0]
    assert set(rows) == {int(ids[i]) for i in anchors}
    for i in anchors:
        d2 = ((q - q[i]) ** 2).sum(axis=1)
        best_p, best_n = None, None
        for j in range(len(ids)):
            if j == i:
                continue
            key = (d2[j], ids[j])
            if lab[j] == lab[i]:
                if best_p is None or key < best_p:
                    best_p = key
            else:
                if best_n is None or key < best_n:
                    best_n = key
        r = rows[int(ids[i])]
        assert r["pos_id"] == best_p[1]
        assert r["neg_id"] == best_n[1]
        assert r["d2_pos"] == best_p[0]
        assert r["d2_neg"] == best_n[0]
        assert r["margin"] == best_n[0] - best_p[0]
        assert r["violation"] == (1 if best_n[0] < best_p[0] else 0)
    # the labeled corpus must produce at least one clean triplet
    assert any(r["violation"] == 0 for r in rows.values())
