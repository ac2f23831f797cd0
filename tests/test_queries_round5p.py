"""Independent Python-reference tests for the round-5p wave:
repeated-line boilerplate mining and the Fisher class-separation
ratio.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_repeated_lines_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_repeated_lines, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True)
    per = {}
    for _, row in df.iterrows():
        line = f"{row['role']}: " \
            + (row["text"] or "").replace("\x00", "")
        st = per.setdefault(line, [set(), 0, row["role"]])
        st[0].add(row["conv_id"])
        st[1] += 1
    ranked = sorted(
        ((len(st[0]), st[1], line, st[2])
         for line, st in per.items()),
        key=lambda x: (-x[0], -x[1], x[2]))[:20]
    rows = sorted(q_transcripts_repeated_lines(SF).take_all(),
                  key=lambda r: r["rank"])
    assert [(r["n_convs"], r["n_turns"], r["line"], r["role"])
            for r in rows] == ranked
    # boilerplate exists: the top line spans many conversations
    assert rows[0]["n_convs"] > 1


def test_fisher_ratio_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_embeddings_fisher_ratio,
    )

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["label", "embedding"]).to_pandas()
    mat = np.array(emb["embedding"].tolist(), np.float64)
    s = mat * 1048576.0
    a = np.abs(s)
    fa = np.floor(a)
    q = (np.sign(s) * np.where(a - fa >= 0.5, fa + 1, fa)) \
        .astype(np.float64)
    lab = emb["label"].to_numpy()
    # classic trace-scatter reference (float, so compare loosely)
    mu = q.mean(axis=0)
    within = 0.0
    between = 0.0
    for lbl in np.unique(lab):
        sub = q[lab == lbl]
        m = sub.mean(axis=0)
        within += ((sub - m) ** 2).sum()
        between += len(sub) * ((m - mu) ** 2).sum()
    row = q_embeddings_fisher_ratio(SF).take_all()[0]
    assert row["n_vectors"] == len(q)
    assert row["n_labels"] == len(np.unique(lab))
    assert abs(row["within_scatter"] - within) / within < 1e-9
    assert abs(row["between_scatter"] - between) / between < 1e-6
    assert abs(row["fisher_ratio"] - between / within) < 1e-9
    assert row["fisher_ratio"] > 0
