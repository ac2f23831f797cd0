"""Independent Python-reference tests for the round-5j wave:
cross-conversation ID leakage and the verbosity-by-depth profile.
"""

import re

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _synth_df():
    from ocr_engine_ray.pipelines.queries import transcript_paths

    return pd.concat([pq.read_table(p).to_pandas()
                      for p in transcript_paths(SF)],
                     ignore_index=True)


def test_id_leakage_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_id_leakage,
    )

    df = _synth_df()
    pat = re.compile(r"[0-9]{8,}")
    per = {}
    for _, row in df.iterrows():
        for m in set(pat.findall(row["text"] or "")):
            st = per.setdefault(m, {})
            st[row["conv_id"]] = st.get(row["conv_id"], 0) + 1
    ref = {num: st for num, st in per.items() if len(st) >= 2}
    rows = {r["num"]: r for r in
            q_transcripts_id_leakage(SF).take_all()}
    assert set(rows) == set(ref)
    for num, st in ref.items():
        r = rows[num]
        assert r["n_convs"] == len(st)
        assert r["n_turns"] == sum(st.values())
        assert r["example_conv"] == min(st)
    assert len(ref) > 0


def test_depth_profile_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_depth_profile,
    )

    df = _synth_df()

    def bucket(i):
        return 0 if i < 5 else 1 if i < 10 else 2 if i < 20 else 3

    ref = {}
    for _, row in df.iterrows():
        k = (row["role"], bucket(row["turn_idx"]))
        st = ref.setdefault(k, [0, 0])
        st[0] += 1
        st[1] += len((row["text"] or "").split(" "))
    rows = {(r["role"], r["depth_bucket"]): r for r in
            q_transcripts_depth_profile(SF).take_all()}
    assert set(rows) == set(ref)
    for k, (n, t) in ref.items():
        assert rows[k]["n_turns"] == n
        assert rows[k]["sum_tokens"] == t
        assert abs(rows[k]["mean_tokens"] - t / n) < 1e-9
    # all four depth buckets must be populated for at least one role
    assert len({k[1] for k in ref}) == 4
