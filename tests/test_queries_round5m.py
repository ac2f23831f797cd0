"""Independent Python-reference tests for the round-5m wave:
HTML table census, audience-overlap jaccard, WoW contribution.
"""

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_table_stats_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_table_stats, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True)
    ref = {}
    for _, row in df.iterrows():
        t = row["text"] or ""
        nt, nr, nc = (t.count("<table"), t.count("<tr"),
                      t.count("<td"))
        st = ref.setdefault(row["conv_id"], [0, 0, 0, 0])
        st[0] += 1 if nt else 0
        st[1] += nt
        st[2] += nr
        st[3] += nc
    ref = {k: v for k, v in ref.items() if v[1] > 0}
    rows = {r["conv_id"]: r for r in
            q_transcripts_table_stats(SF).take_all()}
    assert set(rows) == set(ref)
    for cid, (tt, nt, nr, nc) in ref.items():
        r = rows[cid]
        assert r["n_table_turns"] == tt
        assert r["n_tables"] == nt
        assert r["n_rows"] == nr
        assert r["n_cells"] == nc
        want = nc / nr if nr else 0.0
        assert abs(r["cells_per_row"] - want) < 1e-12
    assert len(ref) > 0


def test_audience_overlap_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_events_type_audience_overlap,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    sets = {t: set(g["user_id"])
            for t, g in ev.groupby("event_type")}
    types = sorted(sets)
    rows = {(r["type_a"], r["type_b"]): r for r in
            q_events_type_audience_overlap(SF).take_all()}
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            a, b = types[i], types[j]
            c = len(sets[a] & sets[b])
            if c == 0:
                assert (a, b) not in rows
                continue
            un = len(sets[a] | sets[b])
            r = rows[(a, b)]
            assert r["n_shared"] == c
            assert r["n_union"] == un
            assert abs(r["jaccard"] - c / un) < 1e-12


def test_wow_contribution_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_events_wow_contribution,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["wk"] = ev["ts"].dt.to_period("W-SUN").dt.start_time
    weeks = sorted(ev["wk"].unique())
    prev_wk, last_wk = weeks[-3], weeks[-2]
    ref = {}
    for _, row in ev.iterrows():
        if row["wk"] == prev_wk:
            ref.setdefault(row["event_type"], [0, 0])[0] += 1
        elif row["wk"] == last_wk:
            ref.setdefault(row["event_type"], [0, 0])[1] += 1
    td = sum(b - a for a, b in ref.values())
    rows = {r["event_type"]: r for r in
            q_events_wow_contribution(SF).take_all()}
    assert set(rows) == set(ref)
    for et, (a, b) in ref.items():
        r = rows[et]
        assert r["n_prev"] == a
        assert r["n_last"] == b
        assert r["delta"] == b - a
        want = (b - a) / td if td else 0.0
        assert abs(r["delta_share"] - want) < 1e-12
    # shares of the topline delta must sum to 1 when it is nonzero
    if td:
        assert abs(sum(r["delta_share"]
                       for r in rows.values()) - 1.0) < 1e-9


def test_md_links_reference(ray_session):
    import re

    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_md_links, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True)
    pat = re.compile(r"\[[^\]]*\]\(([^)]*)\)")
    links, turns, convs = {}, {}, {}
    for _, row in df.iterrows():
        found = pat.findall(row["text"] or "")
        for t in found:
            links[t] = links.get(t, 0) + 1
        for t in set(found):
            turns[t] = turns.get(t, 0) + 1
            convs.setdefault(t, set()).add(row["conv_id"])
    rows = {r["target"]: r for r in
            q_transcripts_md_links(SF).take_all()}
    assert set(rows) == set(links)
    for t in links:
        assert rows[t]["n_links"] == links[t]
        assert rows[t]["n_turns"] == turns[t]
        assert rows[t]["n_convs"] == len(convs[t])
    assert len(links) > 0
