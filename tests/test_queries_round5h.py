"""Independent Python-reference tests for the round-5h wave:
conv-internal redundancy, markup overhead, log2 value histogram.
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


def test_conv_redundancy_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_conv_redundancy,
    )

    df = _synth_df()
    rows = {r["conv_id"]: r for r in
            q_transcripts_conv_redundancy(SF).take_all()}
    assert set(rows) == set(df["conv_id"])
    for cid, g in df.groupby("conv_id"):
        lines = [f"{r}: " + (t or "").replace("\x00", "")
                 for r, t in zip(g["role"], g["text"])]
        n, nd = len(lines), len(set(lines))
        from collections import Counter
        mx = max(Counter(lines).values())
        r = rows[cid]
        assert r["n_lines"] == n
        assert r["n_distinct"] == nd
        assert r["n_dup_lines"] == n - nd
        assert r["max_multiplicity"] == mx
        assert abs(r["redundancy"] - (1 - nd / n)) < 1e-12
    # planted duplicate turns must surface
    assert any(r["n_dup_lines"] > 0 for r in rows.values())


def test_markup_overhead_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_markup_overhead,
    )

    df = _synth_df()
    tag = re.compile(r"<[^>]*>")
    ref = {}
    for _, row in df.iterrows():
        t = row["text"] or ""
        st = ref.setdefault(row["role"], [0, 0, 0])
        st[0] += 1
        st[1] += len(t)
        st[2] += len(tag.sub("", t))
    rows = {r["role"]: r for r in
            q_transcripts_markup_overhead(SF).take_all()}
    assert set(rows) == set(ref)
    for role, (n, raw, stripped) in ref.items():
        r = rows[role]
        assert r["n_turns"] == n
        assert r["raw_chars"] == raw
        assert r["stripped_chars"] == stripped
        assert abs(r["markup_fraction"] - (1 - stripped / raw)) \
            < 1e-12
    # HTML-bearing roles must show real markup mass
    assert max(r["markup_fraction"] for r in rows.values()) > 0.1


def test_log2_histogram_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_events_log2_histogram,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev = ev[ev["value"].notna()]
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    ref = {}
    for et, c in zip(ev["event_type"], cents):
        b = int(c).bit_length() - 1 if c > 0 else -1
        st = ref.setdefault((et, b), [0, None, None])
        st[0] += 1
        st[1] = c if st[1] is None else min(st[1], c)
        st[2] = c if st[2] is None else max(st[2], c)
    rows = {(r["event_type"], r["bucket"]): r for r in
            q_events_log2_histogram(SF).take_all()}
    assert set(rows) == set(ref)
    for k, (n, lo, hi) in ref.items():
        assert rows[k]["n"] == n
        assert rows[k]["min_cents"] == lo
        assert rows[k]["max_cents"] == hi
        # relative-error property: bucket spans at most one octave
        if k[1] >= 0:
            assert hi < 2 ** (k[1] + 1) and lo >= 2 ** k[1]
