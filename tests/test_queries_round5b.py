"""Python-reference semantic tests for the round-5b transcripts wave:
preference-pair construction, Luhn identifier audit, encoding-hygiene
audit, and the tool-transition matrix.  Bit-exactness vs DuckDB is
pinned by the contract sweep; these pin SEMANTICS against independent
pandas/Python references on the sf0.001 synthetic corpus.
"""

import re

import pandas as pd
import pyarrow.parquet as pq


def _synth_df():
    from ocr_engine_ray.pipelines.queries import transcript_paths

    paths = transcript_paths("/root/testdata/sf0.001")
    return pd.concat([pq.read_table(p).to_pandas() for p in paths],
                     ignore_index=True)


def _ordered(df):
    return df.sort_values(["conv_id", "turn_idx", "ts"],
                          kind="stable")


def test_preference_pairs_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_preference_pairs,
    )

    df = _ordered(_synth_df())
    # reference: nearest preceding user turn keys each assistant turn
    cand = {}
    for _, g in df.groupby("conv_id", sort=False):
        last_user = None
        for _, row in g.iterrows():
            t = (row["text"] or "").replace("\x00", "")
            if row["role"] == "user":
                last_user = t
            elif row["role"] == "assistant" and last_user is not None:
                cand.setdefault(last_user, set()).add(t)
    ref = {}
    for p, rs in cand.items():
        if len(rs) >= 2:
            order = sorted(rs, key=lambda r: (-len(r), r))
            ref[p] = (len(rs), order[0], order[-1])

    rows = {r["prompt"]: r for r in q_transcripts_preference_pairs(
        "/root/testdata/sf0.001").take_all()}
    assert set(rows) == set(ref)
    for p, (n, chosen, rejected) in ref.items():
        assert rows[p]["n_responses"] == n
        assert rows[p]["chosen"] == chosen
        assert rows[p]["rejected"] == rejected
    # the retry-storm corpus must actually produce pairs
    assert len(ref) > 0
    # chosen is never shorter than rejected by construction
    for r in rows.values():
        assert len(r["chosen"]) >= len(r["rejected"])


def test_luhn_audit_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        _luhn_ok, q_transcripts_luhn_audit,
    )

    # pinned Luhn vectors
    assert _luhn_ok("79927398713")
    assert not _luhn_ok("79927398714")
    assert _luhn_ok("4532015112830366")

    df = _synth_df()
    pat = re.compile(r"[0-9]{8,}")
    ref = {}
    for _, row in df.iterrows():
        nums = pat.findall(row["text"] or "")
        if not nums:
            continue
        st = ref.setdefault(row["role"],
                            {"turns": 0, "ids": 0, "valid": 0,
                             "dist": set(), "dist_ok": set()})
        st["turns"] += 1
        for m in nums:
            st["ids"] += 1
            st["dist"].add(m)
            if _luhn_ok(m):
                st["valid"] += 1
                st["dist_ok"].add(m)

    rows = {r["role"]: r for r in q_transcripts_luhn_audit(
        "/root/testdata/sf0.001").take_all()}
    assert set(rows) == set(ref)
    for role, st in ref.items():
        r = rows[role]
        assert r["n_turns_with_ids"] == st["turns"]
        assert r["n_ids"] == st["ids"]
        assert r["n_luhn_valid"] == st["valid"]
        assert r["n_distinct_ids"] == len(st["dist"])
        assert r["n_distinct_valid"] == len(st["dist_ok"])
    assert sum(st["ids"] for st in ref.values()) > 0


def test_encoding_audit_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_encoding_audit,
    )

    df = _synth_df()
    ctrl = set(chr(c) for c in list(range(0x00, 0x09))
               + [0x0B, 0x0C] + list(range(0x0E, 0x20)) + [0x7F])
    ref = {}
    for _, row in df.iterrows():
        t = row["text"] or ""
        na = sum(1 for ch in t if ord(ch) > 0x7F)
        ct = sum(1 for ch in t if ch in ctrl)
        rp = t.count("�")
        st = ref.setdefault(row["role"],
                            [0, 0, 0, 0, 0, 0])
        st[0] += 1
        st[1] += 1 if na else 0
        st[2] += na
        st[3] += 1 if ct else 0
        st[4] += ct
        st[5] += rp

    rows = {r["role"]: r for r in q_transcripts_encoding_audit(
        "/root/testdata/sf0.001").take_all()}
    assert set(rows) == set(ref)
    for role, st in ref.items():
        r = rows[role]
        assert r["n_turns"] == st[0]
        assert r["n_nonascii_turns"] == st[1]
        assert r["n_nonascii_chars"] == st[2]
        assert r["n_ctrl_turns"] == st[3]
        assert r["n_ctrl_chars"] == st[4]
        assert r["n_replacement_chars"] == st[5]
    # corpus plants non-ascii text → audit must be non-vacuous
    assert sum(st[2] for st in ref.values()) > 0


def test_tool_transitions_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_tool_transitions,
    )

    df = _ordered(_synth_df())
    ref = {}
    for _, g in df.groupby("conv_id", sort=False):
        seq = [row["tool"] for _, row in g.iterrows()
               if row["role"] == "tool" and (row["tool"] or "") != ""]
        for a, b in zip(seq, seq[1:]):
            ref[(a, b)] = ref.get((a, b), 0) + 1
    out = q_transcripts_tool_transitions("/root/testdata/sf0.001")
    rows = {(r["prev_tool"], r["next_tool"]): r
            for r in out.to_pylist()}
    assert set(rows) == set(ref)
    totals = {}
    for (a, _), n in ref.items():
        totals[a] = totals.get(a, 0) + n
    for k, n in ref.items():
        assert rows[k]["n_trans"] == n
        assert abs(rows[k]["p"] - n / totals[k[0]]) < 1e-12
    assert len(ref) > 1
