"""Planted-corpus robustness tests for the round-5 session waves:
stop-key truncation in conv turn-jaccard, tie/NUL rules in preference
pairs, and Luhn-audit boundary behavior.
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, rows):
    shard = tmp_path / "shards"
    shard.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows),
                   str(shard / "part-0.parquet"))
    return [str(shard / "part-0.parquet")]


def _turn(cid, idx, role, text, secs=0):
    return {"conv_id": cid, "turn_idx": idx, "role": role,
            "text": text, "tool": "",
            "ts": dt.datetime(2025, 1, 1)
            + dt.timedelta(seconds=secs)}


def test_conv_turn_jaccard_stop_key(ray_session, tmp_path,
                                    monkeypatch):
    """A boilerplate line shared by all three convs exceeds the
    (lowered) stop-key cap and contributes NO pairs: the A-B
    intersection count drops to their rare shared lines only, while
    sizes keep the boilerplate — exactly the documented truncation
    semantics."""
    from ocr_engine_ray.pipelines import queries as q

    boiler = "system: you are a helpful assistant"
    rows = []
    for cid, extra in (("conv-a", ["shared one", "shared two",
                                   "only a"]),
                       ("conv-b", ["shared one", "shared two",
                                   "only b"]),
                       ("conv-c", ["c1", "c2", "c3"])):
        rows.append(_turn(cid, 0, "system",
                          boiler.split(": ", 1)[1]))
        for i, t in enumerate(extra):
            rows.append(_turn(cid, i + 1, "user", t, secs=i + 1))
    paths = _write(tmp_path, rows)
    monkeypatch.setattr(q, "transcript_paths",
                        lambda sf_dir, seed=42: paths)
    monkeypatch.setattr(q, "SHINGLE_DF_CAP", 2)

    out = {(r["id_a"], r["id_b"]): r for r in
           q.q_transcripts_conv_turn_jaccard(
               str(tmp_path)).take_all()}
    # boiler line (df=3 > cap 2) truncated: c(A,B) = 2 rare lines,
    # sizes stay 4 and 4 → jaccard = 2 / (4 + 4 - 2) = 1/3
    assert ("conv-a", "conv-b") in out
    assert abs(out[("conv-a", "conv-b")]["jaccard"]
               - round(2 / 6, 6)) < 1e-9
    # conv-c shares ONLY the truncated boilerplate → no pair survives
    assert all("conv-c" not in k for k in out)


def test_preference_pairs_tie_and_nul(ray_session, tmp_path,
                                      monkeypatch):
    """Equal-length responses break ties lexicographically (smaller
    string wins chosen, larger loses to rejected), and a NUL-bearing
    response collapses onto its stripped twin."""
    from ocr_engine_ray.pipelines import queries as q

    rows = []
    # three convs answering the same user prompt
    rows += [_turn("conv-a", 0, "user", "same question"),
             _turn("conv-a", 1, "assistant", "bbbb", secs=1)]
    rows += [_turn("conv-b", 0, "user", "same question"),
             _turn("conv-b", 1, "assistant", "aaaa", secs=1)]
    # NUL variant of conv-b's response — must dedup onto "aaaa"
    rows += [_turn("conv-c", 0, "user", "same question"),
             _turn("conv-c", 1, "assistant", "aa\x00aa", secs=1)]
    paths = _write(tmp_path, rows)
    monkeypatch.setattr(q, "transcript_paths",
                        lambda sf_dir, seed=42: paths)

    out = {r["prompt"]: r for r in
           q.q_transcripts_preference_pairs(
               str(tmp_path)).take_all()}
    r = out["same question"]
    assert r["n_responses"] == 2          # NUL twin collapsed
    assert r["chosen"] == "aaaa"          # tie on length → lexicographic
    assert r["rejected"] == "bbbb"


def test_luhn_audit_boundaries(ray_session, tmp_path, monkeypatch):
    """7-digit runs are ignored, 8+ counted; a multi-number turn
    counts once in n_turns_with_ids; Luhn validity is per-number."""
    from ocr_engine_ray.pipelines import queries as q

    # 79927398713 passes Luhn; 79927398714 fails; 1234567 too short
    rows = [
        _turn("conv-a", 0, "user",
              "ids 79927398713 and 79927398714 here"),
        _turn("conv-a", 1, "user", "short 1234567 only", secs=1),
        _turn("conv-a", 2, "assistant", "no digits at all", secs=2),
    ]
    paths = _write(tmp_path, rows)
    monkeypatch.setattr(q, "transcript_paths",
                        lambda sf_dir, seed=42: paths)

    out = {r["role"]: r for r in
           q.q_transcripts_luhn_audit(str(tmp_path)).take_all()}
    assert set(out) == {"user"}           # assistant had no runs
    r = out["user"]
    assert r["n_turns_with_ids"] == 1     # only turn 0 has 8+ digits
    assert r["n_ids"] == 2
    assert r["n_luhn_valid"] == 1
    assert r["n_distinct_ids"] == 2
    assert r["n_distinct_valid"] == 1
