"""Streaming tumbling-window stage: seal/late-drop semantics across
runs, idempotent merges under task-retry replay."""

import pyarrow as pa
import ray
import ray.data as rd

from ocr_engine_ray.stages.window import (WindowShard, emitted_table,
                                          flush, ingest_run,
                                          make_window_index)


def _events(ts_us, types=None):
    n = len(ts_us)
    return rd.from_arrow(pa.table({
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "event_type": pa.array(types or ["view"] * n, pa.string()),
    }))


def _rows(parts):
    t = emitted_table(parts)
    return {(r["win_start"], r["event_type"]): r["n_events"]
            for r in t.to_pylist()}


def test_window_seal_latedrop_and_merge_across_runs(ray_session):
    shards = make_window_index(2)
    try:
        # run 1: wm = 25-5 = 20 -> windows [0,10) and [10,20) seal;
        # [20,30) stays open
        got1 = _rows(ingest_run(_events([3, 12, 25]), shards,
                                width_us=10, lateness_us=5))
        assert got1 == {(0, "view"): 1, (10, "view"): 1}
        # run 2: ts=5 falls in the SEALED [0,10) window -> dropped;
        # ts=22 merges into the open [20,30); wm = 40-5 = 35 seals it
        got2 = _rows(ingest_run(_events([5, 22, 40]), shards,
                                width_us=10, lateness_us=5))
        assert got2 == {(20, "view"): 2}
        # flush: only [40,50) is left
        assert _rows(flush(shards)) == {(40, "view"): 1}
        stats = ray.get([s.stats.remote() for s in shards])
        assert sum(s["dropped"] for s in stats) == 1
        assert sum(s["open"] for s in stats) == 0
    finally:
        for s in shards:
            ray.kill(s)


def test_window_keys_stay_separate_and_watermark_monotonic(ray_session):
    shards = make_window_index(3)
    try:
        got = _rows(ingest_run(
            _events([1, 2, 15], ["a", "b", "a"]), shards,
            width_us=10, lateness_us=0))
        assert got == {(0, "a"): 1, (0, "b"): 1}
        # a LOWER-watermark run (max ts 4) must not re-open or re-emit
        got2 = _rows(ingest_run(_events([4], ["a"]), shards,
                                width_us=10, lateness_us=0))
        assert got2 == {}
        stats = ray.get([s.stats.remote() for s in shards])
        assert sum(s["dropped"] for s in stats) == 1
        assert _rows(flush(shards)) == {(10, "a"): 1}
    finally:
        for s in shards:
            ray.kill(s)


def test_window_merge_replay_is_idempotent(ray_session):
    shard = WindowShard.remote()
    try:
        tok = b"tok-1"
        ray.get(shard.merge.remote(tok, [0], ["view"], [7]))
        ray.get(shard.merge.remote(tok, [0], ["view"], [7]))  # retry
        out = ray.get(shard.flush_all.remote())
        assert out["counts"] == [7]          # not 14
    finally:
        ray.kill(shard)


def test_window_snapshot_survives_restart(ray_session, tmp_path):
    """Kill the shards mid-stream, restore the snapshot, continue the
    stream: open windows, watermark, and drop counters all persist."""
    from ocr_engine_ray.stages.window import (load_window_index,
                                              save_window_index)

    shards = make_window_index(2)
    got1 = _rows(ingest_run(_events([3, 12, 25]), shards,
                            width_us=10, lateness_us=5))
    assert got1 == {(0, "view"): 1, (10, "view"): 1}
    save_window_index(shards, str(tmp_path / "win"))
    for s in shards:
        ray.kill(s)                      # driver "restart"

    shards2 = load_window_index(str(tmp_path / "win"))
    try:
        # sealed [0,10) must STAY sealed (ts=5 drops), open [20,30)
        # must still hold its count from before the restart
        got2 = _rows(ingest_run(_events([5, 22, 40]), shards2,
                                width_us=10, lateness_us=5))
        assert got2 == {(20, "view"): 2}
        stats = ray.get([s.stats.remote() for s in shards2])
        assert sum(s["dropped"] for s in stats) == 1
    finally:
        for s in shards2:
            ray.kill(s)


def test_window_floors_negative_timestamps(ray_session):
    """Pre-1970 events floor into the window BELOW zero (Flink
    semantics), not the truncated-toward-zero window."""
    shards = make_window_index(1)
    try:
        sealed = _rows(ingest_run(_events([-1, 1]), shards,
                                  width_us=10, lateness_us=0))
        rest = _rows(flush(shards))
        assert {**sealed, **rest} == {(-10, "view"): 1, (0, "view"): 1}
    finally:
        for s in shards:
            ray.kill(s)


def test_hopping_windows_fan_out_and_seal(ray_session):
    """width=10, slide=5: an event at ts=7 counts in windows [0,10)
    and [5,15); sealing uses the window WIDTH, so both emit once the
    watermark passes their ends."""
    from ocr_engine_ray.stages.window import ingest_run as run

    shards = make_window_index(2)
    try:
        sealed = _rows(run(_events([7, 30]), shards, width_us=10,
                           lateness_us=0, slide_us=5))
        # wm = 30 -> seal_before = 21: windows 0, 5 sealed (the event
        # at 30 sits in open windows 25 and 30)
        assert sealed == {(0, "view"): 1, (5, "view"): 1}
        rest = _rows(flush(shards))
        assert rest == {(25, "view"): 1, (30, "view"): 1}
    finally:
        for s in shards:
            ray.kill(s)


def test_session_interval_merge_is_order_independent(ray_session):
    """Triples merged in any order produce the same session (interval
    union with gap tolerance is associative/commutative)."""
    from ocr_engine_ray.stages.window import SessionShard

    a = SessionShard.remote(gap_us=10)
    b = SessionShard.remote(gap_us=10)
    try:
        # same three fragments, opposite arrival order
        frags = [(1, 0, 5, 2), (1, 12, 20, 3), (1, 31, 35, 1)]
        for i, f in enumerate(frags):
            ray.get(a.merge.remote(f"a{i}".encode(),
                                   [f[0]], [f[1]], [f[2]], [f[3]]))
        for i, f in enumerate(reversed(frags)):
            ray.get(b.merge.remote(f"b{i}".encode(),
                                   [f[0]], [f[1]], [f[2]], [f[3]]))
        out_a = ray.get(a.flush_all.remote())
        out_b = ray.get(b.flush_all.remote())
        # 0-5 and 12-20 merge (gap 7 <= 10); 31-35 stays apart (11 > 10)
        assert out_a == out_b
        assert out_a["starts"] == [0, 31] and out_a["ends"] == [20, 35]
        assert out_a["counts"] == [5, 1]
    finally:
        ray.kill(a)
        ray.kill(b)


def test_session_runs_seal_and_drop(ray_session):
    """Sessions seal once end + gap < watermark; later events below the
    watermark drop; an open session keeps absorbing on-time events."""
    from ocr_engine_ray.stages.window import (flush_sessions,
                                              ingest_session_run,
                                              make_session_index,
                                              session_table)

    def ev(ts):
        return rd.from_arrow(pa.table({
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }))

    shards = make_session_index(gap_us=100, num_shards=2)
    try:
        # run 1: one session [0,10], wm = 10 -> 10+100 >= 10 stays open
        sealed = session_table(ingest_session_run(
            ev([0, 10]), shards, lateness_us=0))
        assert sealed.num_rows == 0
        # run 2: ts=500 starts a NEW session (gap 490 > 100) and its
        # watermark seals the first one with both events intact
        sealed = session_table(ingest_session_run(
            ev([500]), shards, lateness_us=0)).to_pylist()
        assert sealed == [{"user_id": 1, "session_start": 0,
                           "session_end": 10, "n_events": 2}]
        # run 3: ts=5 is below the watermark -> dropped, not revived
        session_table(ingest_session_run(
            ev([5, 510]), shards, lateness_us=0))
        rest = session_table(flush_sessions(shards)).to_pylist()
        assert rest == [{"user_id": 1, "session_start": 500,
                         "session_end": 510, "n_events": 2}]
        stats = ray.get([s.stats.remote() for s in shards])
        assert sum(s["dropped"] for s in stats) == 1
    finally:
        for s in shards:
            ray.kill(s)


def test_session_snapshot_survives_restart(ray_session, tmp_path):
    from ocr_engine_ray.stages.window import (flush_sessions,
                                              ingest_session_run,
                                              load_session_index,
                                              make_session_index,
                                              save_session_index,
                                              session_table)

    def ev(ts):
        return rd.from_arrow(pa.table({
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }))

    shards = make_session_index(gap_us=100, num_shards=2)
    ingest_session_run(ev([0, 10]), shards, lateness_us=0)
    save_session_index(shards, str(tmp_path / "sess"), gap_us=100)
    for s in shards:
        ray.kill(s)

    shards2 = load_session_index(str(tmp_path / "sess"))
    try:
        # the open session [0,10] must still absorb an on-time event
        # within the gap after the restart
        ingest_session_run(ev([105]), shards2, lateness_us=0)
        rest = session_table(flush_sessions(shards2)).to_pylist()
        assert rest == [{"user_id": 1, "session_start": 0,
                         "session_end": 105, "n_events": 3}]
    finally:
        for s in shards2:
            ray.kill(s)


def test_session_ontime_event_inside_open_session_merges(ray_session):
    """An event BELOW the raw watermark but within gap of a still-open
    session must merge, not drop (drop only at session expiry)."""
    from ocr_engine_ray.stages.window import (flush_sessions,
                                              ingest_session_run,
                                              make_session_index,
                                              session_table)

    def ev(ts):
        return rd.from_arrow(pa.table({
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }))

    shards = make_session_index(gap_us=100, num_shards=2)
    try:
        ingest_session_run(ev([0, 10, 60]), shards, lateness_us=0)
        # wm = 60; ts=50 < wm but inside the open [0,60] session
        ingest_session_run(ev([50]), shards, lateness_us=0)
        rest = session_table(flush_sessions(shards)).to_pylist()
        assert rest == [{"user_id": 1, "session_start": 0,
                         "session_end": 60, "n_events": 4}]
        stats = ray.get([s.stats.remote() for s in shards])
        assert sum(s["dropped"] for s in stats) == 0
    finally:
        for s in shards:
            ray.kill(s)


def test_snapshot_kind_mismatch_is_rejected(ray_session, tmp_path):
    import pytest

    from ocr_engine_ray.stages.window import (load_session_index,
                                              make_window_index,
                                              save_window_index)

    shards = make_window_index(1)
    try:
        save_window_index(shards, str(tmp_path / "w"))
    finally:
        for s in shards:
            ray.kill(s)
    with pytest.raises(ValueError, match="kind"):
        load_session_index(str(tmp_path / "w"))
