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
