"""Incremental event-time tumbling / hopping window aggregation.

The streaming-window custom operator (SURVEY 'custom operators' path
(c), same family as the shared dedup index in ``stages/dedup.py``):
per-(window, key) counts accumulate in hash-sharded state actors across
any number of ingestion RUNS; a window is finalized — emitted exactly
once and sealed — when the event-time watermark (max ts seen, across
all runs, minus the allowed lateness) passes its end.  Events arriving
for an already-sealed window are counted as dropped, never re-emitted:
the reference semantics of every production stream processor
(Flink/Beam tumbling windows with allowed lateness).  Passing
``slide_us < width_us`` turns the same machinery into hopping
(sliding) windows: each event fans out to its width/slide covering
starts at assignment time and everything downstream — state, seal,
lateness, persistence — is unchanged.

Order-independence inside a run is by construction: ingestion merges
per-batch PARTIAL count grids (order-free integer sums), and the
watermark advances only AFTER the whole run is merged — so Ray Data's
unordered block scheduling cannot change the result.  Across runs the
semantics are arrival-order-dependent exactly where the model says they
must be (a window sealed by run N's watermark is closed to run N+1).

Scale shape: state is one int per in-flight (window, key) pair per
shard — bounded by lateness × key cardinality, not by data volume;
shard count scales it horizontally, and each merge call ships a
pre-aggregated grid, never events.  Merges are idempotent per
caller token (bounded FIFO reply cache), so a retried Ray Data task
cannot double-count — the same side-effecting-stage retry bug the
dedup index guards against.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray


@ray.remote(num_cpus=0)
class WindowShard:
    """One shard of the shared tumbling-window state."""

    _REPLY_CAP = 4096

    def __init__(self) -> None:
        from collections import OrderedDict

        self.open: dict[tuple[int, str], int] = {}
        self.sealed_before: int = -(2 ** 62)  # windows starting earlier are sealed
        self.dropped = 0
        self.replays = 0
        self.replies: OrderedDict[bytes, bool] = OrderedDict()

    def merge(self, token: bytes, wins: list[int], keys: list[str],
              counts: list[int]) -> bool:
        """Merge one batch's (window, key, n) partial grid.  Replayed
        tokens (task retries) are acknowledged without re-merging."""
        if token in self.replies:
            self.replays += 1
            return True
        for w, k, n in zip(wins, keys, counts):
            if w < self.sealed_before:
                self.dropped += n
            else:
                key = (w, k)
                self.open[key] = self.open.get(key, 0) + n
        self.replies[token] = True
        while len(self.replies) > self._REPLY_CAP:
            self.replies.popitem(last=False)
        return True

    def finalize_up_to(self, seal_before: int) -> dict:
        """Seal every window starting before ``seal_before`` (µs): emit
        its rows once and close it to future merges.  Monotonic — a
        smaller watermark than already applied is a no-op."""
        if seal_before <= self.sealed_before:
            return {"wins": [], "keys": [], "counts": []}
        self.sealed_before = seal_before
        out = {"wins": [], "keys": [], "counts": []}
        for (w, k) in sorted(self.open):
            if w < seal_before:
                out["wins"].append(w)
                out["keys"].append(k)
                out["counts"].append(self.open.pop((w, k)))
        return out

    def flush_all(self) -> dict:
        """End-of-stream: seal and emit everything still open."""
        return self.finalize_up_to(2 ** 62)

    def stats(self) -> dict:
        return {"open": len(self.open), "dropped": self.dropped,
                "replays": self.replays,
                "sealed_before": self.sealed_before}

    def snapshot(self) -> dict:
        """Deterministic JSON-able state (open cells sorted)."""
        return {"open": [[w, k, n] for (w, k), n
                         in sorted(self.open.items())],
                "sealed_before": self.sealed_before,
                "dropped": self.dropped}

    def restore(self, state: dict) -> int:
        for w, k, n in state["open"]:
            self.open[(int(w), k)] = int(n)
        self.sealed_before = max(self.sealed_before,
                                 int(state["sealed_before"]))
        self.dropped += int(state["dropped"])
        return len(self.open)


def make_window_index(num_shards: int = 8) -> list:
    """Spawn the shared window-state shards (pass the same list to every
    run that should share one stream)."""
    return [WindowShard.remote() for _ in range(num_shards)]


def _content_token(run_token: bytes, arrays) -> bytes:
    """Idempotency token for one merge call: run nonce × the raw batch
    bytes (ts + key buffers).  Content-keyed on purpose: Ray Data can
    re-execute a stage prefix internally (schema inference runs the
    first batch under a limit=1 plan — observed in 2.49) and retries
    replay whole tasks; both re-deliver IDENTICAL bytes, which this
    token dedupes exactly.  The flip side is documented honestly: two
    byte-identical duplicate blocks within one run (the same file
    ingested twice, byte-for-byte) merge ONCE — an undercount, the
    OPPOSITE direction of the dedup index's conservative missed-drop.
    Shards count replay hits in stats() so that case is observable."""
    tok = hashlib.sha1(run_token)
    for arr in arrays:
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
            else arr
        for buf in a.buffers():
            if buf is not None:
                tok.update(buf)
    return tok.digest()


def _run_watermark(maxima_ds) -> "int | None":
    """Consume an ingestor's per-batch max-ts rows (driving ingestion)
    and return the run's max event ts, or None for an empty run."""
    blocks = [t for t in ray.get(maxima_ds.to_arrow_refs())
              if t.num_rows]
    if not blocks:
        return None
    return pc.max(pa.concat_tables(blocks)
                  .column("batch_max_ts")).as_py()


class _WindowIngestor:
    """Callable map_batches stage: per-batch vectorized (window, key)
    partial counts, hash-routed to their shard.  Emits one tiny row per
    batch carrying the batch's max event ts — consuming the stage both
    drives ingestion and computes the run watermark in the same single
    scan."""

    def __init__(self, shards: list, width_us: int, ts_col: str,
                 key_col: str, slide_us: int | None = None):
        self.shards = shards
        self.width_us = width_us
        self.slide_us = width_us if slide_us is None else slide_us
        if self.width_us % self.slide_us:
            raise ValueError("width_us must be a multiple of slide_us")
        self.ts_col = ts_col
        self.key_col = key_col
        self.run_token = os.urandom(8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ts = pc.cast(pc.cast(batch.column(self.ts_col),
                             pa.timestamp("us")), pa.int64())
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        # numpy floor division, NOT pc.divide: Arrow int division
        # truncates toward zero, which would put pre-1970 events in the
        # wrong window (and off the DuckDB twin's // floor semantics)
        ts_np = ts.to_numpy(zero_copy_only=False)
        k_arr = batch.column(self.key_col)
        if isinstance(k_arr, pa.ChunkedArray):
            k_arr = k_arr.combine_chunks()
        s_hi = (ts_np // self.slide_us) * self.slide_us
        n_hops = self.width_us // self.slide_us
        if n_hops == 1:
            win = pa.array(s_hi, pa.int64())
            keys_exp = k_arr
        else:
            # hopping windows: each event lands in width/slide starts
            # (s_hi, s_hi - slide, ...), all of which still cover ts
            offs = np.arange(n_hops, dtype=np.int64) * self.slide_us
            win = pa.array((s_hi[:, None] - offs[None, :]).ravel(),
                           pa.int64())
            keys_exp = k_arr.take(pa.array(
                np.repeat(np.arange(len(ts_np), dtype=np.int64),
                          n_hops)))
        g = pa.table({"w": win, "k": keys_exp}) \
            .group_by(["w", "k"]).aggregate([("k", "count")])
        wins = g.column("w").to_pylist()
        keys = g.column("k").to_pylist()
        counts = g.column("k_count").to_pylist()
        n_shards = len(self.shards)
        by_shard: dict[int, list[int]] = {}
        for i, (w, k) in enumerate(zip(wins, keys)):
            # stable routing (Python's str hash is process-salted; an
            # unstable hash would split one (window, key) cell across
            # shards and emit it as duplicate rows)
            s = int.from_bytes(hashlib.sha1(
                f"{w}|{k}".encode()).digest()[:4], "big") % n_shards
            by_shard.setdefault(s, []).append(i)
        payload = _content_token(self.run_token, (ts, k_arr))
        futures = []
        for s, idxs in by_shard.items():
            token = hashlib.sha1(payload + bytes([s % 256])).digest()
            futures.append(self.shards[s].merge.remote(
                token, [wins[i] for i in idxs],
                [keys[i] for i in idxs], [counts[i] for i in idxs]))
        ray.get(futures)
        mx = pc.max(ts).as_py()
        return pa.table({"batch_max_ts": pa.array(
            [mx if mx is not None else -(2 ** 62)], pa.int64())})


def ingest_run(ds, shards: list, width_us: int, lateness_us: int,
               ts_col: str = "ts", key_col: str = "event_type",
               slide_us: int | None = None) -> list:
    """Ingest one dataset into the shared window state, then advance the
    watermark to (run max ts − lateness) and seal every window whose
    START falls before it (tumbling windows: a window [s, s+w) is
    sealed once wm ≥ s + w, i.e. s < wm − w + 1 — we use the simpler
    equivalent seal-before = wm − width + 1 boundary arithmetic below).
    Returns the finalized rows of THIS advance as a list of per-shard
    dicts."""
    stage = _WindowIngestor(shards, width_us, ts_col, key_col, slide_us)
    run_max = _run_watermark(
        ds.map_batches(stage, batch_format="pyarrow"))
    if run_max is None:
        return []
    wm = run_max - lateness_us
    # seal windows whose END ≤ watermark: start < wm - width + 1
    seal_before = wm - width_us + 1
    return ray.get([s.finalize_up_to.remote(seal_before)
                    for s in shards])


def flush(shards: list) -> list:
    """End-of-stream flush: seal and emit every still-open window."""
    return ray.get([s.flush_all.remote() for s in shards])


def emitted_table(parts: list) -> pa.Table:
    """Assemble finalize/flush outputs into one (win_start, key, n)
    Arrow table."""
    wins: list[int] = []
    keys: list[str] = []
    counts: list[int] = []
    for p in parts:
        wins.extend(p["wins"])
        keys.extend(p["keys"])
        counts.extend(p["counts"])
    return pa.table({
        "win_start": pa.array(wins, pa.int64()),
        "event_type": pa.array(keys, pa.string()),
        "n_events": pa.array(counts, pa.int64()),
    })


_WINDOW_META = "_WINDOW_META.json"


def _save_shard_snapshots(shards: list, dir_path: str,
                          meta_extra: dict) -> None:
    """Shared snapshot writer for both window kinds: shard JSON blobs
    into a content-named generation dir (``.tmp`` → atomic rename
    each), meta replaced LAST — a crash mid-save leaves the previous
    snapshot fully restorable; superseded generations pruned after
    commit (same discipline as stages/dedup.py:save_dedup_index)."""
    import json
    import shutil

    os.makedirs(dir_path, exist_ok=True)
    blobs = [json.dumps(st, sort_keys=True).encode()
             for st in ray.get([sh.snapshot.remote() for sh in shards])]
    gen = "gen-" + hashlib.sha1(
        b"\x1e".join(blobs)
        + len(shards).to_bytes(4, "big")).hexdigest()[:16]
    gen_dir = os.path.join(dir_path, gen)
    os.makedirs(gen_dir, exist_ok=True)
    for i, blob in enumerate(blobs):
        path = os.path.join(gen_dir, f"shard-{i:04d}.json")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    meta_path = os.path.join(dir_path, _WINDOW_META)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_shards": len(shards), "generation": gen,
                   **meta_extra}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, meta_path)  # commit point
    for name in os.listdir(dir_path):
        if name.startswith("gen-") and name != gen:
            shutil.rmtree(os.path.join(dir_path, name),
                          ignore_errors=True)


def _load_shard_snapshots(dir_path: str, kind: str, spawn) -> list:
    """Shared restore: check the snapshot ``kind`` FIRST (restoring a
    session snapshot into count-window shards would crash deep inside
    ``restore`` with a shape error instead of a clear message), spawn
    fresh shards via ``spawn(meta)``, feed each its blob."""
    import json

    with open(os.path.join(dir_path, _WINDOW_META)) as f:
        meta = json.load(f)
    found = meta.get("kind", "window")
    if found != kind:
        raise ValueError(
            f"snapshot at {dir_path} is kind={found!r}, not {kind!r}")
    gen_dir = os.path.join(dir_path, meta["generation"])
    shards = spawn(meta)
    futures = []
    for i, sh in enumerate(shards):
        with open(os.path.join(gen_dir, f"shard-{i:04d}.json")) as f:
            futures.append(sh.restore.remote(json.load(f)))
    ray.get(futures)
    return shards


def save_window_index(shards: list, dir_path: str) -> None:
    """Snapshot count-window state (open windows, watermark, drop
    counters) so the stream position survives a driver restart.  Call
    between runs, never while an ingestion Dataset is executing."""
    _save_shard_snapshots(shards, dir_path, {"kind": "window"})


def load_window_index(dir_path: str) -> list:
    """Spawn fresh shards and restore a :func:`save_window_index`
    snapshot.  Shard count comes from the meta — the stable-hash
    routing is only valid at the same width."""
    return _load_shard_snapshots(
        dir_path, "window",
        lambda meta: make_window_index(meta["num_shards"]))


@ray.remote(num_cpus=0)
class SessionShard:
    """One shard of incremental SESSION-window state (gap-based): per
    key, a sorted list of open (start, end, count) intervals.  Merging
    is interval union with gap tolerance — associative and commutative,
    so Ray Data's unordered blocks cannot change the result within a
    run.  A session seals once ``end + gap < watermark``: any event
    that could still extend it would have to carry ts ≤ end + gap < wm
    and is late by definition (dropped + counted), which keeps sealing
    and late-drop mutually consistent."""

    _REPLY_CAP = 4096

    def __init__(self, gap_us: int) -> None:
        from collections import OrderedDict

        self.gap = gap_us
        self.open: dict[int, list[list[int]]] = {}  # key -> [[s,e,n]]
        self.wm: int = -(2 ** 62)
        self.dropped = 0
        self.replays = 0
        self.replies: OrderedDict[bytes, bool] = OrderedDict()

    def merge(self, token: bytes, keys: list[int], starts: list[int],
              ends: list[int], counts: list[int]) -> bool:
        import bisect

        if token in self.replies:
            self.replays += 1
            return True
        for k, s, e, n in zip(keys, starts, ends, counts):
            # drop ONLY fragments whose session is already sealed
            # (e + gap < wm) — the same boundary finalize_up_to seals
            # at, so an on-time event inside or adjacent to a still-
            # open session always merges (Flink drops at expiry, not
            # at the raw watermark)
            if e + self.gap < self.wm:
                self.dropped += n
                continue
            ivs = self.open.setdefault(k, [])
            i = bisect.bisect_left(ivs, [s])
            # absorb every neighbor within the gap, left then right
            while i > 0 and s - ivs[i - 1][1] <= self.gap:
                prev = ivs.pop(i - 1)
                i -= 1
                s, e, n = prev[0], max(e, prev[1]), n + prev[2]
            while i < len(ivs) and ivs[i][0] - e <= self.gap:
                nxt = ivs.pop(i)
                s, e, n = min(s, nxt[0]), max(e, nxt[1]), n + nxt[2]
            ivs.insert(i, [s, e, n])
        self.replies[token] = True
        while len(self.replies) > self._REPLY_CAP:
            self.replies.popitem(last=False)
        return True

    def finalize_up_to(self, wm: int) -> dict:
        if wm <= self.wm:
            return {"keys": [], "starts": [], "ends": [], "counts": []}
        self.wm = wm
        out = {"keys": [], "starts": [], "ends": [], "counts": []}
        for k in sorted(self.open):
            keep = []
            for s, e, n in self.open[k]:
                if e + self.gap < wm:
                    out["keys"].append(k)
                    out["starts"].append(s)
                    out["ends"].append(e)
                    out["counts"].append(n)
                else:
                    keep.append([s, e, n])
            if keep:
                self.open[k] = keep
            else:
                del self.open[k]
        return out

    def flush_all(self) -> dict:
        return self.finalize_up_to(2 ** 62)

    def stats(self) -> dict:
        return {"open": sum(len(v) for v in self.open.values()),
                "dropped": self.dropped, "replays": self.replays,
                "wm": self.wm}

    def get_gap(self) -> int:
        return self.gap

    def snapshot(self) -> dict:
        """Deterministic JSON-able state (keys and intervals sorted)."""
        return {"gap": self.gap,
                "open": [[k, self.open[k]] for k in sorted(self.open)],
                "wm": self.wm, "dropped": self.dropped}

    def restore(self, state: dict) -> int:
        for k, ivs in state["open"]:
            self.open[int(k)] = [[int(a), int(b), int(c)]
                                 for a, b, c in ivs]
        self.wm = max(self.wm, int(state["wm"]))
        self.dropped += int(state["dropped"])
        return len(self.open)


def make_session_index(gap_us: int, num_shards: int = 8) -> list:
    """Spawn the shared session-window shards for one stream."""
    return [SessionShard.remote(gap_us) for _ in range(num_shards)]


class _SessionIngestor:
    """Per-batch vectorized session partials: sort by (key, ts), cut at
    key changes or gaps (the sessionize idiom), ship (key, start, end,
    n) triples to their key's shard.  Same raw-buffer idempotency token
    and max-ts watermark row as the window ingestor."""

    def __init__(self, shards: list, gap_us: int, ts_col: str,
                 key_col: str):
        self.shards = shards
        self.gap_us = gap_us
        self.ts_col = ts_col
        self.key_col = key_col
        self.run_token = os.urandom(8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        b = batch.sort_by([(self.key_col, "ascending"),
                           (self.ts_col, "ascending")])
        ts_arr = pc.cast(pc.cast(b.column(self.ts_col),
                                 pa.timestamp("us")), pa.int64())
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        ts = ts_arr.to_numpy(zero_copy_only=False)
        keys = b.column(self.key_col).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        n = len(ts)
        if n:
            brk = np.flatnonzero((keys[1:] != keys[:-1])
                                 | (np.diff(ts) > self.gap_us)) + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk - 1, [n - 1]))
            t_keys = keys[starts]
            t_s = ts[starts]
            t_e = ts[ends]
            t_n = (ends - starts + 1)
        else:
            t_keys = t_s = t_e = t_n = np.array([], dtype=np.int64)

        n_shards = len(self.shards)
        by_shard: dict[int, list[int]] = {}
        for i, k in enumerate(t_keys):
            s = int.from_bytes(hashlib.sha1(
                str(k).encode()).digest()[:4], "big") % n_shards
            by_shard.setdefault(s, []).append(i)
        payload = _content_token(self.run_token,
                                 (ts_arr, b.column(self.key_col)))
        futures = []
        for s, idxs in by_shard.items():
            token = hashlib.sha1(payload + bytes([s % 256])).digest()
            futures.append(self.shards[s].merge.remote(
                token, [int(t_keys[i]) for i in idxs],
                [int(t_s[i]) for i in idxs],
                [int(t_e[i]) for i in idxs],
                [int(t_n[i]) for i in idxs]))
        ray.get(futures)
        mx = int(ts.max()) if n else -(2 ** 62)
        return pa.table({"batch_max_ts": pa.array([mx], pa.int64())})


def ingest_session_run(ds, shards: list, lateness_us: int,
                       ts_col: str = "ts",
                       key_col: str = "user_id") -> list:
    """Ingest one dataset into the shared session state, advance the
    watermark to (run max ts − lateness), and return the sessions that
    sealed on this advance (end + gap < watermark).  The gap comes
    from the shards themselves — a caller-supplied gap could silently
    cut batches at one gap while the shards merge at another."""
    gap_us = ray.get(shards[0].get_gap.remote())
    stage = _SessionIngestor(shards, gap_us, ts_col, key_col)
    run_max = _run_watermark(
        ds.map_batches(stage, batch_format="pyarrow"))
    if run_max is None:
        return []
    return ray.get([s.finalize_up_to.remote(run_max - lateness_us)
                    for s in shards])


def flush_sessions(shards: list) -> list:
    return ray.get([s.flush_all.remote() for s in shards])


def session_table(parts: list) -> pa.Table:
    """Assemble session finalize/flush outputs into one
    (user_id, session_start, session_end, n_events) Arrow table."""
    keys: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    counts: list[int] = []
    for p in parts:
        keys.extend(p["keys"])
        starts.extend(p["starts"])
        ends.extend(p["ends"])
        counts.extend(p["counts"])
    return pa.table({
        "user_id": pa.array(keys, pa.int64()),
        "session_start": pa.array(starts, pa.int64()),
        "session_end": pa.array(ends, pa.int64()),
        "n_events": pa.array(counts, pa.int64()),
    })


def save_session_index(shards: list, dir_path: str,
                       gap_us: int) -> None:
    """Session-window twin of :func:`save_window_index`."""
    _save_shard_snapshots(shards, dir_path,
                          {"kind": "session", "gap_us": gap_us})


def load_session_index(dir_path: str) -> list:
    """Spawn fresh session shards and restore a
    :func:`save_session_index` snapshot (gap comes from the meta;
    routing is only stable at the same shard count)."""
    return _load_shard_snapshots(
        dir_path, "session",
        lambda meta: make_session_index(meta["gap_us"],
                                        meta["num_shards"]))
