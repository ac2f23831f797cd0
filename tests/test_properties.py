"""Property-based tests (hypothesis) for the deterministic core:
robustness on arbitrary inputs, roundtrips, order-insensitivity."""

from datetime import date

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_engine_ray.core.extract import extract_turn
from ocr_engine_ray.core.dates import find_date
from ocr_engine_ray.core.html_extract import extract_html
from ocr_engine_ray.core.money import cents_to_str, parse_money_cents
from ocr_engine_ray.core.textnorm import normalize_text

AS_OF = date(2026, 1, 1)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-10**12, max_value=10**12))
def test_money_roundtrip(cents):
    assert parse_money_cents(cents_to_str(cents)) == cents


@settings(max_examples=100, deadline=None)
@given(st.dates(min_value=date(1990, 1, 1), max_value=date(2045, 12, 28)))
def test_date_unambiguous_renders_roundtrip(d):
    for render in (d.strftime("%Y-%m-%d"), d.strftime("%Y%m%d"),
                   d.strftime("%d %b %Y")):
        got, span = find_date(f"Invoice Date: {render} end", AS_OF)
        assert got == d, render
        assert span is not None


@settings(max_examples=100, deadline=None)
@given(st.dates(min_value=date(2000, 1, 13), max_value=date(2045, 12, 28))
       .filter(lambda d: d.day > 12))
def test_date_dmy_slash_roundtrip(d):
    # day > 12 makes d/m/Y unambiguous under the DMY→MDY preference
    got, _ = find_date(f"date: {d.strftime('%d/%m/%Y')}", AS_OF)
    assert got == d


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=800))
def test_extract_turn_total_function(s):
    """extract_turn never raises, never returns None, and its spans
    always index into extracted_text."""
    rec = extract_turn(s, AS_OF)
    assert rec.extract_error == "" or rec.extracted_text == ""
    for start, end, _kind in rec.spans:
        assert 0 <= start <= end <= len(rec.extracted_text)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=800))
def test_html_extract_never_raises(s):
    out = extract_html(s)
    assert isinstance(out, str)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.text(min_size=1, max_size=20),
                          st.integers(0, 1000), st.text(max_size=50)),
                min_size=1, max_size=30, unique=True),
       st.randoms(use_true_random=False))
def test_checksum_order_insensitive(rows, rnd):
    from ocr_engine_ray.state.lineage import table_checksum

    cols = list(zip(*rows))
    t1 = pa.table({"conv_id": pa.array(cols[0], pa.string()),
                   "turn_idx": pa.array(cols[1], pa.int32()),
                   "extracted_text": pa.array(cols[2], pa.string())})
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    cols2 = list(zip(*shuffled))
    t2 = pa.table({"conv_id": pa.array(cols2[0], pa.string()),
                   "turn_idx": pa.array(cols2[1], pa.int32()),
                   "extracted_text": pa.array(cols2[2], pa.string())})
    key = ["conv_id", "turn_idx", "extracted_text"]
    assert table_checksum(t1, key) == table_checksum(t2, key)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_simhash_and_fingerprint_deterministic(s):
    from ocr_engine_ray.stages.dedup import simhash64
    from ocr_engine_ray.stages.textstats import fingerprint64

    assert simhash64(s) == simhash64(s)
    assert fingerprint64(s) == fingerprint64(s)


def test_cross_process_determinism_hashseed():
    """Outputs must be identical across interpreters with different
    PYTHONHASHSEED (no builtin hash() anywhere in the data path)."""
    import os
    import subprocess
    import sys

    script = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from ocr_engine_ray.sources.synth import generate_transcripts\n"
        "from ocr_engine_ray.oracle import oracle_extract\n"
        "from ocr_engine_ray.state.lineage import table_checksum\n"
        "from ocr_engine_ray.stages.dedup import simhash64\n"
        "from ocr_engine_ray.stages.textstats import fingerprint64\n"
        "t = generate_transcripts(300, seed=21)\n"
        "out = oracle_extract(t)\n"
        "c, n = table_checksum(out, ['conv_id', 'turn_idx', 'extracted_text'])\n"
        "print(c, n, simhash64('alpha beta gamma'), fingerprint64('a b c d e'))\n"
    )
    results = set()
    for seed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, check=True)
        results.add(out.stdout.strip())
    assert len(results) == 1, results


def test_round_sql_matches_duckdb_round():
    """Property: round_sql is bit-identical to DuckDB ROUND(x, n) across
    magnitudes, signs and digit counts (the driver's value hash depends
    on it)."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from ocr_engine_ray.util import round_sql, round_sql_f

    rng = np.random.RandomState(77)
    vals = np.concatenate([
        rng.uniform(-1, 1, 300) * 10.0 ** rng.randint(-4, 10, 300),
        np.array([0.0, -0.0, 0.005, -0.005, 2.675, 527868276.59000003,
                  5707855.140000001]),
    ])
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(vals, pa.float64())}))
    for n in (0, 2, 4, 6):
        want = [r[0] for r in con.sql(
            f"SELECT round(x, {n}) FROM t").fetchall()]
        got = round_sql(pa.array(vals, pa.float64()), n).to_pylist()
        assert got == want, f"ndigits={n}"
        got_f = [round_sql_f(float(v), n) for v in vals]
        assert got_f == want, f"scalar ndigits={n}"


def test_no_unsafe_rounding_in_query_surface():
    """Lint guard: the oracle-facing query code must round via
    round_sql/round_sql_f (bit-identical to DuckDB ROUND), never
    pc.round / np.round / bare round( on floats destined for the hash
    compare — the exact bug class that shipped three red rows in
    round 1."""
    import re
    from pathlib import Path

    src = Path("ocr_engine_ray/pipelines/queries.py").read_text()
    assert "pc.round(" not in src
    assert "np.round(" not in src
    # bare round( allowed only in prose (docstrings/comments) and the
    # HLL estimate line (rows-only query, no oracle)
    for line in src.splitlines():
        if re.search(r"(?<![_.\w])round\(", line):
            assert ("approx_distinct" in line or line.lstrip().startswith("#")
                    or '"' in line.replace('round("', "")), line


def test_date_oracle_twin_matches_find_date():
    """The DuckDB date twin (__ray_entry__._date_parse_sql) replays
    core.dates.find_date on every pattern family including the
    space-separated numeric triple and prefix-table month names
    ('Sept') that try_strptime rejects."""
    import duckdb

    import __ray_entry__ as entrymod
    from ocr_engine_ray.core.dates import find_date
    from ocr_engine_ray.core.extract import DEFAULT_AS_OF

    cases = [
        "invoice issued 12 3 2024", "due 5 Sept 2024",
        "Dated Sept 5, 2024", "Invoice Date: 12/05/2024",
        "total 1.2.3 junk", "x 31 12 24 y",
        "Invoice Date: March 5, 2027", "nothing here", "99 99 9999",
        "5 May 24", "May 5 24", "12.05.24", "20240512", "13131313",
        "Invoice Date: 2024-11-30", "Invoice Date: 11-30-2024",
        "Invoice Date: 30 Nov 2024", "page 1\n73,692:ledger",
    ]
    con = duckdb.connect()
    expr = entrymod._date_parse_sql("t")
    for s in cases:
        want, _ = find_date(s, DEFAULT_AS_OF)
        got = con.sql(f"SELECT {expr} FROM (SELECT ? AS t)",
                      params=[s]).fetchone()[0]
        assert got == want, (s, got, want)


def test_item_cents_oracle_twin_matches_parse_money():
    """The item money-cell twin (__ray_entry__._item_cents_sql) replays
    parse_money_cents including the price-token fallback, and never
    aborts the query on junk cells."""
    import duckdb

    import __ray_entry__ as entrymod
    from ocr_engine_ray.core.money import parse_money_cents

    cases = ["1.50", "4.50 |", "$1,234.56", "N/A", "1.2.3", "-",
             "12", "0.00", "", "abc", "3,50"]
    con = duckdb.connect()
    expr = entrymod._item_cents_sql("c")
    for s in cases:
        want = parse_money_cents(s) if s.strip() else None
        got = con.sql(f"SELECT {expr} FROM (SELECT ? AS c)",
                      params=[s]).fetchone()[0]
        assert got == want, (s, got, want)


def test_joined_key_strings_injective_property():
    """Hypothesis: distinct key tuples never produce the same joined
    string (length-prefixed encoding), including separator bytes inside
    values — the invariant the streaming dedup index relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_engine_ray.stages.dedup import joined_key_strings

    val = st.text(
        alphabet=st.characters(codec="utf-8",
                               blacklist_categories=("Cs",)),
        max_size=8)
    pair = st.tuples(val, val)

    @settings(max_examples=300, deadline=None)
    @given(a=pair, b=pair)
    def check(a, b):
        t = pa.table({"k1": pa.array([a[0], b[0]], pa.string()),
                      "k2": pa.array([a[1], b[1]], pa.string())})
        j = joined_key_strings(t, ["k1", "k2"]).to_pylist()
        assert (j[0] == j[1]) == (a == b)

    check()


@given(st.text(alphabet="abc", max_size=6), st.text(alphabet="abc", max_size=6))
@settings(max_examples=300, deadline=None)
def test_ed_is_one_matches_dp_levenshtein(a, b):
    """The two-pointer threshold check equals a full DP edit distance
    == 1 on every input (the fuzzy join's exactness rests on this)."""
    from ocr_engine_ray.pipelines.queries import _ed_is_one

    def lev(x, y):
        m, n = len(x), len(y)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (x[i - 1] != y[j - 1]))
            prev = cur
        return prev[n]

    assert _ed_is_one(a, b) == (lev(a, b) == 1)


@given(st.lists(st.tuples(st.integers(1, 3),
                          st.integers(0, 400)), min_size=1, max_size=30),
       st.integers(1, 5))
@settings(max_examples=60, deadline=None)
def test_session_shard_flush_equals_batch_sessionize(events, n_frags):
    """Feeding arbitrary fragmentations of an event set through the
    SessionShard merge (single run, no watermark in between) and
    flushing equals the batch gaps-and-islands sessionize — the
    order-independent interval-union invariant, directly (no Ray
    Dataset in the loop, so hypothesis can drive many cases)."""
    import ray

    from ocr_engine_ray.stages.window import SessionShard

    GAP = 50
    shard = SessionShard.remote(gap_us=GAP)
    try:
        # reference: per-key sorted gaps-and-islands
        want = {}
        by_key = {}
        for k, t in events:
            by_key.setdefault(k, []).append(t)
        for k, ts in by_key.items():
            ts = sorted(ts)
            s = e = ts[0]
            n = 1
            for t in ts[1:]:
                if t - e > GAP:
                    want.setdefault(k, []).append((s, e, n))
                    s, n = t, 0
                e = t
                n += 1
            want.setdefault(k, []).append((s, e, n))

        # fragment the (pre-merged per fragment) event list arbitrarily
        frags = [events[i::n_frags] for i in range(n_frags)]
        for fi, frag in enumerate(f for f in frags if f):
            # each fragment pre-merges ITS OWN events per key, like the
            # ingestor does per batch
            loc = {}
            for k, t in frag:
                loc.setdefault(k, []).append(t)
            keys, starts, ends, counts = [], [], [], []
            for k, ts in loc.items():
                ts = sorted(ts)
                s = e = ts[0]
                n = 1
                for t in ts[1:]:
                    if t - e > GAP:
                        keys.append(k)
                        starts.append(s)
                        ends.append(e)
                        counts.append(n)
                        s, n = t, 0
                    e = t
                    n += 1
                keys.append(k)
                starts.append(s)
                ends.append(e)
                counts.append(n)
            ray.get(shard.merge.remote(f"f{fi}".encode(), keys, starts,
                                       ends, counts))
        out = ray.get(shard.flush_all.remote())
        got = {}
        for k, s, e, n in zip(out["keys"], out["starts"], out["ends"],
                              out["counts"]):
            got.setdefault(k, []).append((s, e, n))
        assert {k: sorted(v) for k, v in got.items()} \
            == {k: sorted(v) for k, v in want.items()}
    finally:
        ray.kill(shard)
