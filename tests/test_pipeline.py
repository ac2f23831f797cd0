"""Ray pipeline vs single-process oracle: per-turn equality under stable
turn ordering (the north-rule invariant), plus shuffle-invariance and
per-conversation stages (SURVEY §5.2-5.3)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _sorted_pylist(table: pa.Table) -> list[dict]:
    return table.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"),
         ("extracted_text", "ascending")]
    ).to_pylist()


@pytest.fixture(scope="module")
def oracle_out(small_corpus):
    from ocr_engine_ray.oracle import oracle_extract

    return oracle_extract(small_corpus)


@pytest.fixture(scope="module")
def ray_out(ray_session, small_corpus):
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import extract_validated

    ds = rd.from_arrow(small_corpus).repartition(7)  # force multi-block
    out = extract_validated(ds, batch_size=64, concurrency=2)
    return pa.Table.from_pylist(out.take_all())


def test_per_turn_equality(ray_out, oracle_out):
    got = _sorted_pylist(ray_out)
    want = _sorted_pylist(oracle_out)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["conv_id"] == w["conv_id"] and g["turn_idx"] == w["turn_idx"]
        # byte-identical extracted text + spans (north rule)
        assert g["extracted_text"] == w["extracted_text"], (g["conv_id"], g["turn_idx"])
        assert g["spans"] == w["spans"]
    # full-record equality on every remaining column
    for col in ray_out.column_names:
        for g, w in zip(got, want):
            assert g[col] == w[col], col


def test_shuffled_input_same_output(ray_session, small_corpus, oracle_out):
    """Input row order must not matter (exercises ordering discipline)."""
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import extract_validated

    idx = list(range(small_corpus.num_rows))
    import random

    random.Random(99).shuffle(idx)
    shuffled = small_corpus.take(pa.array(idx))
    out = extract_validated(rd.from_arrow(shuffled).repartition(5),
                            batch_size=97, concurrency=2)
    got = _sorted_pylist(pa.Table.from_pylist(out.take_all()))
    want = _sorted_pylist(oracle_out)
    assert [r["extracted_text"] for r in got] == [r["extracted_text"] for r in want]
    assert [r["warnings"] for r in got] == [r["warnings"] for r in want]


def test_conv_rollup_matches_oracle(ray_session, small_corpus, oracle_out):
    import ray.data as rd

    from ocr_engine_ray.oracle import oracle_conv_rollup
    from ocr_engine_ray.pipelines.flagship import conv_rollup, extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus).repartition(6),
                                  batch_size=128, concurrency=2)
    got = pa.Table.from_pylist(conv_rollup(validated).take_all()).sort_by("conv_id")
    want = oracle_conv_rollup(oracle_out)
    assert got.num_rows == want.num_rows
    gl, wl = got.to_pylist(), want.to_pylist()
    for g, w in zip(gl, wl):
        for k in ("conv_id", "n_turns", "total_chars", "n_flagged",
                  "first_ts", "last_ts", "items_qty", "items_total_cents"):
            assert g[k] == w[k], (k, g["conv_id"])


def test_assemble_conversations_ordered(ray_session, small_corpus):
    """Merged doc must be in turn_idx order regardless of input order and
    duplicates collapse to first occurrence."""
    import ray.data as rd

    from ocr_engine_ray.oracle import oracle_extract
    from ocr_engine_ray.pipelines.flagship import assemble_conversations, extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus).repartition(4),
                                  batch_size=128, concurrency=2)
    got = {r["conv_id"]: r for r in assemble_conversations(validated).take_all()}

    # oracle: same merge, single process
    want_tbl = oracle_extract(small_corpus)
    want: dict[str, list] = {}
    seen: dict[str, set] = {}
    for r in want_tbl.to_pylist():
        c = r["conv_id"]
        if r["turn_idx"] in seen.setdefault(c, set()):
            continue
        seen[c].add(r["turn_idx"])
        if r["extracted_text"]:
            want.setdefault(c, []).append(r["extracted_text"])
        else:
            want.setdefault(c, [])
    assert set(got) == set(want)
    for c, parts in want.items():
        assert got[c]["doc_text"] == "\n\n".join(parts), c
        assert got[c]["n_turns"] == len(seen[c])


def test_scalable_assembly_equals_plain(ray_session, small_corpus):
    """Hierarchical (turn-range-bucketed) assembly must produce exactly
    the same documents as the single-group assembly, even with a bucket
    size small enough that every conversation spans several buckets."""
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import (
        assemble_conversations, assemble_conversations_scalable,
        extract_validated)

    validated = extract_validated(rd.from_arrow(small_corpus).repartition(5),
                                  batch_size=100, concurrency=2)
    plain = {r["conv_id"]: r for r in assemble_conversations(validated).take_all()}
    scalable = {r["conv_id"]: r
                for r in assemble_conversations_scalable(
                    validated, range_size=8).take_all()}
    assert set(plain) == set(scalable)
    for c in plain:
        assert scalable[c]["doc_text"] == plain[c]["doc_text"], c
        assert scalable[c]["n_turns"] == plain[c]["n_turns"], c
        assert scalable[c]["doc_chars"] == plain[c]["doc_chars"], c


def test_ordered_extraction_equals_unordered(ray_session, small_corpus, oracle_out):
    """The groupby(conv_id)+sort(turn_idx)-before-extraction variant must
    produce byte-identical records to the shuffle-free default (per-turn
    statelessness), and both equal the oracle."""
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import extract_validated_ordered

    out = extract_validated_ordered(rd.from_arrow(small_corpus).repartition(6))
    got = _sorted_pylist(pa.Table.from_pylist(out.take_all()))
    want = _sorted_pylist(oracle_out)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["extracted_text"] == w["extracted_text"]
        assert g["spans"] == w["spans"]
        assert g["warnings"] == w["warnings"]


def test_standalone_validate_stage(ray_session, small_corpus):
    """The unfused two-stage path (extract-only → validate stage) must
    agree with the fused single-pass output."""
    import ray.data as rd

    from ocr_engine_ray.oracle import oracle_extract
    from ocr_engine_ray.stages.extract import TurnExtractor
    from ocr_engine_ray.stages.validate import validate_batch

    sub = small_corpus.slice(0, 200)
    ds = rd.from_arrow(sub).map_batches(
        TurnExtractor, fn_constructor_kwargs={"validate": False},
        batch_format="pyarrow", batch_size=64, concurrency=2)
    two_stage = ds.map_batches(validate_batch, batch_format="pyarrow")
    got = _sorted_pylist(pa.Table.from_pylist(two_stage.take_all()))
    want = _sorted_pylist(oracle_extract(sub))
    assert [r["warnings"] for r in got] == [r["warnings"] for r in want]
    assert [r["is_valid"] for r in got] == [r["is_valid"] for r in want]
    assert [r["flags"] for r in got] == [r["flags"] for r in want]


def test_flagship_templated_matches_generic_corpus(ray_session):
    """M7 backend parity on the synthetic corpus: routing pdf_reader
    turns through the template rule-pack backend yields the same
    projected fields as the generic backend wherever both extract (the
    chain only prefers a template record that passes the reference's
    validity predicate)."""
    import pandas as pd

    from ocr_engine_ray.pipelines.queries import (
        q_flagship_extract, q_flagship_extract_templated,
    )

    sf = "/root/testdata/sf0.001"
    t = pd.DataFrame(q_flagship_extract_templated(sf).take_all()) \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    g = pd.DataFrame(q_flagship_extract(sf).take_all()) \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(t, g)


def test_conv_rollup_tree_equals_shuffle(ray_session, small_corpus):
    import pandas as pd
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import conv_rollup, extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus), concurrency=2)
    a = pd.DataFrame(conv_rollup(validated, combine="shuffle").take_all()) \
        .sort_values("conv_id").reset_index(drop=True)
    b = pd.DataFrame(conv_rollup(validated, combine="tree").take_all()) \
        .sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_driver_registered_backend_reaches_actors(ray_session, small_corpus):
    """register_field_backend on the DRIVER must reach TurnExtractor
    actors (which construct in worker processes): extract_validated
    snapshots the registry into the actor constructor args."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_engine_ray.core.extract import (
        FIELD_BACKENDS, TurnRecord, register_field_backend,
    )
    from ocr_engine_ray.pipelines.flagship import extract_validated

    def stamp_backend(text, as_of):
        return TurnRecord(invoice_number="FROM-DRIVER-BACKEND",
                          backend="driver-registered")

    register_field_backend("browser", stamp_backend)
    try:
        out = pa.Table.from_pylist(
            extract_validated(rd.from_arrow(small_corpus.slice(0, 64)),
                              concurrency=1, batch_size=32).take_all())
        browser_rows = [r for r in out.to_pylist() if r["tool"] == "browser"
                        and r["extracted_text"]]
        assert browser_rows, "corpus should contain browser-tool turns"
        assert all(r["invoice_number"] == "FROM-DRIVER-BACKEND"
                   for r in browser_rows)
    finally:
        FIELD_BACKENDS.pop("browser", None)
