"""Export shaping, vendor anti-join, page explode, extractor registry."""

import pyarrow as pa
import pytest


def test_shape_export_batch_matches_reference_layout(ray_session, small_corpus):
    from ocr_engine_ray.oracle import oracle_extract
    from ocr_engine_ray.pipelines.export import EXPORT_COLUMNS, shape_export_batch

    validated = oracle_extract(small_corpus)
    out = shape_export_batch(validated)
    assert out.column_names == EXPORT_COLUMNS
    assert out.num_rows == validated.num_rows
    rows = out.to_pylist()
    src = validated.to_pylist()
    for r, s in zip(rows, src):
        assert r["filename"] == f"{s['conv_id']}#{s['turn_idx']}"
        if s["final_total_cents"] is not None:
            euros = r["final_total"]
            assert "." in euros and len(euros.split(".")[1]) == 2
        if s["items_qty"]:
            assert r["quantity"] == s["items_qty"]
        # address concat drops empty parts, comma-joined
        assert ",," not in r["address"]


def test_write_export_csv_and_parquet(ray_session, small_corpus, tmp_path):
    import ray.data as rd

    from ocr_engine_ray.pipelines.export import write_export
    from ocr_engine_ray.pipelines.flagship import extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus.slice(0, 200)),
                                  concurrency=2, batch_size=64)
    write_export(validated, str(tmp_path / "pq"), fmt="parquet")
    import glob

    import pyarrow.parquet as pq
    files = glob.glob(str(tmp_path / "pq" / "*.parquet"))
    assert files
    assert sum(pq.ParquetFile(f).metadata.num_rows for f in files) == 200
    with pytest.raises(ValueError):
        write_export(validated, str(tmp_path / "x"), fmt="xml")


def test_write_export_jsonl(ray_session, small_corpus, tmp_path):
    """JSONL sink: distributed part files of newline-delimited JSON
    objects carrying the 12 export columns, one object per record."""
    import glob
    import json

    import ray.data as rd

    from ocr_engine_ray.pipelines.export import EXPORT_COLUMNS, write_export
    from ocr_engine_ray.pipelines.flagship import extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus.slice(0, 200)),
                                  concurrency=2, batch_size=64)
    write_export(validated, str(tmp_path / "jl"), fmt="jsonl")
    files = glob.glob(str(tmp_path / "jl" / "*.json"))
    assert files
    rows = [json.loads(line)
            for f in files for line in open(f) if line.strip()]
    assert len(rows) == 200
    assert set(rows[0]) == set(EXPORT_COLUMNS)


def test_export_excel_writes_styled_sheet(ray_session, small_corpus, tmp_path):
    """S8: the stdlib SpreadsheetML writer produces a real xlsx (ZIP of
    XML parts) with the reference's sheet name, bold header and
    auto-width columns — verified by parsing the parts back."""
    import zipfile
    import xml.etree.ElementTree as ET

    import ray.data as rd

    from ocr_engine_ray.pipelines.export import EXPORT_COLUMNS, export_excel
    from ocr_engine_ray.pipelines.flagship import extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus.slice(0, 10)),
                                  concurrency=1, batch_size=8)
    path = str(tmp_path / "out.xlsx")
    export_excel(validated, path)
    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml", "xl/styles.xml"} <= names
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheet = wb.find(f"{NS}sheets/{NS}sheet")
        assert sheet.get("name") == "Invoices"
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = ws.findall(f"{NS}sheetData/{NS}row")
        assert len(rows) == 11  # header + 10 records
        header = [c.find(f"{NS}is/{NS}t").text for c in rows[0]]
        assert header == EXPORT_COLUMNS
        assert all(c.get("s") == "1" for c in rows[0])  # bold style
        cols = ws.findall(f"{NS}cols/{NS}col")
        assert len(cols) == len(EXPORT_COLUMNS)
        # auto width = max cell length + 2 (>= header width + 2)
        assert all(float(c.get("width")) >= len(h) + 2
                   for c, h in zip(cols, header))


def test_export_excel_row_cap(ray_session, small_corpus, tmp_path):
    import ray.data as rd

    from ocr_engine_ray.pipelines.export import export_excel
    from ocr_engine_ray.pipelines.flagship import extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus.slice(0, 10)),
                                  concurrency=1, batch_size=8)
    with pytest.raises(ValueError, match="sheet"):
        export_excel(validated, str(tmp_path / "cap.xlsx"), max_rows=3)


def test_flag_unapproved_vendors(ray_session, small_corpus):
    import ray.data as rd

    from ocr_engine_ray.pipelines.export import flag_unapproved_vendors
    from ocr_engine_ray.pipelines.flagship import extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus), concurrency=2)
    out = pa.Table.from_pylist(
        flag_unapproved_vendors(validated, ["Acme Supplies Inc"]).take_all())
    assert out.num_rows > 0
    for r in out.to_pylist():
        assert r["vendor_approved"] == (
            r["vendor_name"].strip().lower() == "acme supplies inc")


def test_explode_pages(ray_session):
    from ocr_engine_ray.stages.extract import explode_pages_batch

    t = pa.table({
        "conv_id": pa.array(["a", "a"], pa.string()),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "extracted_text": pa.array(["p1\fp2\fp3", "single"], pa.string()),
    })
    out = explode_pages_batch(t)
    assert out.num_rows == 4
    rows = out.to_pylist()
    assert [r["page_idx"] for r in rows] == [0, 1, 2, 0]
    assert rows[0]["total_pages"] == 3 and rows[3]["total_pages"] == 1
    assert rows[2]["page_text"] == "p3"


def test_extractor_registry_tool_override():
    from ocr_engine_ray.core.extract import (
        TOOL_EXTRACTORS, extract_turn, register_tool_extractor)

    def shouty(text: str) -> str:
        return text.upper()

    register_tool_extractor("shout", shouty)
    try:
        rec = extract_turn("hello there", tool="shout")
        assert rec.content_type == "tool:shout"
        assert rec.extracted_text == "HELLO THERE"
        # unregistered tools keep sniff-based behavior
        rec2 = extract_turn("hello there", tool="browser")
        assert rec2.content_type == "plain"
    finally:
        TOOL_EXTRACTORS.pop("shout", None)


def test_register_content_extractor_roundtrip():
    from ocr_engine_ray.core.extract import (
        CONTENT_EXTRACTORS, extract_turn, register_extractor)

    orig = CONTENT_EXTRACTORS["plain"]
    register_extractor("plain", lambda t: t.replace("a", "@"))
    try:
        assert "@" in extract_turn("banana").extracted_text
    finally:
        register_extractor("plain", orig)


def test_bundle_export(ray_session, small_corpus, tmp_path):
    """S10 analogue: a finished export directory packages into one ZIP
    with a content listing."""
    import json
    import zipfile

    import ray.data as rd

    from ocr_engine_ray.pipelines.export import bundle_export, write_export
    from ocr_engine_ray.pipelines.flagship import extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus.slice(0, 50)),
                                  concurrency=1, batch_size=32)
    out = tmp_path / "exp"
    write_export(validated, str(out), fmt="parquet")
    zp = bundle_export(str(out), str(tmp_path / "bundle.zip"))
    with zipfile.ZipFile(zp) as z:
        names = z.namelist()
        assert "_LISTING.json" in names
        listing = json.loads(z.read("_LISTING.json"))
        assert len(listing) == len(names) - 1
        assert all(e["bytes"] > 0 for e in listing)
        assert any(n.endswith(".parquet") for n in names)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bundle_export(str(tmp_path / "empty_dir_missing"), str(tmp_path / "x.zip"))


def test_write_export_partitioned_layout_and_roundtrip(ray_session,
                                                       tmp_path):
    """partition_cols produce hive directories per key value; a
    read-back restores every row with the partition column intact."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from ocr_engine_ray.pipelines.export import write_export_partitioned

    tab = pa.table({
        "day": pa.array(["2024-01-01", "2024-01-02"] * 10),
        "n": pa.array(range(20), pa.int64()),
    })
    out = str(tmp_path / "by_day")
    write_export_partitioned(rd.from_arrow(tab), out, ["day"])
    dirs = sorted(d for d in os.listdir(out) if d.startswith("day="))
    assert dirs == ["day=2024-01-01", "day=2024-01-02"]
    back = rd.read_parquet(out).take_all()
    assert len(back) == 20
    got = sorted((r["day"], r["n"]) for r in back)
    want = sorted((d, n) for d, n in zip(tab.column("day").to_pylist(),
                                         tab.column("n").to_pylist()))
    assert got == want
