"""Unit tests for the pure extraction core (SURVEY §5.1): date pattern
families, money normalizer, regex extractors, content sniff, HTML
boilerplate strip, PDF reading order, validators and anomaly thresholds."""

from datetime import date

import pytest

from ocr_engine_ray.core.dates import find_date, parse_date_candidate
from ocr_engine_ray.core.extract import TurnRecord, extract_turn, items_rollup
from ocr_engine_ray.core.fields import (
    extract_invoice_number, extract_items, extract_kv_pairs, extract_totals,
    extract_vendor,
)
from ocr_engine_ray.core.html_extract import extract_html
from ocr_engine_ray.core.markdown_extract import extract_markdown
from ocr_engine_ray.core.money import cents_to_str, parse_money_cents
from ocr_engine_ray.core.pdfish import extract_pdf_layout, num_pages
from ocr_engine_ray.core.sniff import sniff_content_type
from ocr_engine_ray.core.textnorm import normalize_text
from ocr_engine_ray.core.validate import flag_record, validate_record

AS_OF = date(2026, 1, 1)


# -- dates (reference pattern families, app/utils/data_extractor.py:44-56) --

@pytest.mark.parametrize("s,expected", [
    ("12/03/2024", date(2024, 3, 12)),        # DMY preferred
    ("2024-03-12", date(2024, 3, 12)),        # YMD
    ("2024/03/12", date(2024, 3, 12)),
    ("20240312", date(2024, 3, 12)),          # 8-digit YYYYMMDD
    ("31122024", date(2024, 12, 31)),         # 8-digit DDMMYYYY
    ("12 Mar 2024", date(2024, 3, 12)),
    ("March 12, 2024", date(2024, 3, 12)),
    ("Mar 12 2024", date(2024, 3, 12)),
    ("12.03.2024", date(2024, 3, 12)),
    ("12-03-2024", date(2024, 3, 12)),
    ("12 3 2024", date(2024, 3, 12)),
    ("13/25/2024", None),                     # no valid order
    ("Tue Mar 2024", date(2024, 3, 1)),       # weekday month year → day 1
])
def test_parse_date_candidate(s, expected):
    assert parse_date_candidate(s, AS_OF) == expected


def test_two_digit_year_windowing():
    # century windowing: as_of 2026 → window is (2026-79 .. 2046]
    assert parse_date_candidate("12/03/24", AS_OF) == date(2024, 3, 12)
    assert parse_date_candidate("12/03/99", AS_OF) == date(1999, 3, 12)


def test_find_date_keyword_proximity_wins():
    text = "shipped 01/01/2020 stuff\nInvoice Date: 15/06/2023\nother 02/02/2021"
    d, span = find_date(text, AS_OF)
    assert d == date(2023, 6, 15)
    assert text[span[0]:span[1]] == "15/06/2023"


def test_find_date_dotted_two_digit():
    d, _ = find_date("am 15.06.23 geliefert", AS_OF)
    assert d == date(2023, 6, 15)


def test_find_date_none():
    assert find_date("no dates here at all", AS_OF) == (None, None)


# -- money (app/utils/data_extractor.py:470-483) ---------------------------

@pytest.mark.parametrize("s,cents", [
    ("$1,234.56", 123456),
    ("1234.56", 123456),
    ("1,234", 123400),
    ("-12.30", -1230),
    ("USD 99.95 total", 9995),
    ("", None),
    ("   ", None),
    ("n/a", None),
])
def test_parse_money(s, cents):
    assert parse_money_cents(s) == cents


def test_cents_to_str():
    assert cents_to_str(123456) == "1234.56"
    assert cents_to_str(-5) == "-0.05"
    assert cents_to_str(None) == ""


# -- field extractors ------------------------------------------------------

def test_invoice_number_patterns_in_order():
    assert extract_invoice_number("Invoice Number: INV-12345")[0] == "INV-12345"
    assert extract_invoice_number("invoice # ABC-99887")[0] == "ABC-99887"
    assert extract_invoice_number("INV: Z123456")[0] == "Z123456"
    assert extract_invoice_number("no id here")[0] is None
    assert extract_invoice_number("Invoice Number: ab1")[0] is None  # <5 chars


def test_totals_subtotal_not_total():
    text = "Subtotal: $100.00\nTax: $10.00\nTotal: $110.00"
    totals, spans = extract_totals(text)
    assert totals == {"grand_total_cents": 10000, "taxes_cents": 1000,
                      "final_total_cents": 11000}
    assert len(spans) == 3


def test_vendor_and_address():
    text = "Acme Supplies Inc\n12 Industrial Way\nSpringfield, IL 62704\nmore"
    v = extract_vendor(text)
    assert v["vendor_name"] == "Acme Supplies Inc"
    assert v["vendor_street"] == "12 Industrial Way"
    assert v["vendor_city"] == "Springfield"
    assert v["vendor_state"] == "IL"
    assert v["vendor_postal"] == "62704"


def test_items_skip_header_and_bad_qty():
    text = ("Desc | Qty | Unit | Total\n"
            "widget a | 2 | 3.00 | 6.00\n"
            "widget b | x | 3.00 | 6.00\n"   # bad qty → row skipped
            "widget c |  | 3.00 | 6.00")     # empty qty → None
    items = extract_items(text)
    assert len(items) == 2
    assert items[0].quantity == 2 and items[0].total_cents == 600
    assert items[1].quantity is None


def test_kv_pairs():
    pairs = extract_kv_pairs("PO Number: 7788\nplain line\nCurrency: USD")
    assert ("PO Number", "7788") in pairs and ("Currency", "USD") in pairs


def test_items_rollup_matches_exporter_semantics():
    from ocr_engine_ray.core.fields import Item
    items = [Item("a", 2, 300, 600), Item("b", 3, 100, 300), Item("c", None, None, 500)]
    qty, total, avg = items_rollup(items)
    assert qty == 5 and total == 1400
    assert avg == 280  # 1400/5
    assert items_rollup([]) == (0, 0, None)


# -- sniff / normalize -----------------------------------------------------

def test_sniff():
    assert sniff_content_type("") == "empty"
    assert sniff_content_type("  \n ") == "empty"
    assert sniff_content_type("%PDF-LAYOUT 1.0\n72,720:x") == "pdf"
    assert sniff_content_type("<!DOCTYPE html><html><body>x</body></html>") == "html"
    assert sniff_content_type("<div>a</div> <p>b</p>") == "html"
    assert sniff_content_type("# Title\n- item one\n- item two") == "markdown"
    assert sniff_content_type("just words here") == "plain"


def test_normalize_text():
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"
    assert normalize_text("a \t b") == "a b"
    assert normalize_text("x\x00y\x07z") == "xyz"
    assert normalize_text("a\n\n\n\n\nb") == "a\n\nb"
    assert normalize_text("  padded  ") == "padded"


# -- html ------------------------------------------------------------------

def test_html_boilerplate_stripped():
    html = ("<html><head><script>var a=1;</script><style>p{}</style></head>"
            "<body><nav><a href='/x'>home</a> <a href='/y'>about</a></nav>"
            "<p>This is the real main content of the page.</p>"
            "<footer>© legal <a href='/t'>terms</a></footer></body></html>")
    out = extract_html(html)
    assert "real main content" in out
    assert "home" not in out and "legal" not in out and "var a=1" not in out


def test_html_link_density_drops_linkfarm():
    html = ("<p><a href='1'>aaa</a> <a href='2'>bbb</a> <a href='3'>ccc</a> x</p>"
            "<p>genuine paragraph text without links at all</p>")
    out = extract_html(html)
    assert "genuine paragraph" in out
    assert "aaa" not in out


def test_html_table_rows_become_pipe_lines():
    html = "<table><tr><td>a</td><td>1</td><td>2.00</td><td>2.00</td></tr></table>"
    assert extract_html(html) == "a | 1 | 2.00 | 2.00"


def test_html_malformed_degrades():
    out = extract_html("<html><body><div><p>truncated content without close")
    assert "truncated content" in out


# -- markdown --------------------------------------------------------------

def test_markdown_strip():
    md = ("# Heading\n- **Bold: item**\n1. numbered\n[link](http://x) end\n"
          "```\ncode line\n```\n| a | b | c | d |\n|---|---|---|---|\n| 1 | 2 | 3 | 4 |")
    out = extract_markdown(md)
    assert "Heading" in out and "Bold: item" in out and "numbered" in out
    assert "link end" in out and "http://x" not in out
    assert "code line" in out
    assert "a | b | c | d" in out and "1 | 2 | 3 | 4" in out
    assert "---" not in out


# -- pdf layout ------------------------------------------------------------

def test_pdf_reading_order():
    pdf = ("%PDF-LAYOUT 1.0\n@page 1\n"
           "72,700:second line\n"
           "300,720:right of first\n"
           "72,722:first line\n")   # jittered y within tolerance → same line
    out = extract_pdf_layout(pdf)
    assert out == "first line right of first\nsecond line"


def test_pdf_pages_formfeed_and_count():
    pdf = "%PDF-LAYOUT 1.0\n@page 1\n72,720:p1\n@page 2\n72,720:p2\n"
    assert extract_pdf_layout(pdf) == "p1\fp2"
    assert num_pages(pdf) == 2


def test_pdf_malformed_lines_ignored():
    pdf = "%PDF-LAYOUT 1.0\n@page 1\nnot a fragment\n72,720:ok\n"
    assert extract_pdf_layout(pdf) == "ok"


# -- full turn + fallback chain -------------------------------------------

def test_extract_turn_end_to_end_html_invoice():
    html = ("<html><body><nav><a href='/'>nav</a></nav>"
            "<p>Acme Supplies Inc</p><p>12 Industrial Way</p>"
            "<p>Springfield, IL 62704</p>"
            "<p>Invoice Number: INV-55555</p><p>Invoice Date: 2024-03-12</p>"
            "<table><tr><td>Desc</td><td>Qty</td><td>Unit</td><td>Total</td></tr>"
            "<tr><td>widget</td><td>2</td><td>3.00</td><td>6.00</td></tr></table>"
            "<p>Subtotal: $6.00</p><p>Tax: $0.60</p><p>Total: $6.60</p>"
            "</body></html>")
    rec = extract_turn(html, AS_OF)
    assert rec.content_type == "html"
    assert rec.invoice_number == "INV-55555"
    assert rec.invoice_date == date(2024, 3, 12)
    assert rec.grand_total_cents == 600 and rec.taxes_cents == 60
    assert rec.final_total_cents == 660
    assert len(rec.items) == 1 and rec.items[0].quantity == 2
    assert rec.vendor_name == "Acme Supplies Inc"
    kinds = {s[2] for s in rec.spans}
    assert {"id", "date", "money", "table_row"} <= kinds
    # spans index into extracted_text
    for s, e, _k in rec.spans:
        assert 0 <= s <= e <= len(rec.extracted_text)


def test_extract_turn_fallback_to_plain():
    # sniffs as html (two tags) but extractor yields nothing → plain fallback
    rec = extract_turn("<div></div><p></p>ok", AS_OF)
    assert rec.extracted_text != ""


def test_extract_turn_never_raises():
    rec = extract_turn(None, AS_OF)  # type: ignore[arg-type]
    assert rec.extracted_text == "" and rec.content_type == "empty"


# -- validators / flags ----------------------------------------------------

def _full_record() -> TurnRecord:
    from ocr_engine_ray.core.fields import Item
    rec = TurnRecord(
        content_type="plain", extracted_text="x", pages=1,
        invoice_number="INV-12345", invoice_date=date(2024, 3, 12),
        grand_total_cents=10000, taxes_cents=1000, final_total_cents=11000,
        vendor_name="Acme", vendor_street="1 Way", vendor_city="Springfield",
        vendor_state="IL", vendor_postal="62704",
        items=[Item("widget", 2, 300, 600)],
    )
    return rec


def test_validate_clean_record_country_only():
    # country is never extracted (reference parity) → exactly one warning
    w = validate_record(_full_record(), "conv-1", AS_OF)
    assert w == ["Vendor country is missing"]


def test_validate_totals_mismatch_tolerance():
    rec = _full_record()
    rec.final_total_cents = 11001  # off by 1 cent → within tolerance
    assert not any(w.startswith("Total amounts may not match")
                   for w in validate_record(rec, "c", AS_OF))
    rec.final_total_cents = 11002  # off by 2 cents → warned, with the
    # reference's formatted-amounts suffix (validator.py:99)
    warns = validate_record(rec, "c", AS_OF)
    assert any(w.startswith("Total amounts may not match: ") and "≈" in w
               for w in warns)


def test_validate_item_math():
    rec = _full_record()
    rec.items[0].total_cents = 700  # 2×300 ≠ 700
    assert any("Total may not match" in w for w in validate_record(rec, "c", AS_OF))


def test_flags_thresholds():
    from ocr_engine_ray.core.fields import Item
    rec = _full_record()
    assert flag_record(rec, AS_OF) == []
    rec.invoice_date = date(2027, 1, 1)
    rec.final_total_cents = 10000_01
    rec.items = [Item(f"i{k}", 1, 1, 1) for k in range(21)]
    assert flag_record(rec, AS_OF) == [
        "Future date", "Unusually high total amount", "Large number of line items"]


def test_kv_spans_emitted():
    rec = extract_turn("Acme Inc\nPO Number: 7788\nplain", AS_OF)
    kv_spans = [s for s in rec.spans if s[2] == "kv"]
    assert len(kv_spans) == 1
    s, e, _ = kv_spans[0]
    assert rec.extracted_text[s:e] == "PO Number: 7788"


# -- template rule-pack backend (M7 two-backend chain) ----------------------

INVOICE_TEXT = (
    "Acme Supplies Inc\n12 Industrial Way\nSpringfield, IL 62704\n"
    "Invoice Number: INV-12345\nInvoice Date: 2024-03-05\n"
    "Description | Qty | Unit Price | Total\n"
    "widget thing | 2 | 3.00 | 6.00\n"
    "Subtotal: $6.00\nTax: $0.60\nTotal: $6.60"
)


@pytest.fixture
def template_backend():
    from ocr_engine_ray.core.extract import FIELD_BACKENDS, register_field_backend
    from ocr_engine_ray.core.templates import TemplatePack

    register_field_backend("pdf_reader", TemplatePack().extract)
    yield
    FIELD_BACKENDS.pop("pdf_reader", None)


def test_template_backend_extracts_and_matches_generic(template_backend):
    rec = extract_turn(INVOICE_TEXT, AS_OF, tool="pdf_reader")
    assert rec.backend == "template:acme"
    assert rec.invoice_number == "INV-12345"
    assert rec.invoice_date == date(2024, 3, 5)
    assert (rec.grand_total_cents, rec.taxes_cents, rec.final_total_cents) == (600, 60, 660)
    assert rec.vendor_name == "Acme Supplies Inc"
    assert (rec.vendor_street, rec.vendor_city, rec.vendor_state,
            rec.vendor_postal) == ("12 Industrial Way", "Springfield", "IL", "62704")
    assert len(rec.items) == 1 and rec.items[0].quantity == 2
    # field-level parity with the generic (secondary) backend
    gen = extract_turn(INVOICE_TEXT, AS_OF)
    assert gen.backend == "generic"
    for f in ("invoice_number", "invoice_date", "grand_total_cents",
              "taxes_cents", "final_total_cents", "vendor_name",
              "vendor_street", "vendor_city", "vendor_state", "vendor_postal"):
        assert getattr(rec, f) == getattr(gen, f), f
    assert [(i.quantity, i.unit_price_cents, i.total_cents) for i in rec.items] \
        == [(i.quantity, i.unit_price_cents, i.total_cents) for i in gen.items]


def test_template_backend_chain_fallbacks(template_backend):
    # keyword present but no invoice fields → template abstains → generic
    rec = extract_turn("Acme Supplies Inc was mentioned in passing today",
                       AS_OF, tool="pdf_reader")
    assert rec.backend == "generic"
    # unknown vendor → template abstains → generic
    rec = extract_turn(INVOICE_TEXT.replace("Acme Supplies Inc", "Nobody Co"),
                       AS_OF, tool="pdf_reader")
    assert rec.backend == "generic"
    # tool not routed → generic untouched
    rec = extract_turn(INVOICE_TEXT, AS_OF, tool="browser")
    assert rec.backend == "generic"


def test_template_invalid_record_falls_back():
    """A backend returning an INVALID record (reference _is_invoice_valid
    predicate) must lose to the generic secondary."""
    from ocr_engine_ray.core.extract import FIELD_BACKENDS, register_field_backend

    register_field_backend("search", lambda text, as_of: TurnRecord(backend="fake"))
    try:
        rec = extract_turn(INVOICE_TEXT, AS_OF, tool="search")
        assert rec.backend == "generic"
        assert rec.invoice_number == "INV-12345"
    finally:
        FIELD_BACKENDS.pop("search", None)


def test_template_chain_plain_content_fallback(template_backend):
    """Bottom of the chain: specific content extractor yields nothing →
    plain-text content fallback still applies with a field backend
    registered."""
    rec = extract_turn("just ordinary words with no structure",
                       AS_OF, tool="pdf_reader")
    assert rec.backend == "generic"
    assert rec.extracted_text == "just ordinary words with no structure"


def test_template_dir_loader_adds_capability(tmp_path):
    """A JSON rule pack loaded from a template directory extracts a
    vendor-specific format the generic regexes cannot parse at all —
    the value templates add, not just a faster path."""
    import json

    from ocr_engine_ray.core.templates import TemplatePack, load_template_dir

    (tmp_path / "quirky.json").write_text(json.dumps({
        "name": "quirky",
        "keyword": "Quirky Formats GmbH",
        "invoice_number": r"(?m)^Beleg-Nr\.\s*//\s*(\S+)\s*$",
        "date_line": r"(?m)^Datum\s*//\s*([^\n]+?)\s*$",
        "total": r"(?m)^Endbetrag\s*//\s*EUR\s*([\d,]+\.\d{2})\s*$",
        "subtotal": r"(?m)^Netto\s*//\s*EUR\s*([\d,]+\.\d{2})\s*$",
        "tax": r"(?m)^MwSt\s*//\s*EUR\s*([\d,]+\.\d{2})\s*$",
    }))
    pack = TemplatePack(load_template_dir(str(tmp_path)))
    text = ("Quirky Formats GmbH\nBeleg-Nr. // QF-778899\n"
            "Datum // 15.06.2023\nNetto // EUR 100.00\n"
            "MwSt // EUR 19.00\nEndbetrag // EUR 119.00")
    rec = pack.extract(text, AS_OF)
    assert rec is not None and rec.backend == "template:quirky"
    assert rec.invoice_number == "QF-778899"
    assert rec.invoice_date == date(2023, 6, 15)
    assert (rec.grand_total_cents, rec.taxes_cents,
            rec.final_total_cents) == (10000, 1900, 11900)
    # the generic backend extracts none of these fields from this format
    gen = extract_turn(text, AS_OF)
    assert gen.invoice_number is None
    assert gen.final_total_cents is None


def test_template_dir_env_knob(tmp_path, monkeypatch):
    """OCR_ENGINE_TEMPLATES_DIR swaps the rule packs the extraction
    stage compiles (the INVOICE2DATA_TEMPLATES_DIR analogue made live).
    The stage object is exercised in-process — the same __init__/__call__
    pair Ray runs per actor."""
    import json

    import pyarrow as pa

    from ocr_engine_ray.core.extract import FIELD_BACKENDS
    from ocr_engine_ray.stages.extract import TurnExtractor

    (tmp_path / "quirky.json").write_text(json.dumps({
        "name": "quirky", "keyword": "Quirky Formats GmbH",
        "invoice_number": r"(?m)^Beleg-Nr\.\s*//\s*(\S+)\s*$",
    }))
    monkeypatch.setenv("OCR_ENGINE_TEMPLATES_DIR", str(tmp_path))
    try:
        stage = TurnExtractor(template_tools=("pdf_reader",))
        batch = pa.table({
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["tool"], pa.string()),
            "text": pa.array(["Quirky Formats GmbH\nBeleg-Nr. // QF-1\n"],
                             pa.string()),
            "tool": pa.array(["pdf_reader"], pa.string()),
            "ts": pa.array([0], pa.int64()).cast(pa.timestamp("us")),
        })
        out = stage(batch)
        assert out.column("invoice_number")[0].as_py() == "QF-1"
        assert out.column("vendor_name")[0].as_py() == "Quirky Formats GmbH"
    finally:
        FIELD_BACKENDS.pop("pdf_reader", None)
