"""Deterministic synthetic transcript corpus (FIXTURES.md §F1).

Schema (BASELINE.json ``input_hint``)::

    conv_id:string  turn_idx:int32  role:string  text:string
    tool:string     ts:timestamp[us]

Properties exercised (each maps to a reference behavior under test):

- HTML turns with nav/header/footer/script boilerplate around a main body
- invoice-ish fields: ``Invoice Number: INV-…``, Subtotal/Tax/Total
  amounts, dates drawn from ≥5 pattern families, ``key: value`` lines,
  pipe tables with ≥4 columns (line items)
- %PDF-LAYOUT payloads with out-of-order positioned fragments (reading
  order reconstruction) and multi-page turns
- markdown payloads (headings, lists, links, fences, tables)
- malformed payloads (truncated HTML, empty, control-char noise)
- 2 "hot" conversations holding ~30 % of all turns (skew / salting)
- exact duplicate rows (dedup), future dates and >10000 totals and >20
  item tables (anomaly flags)

Determinism: every conversation derives its own ``random.Random`` from
``(seed, conv_ordinal)``, so the corpus is identical regardless of how
generation is chunked or parallelized.  Nothing reads the wall clock.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = datetime(2025, 1, 1, 0, 0, 0)
ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("", "browser", "pdf_reader", "search", "calculator")

_WORDS = (
    "ledger quarterly statement shipment payment vendor account service "
    "contract renewal summary analysis review request response detail "
    "report schedule delivery estimate approval notice record update"
).split()

_VENDORS = [
    ("Acme Supplies Inc", "12 Industrial Way", "Springfield, IL 62704"),
    ("Globex Corporation", "800 Market Street", "Portland, OR 97201"),
    ("Initech LLC", "45 Commerce Blvd", "Austin, TX 73301"),
    ("Umbrella Trading Co", "9 Harbor Road", "Boston, MA 02110"),
    ("Stark Industrial", "1 Tower Plaza", "New York, NY 10001"),
]

_DATE_RENDERERS = (  # ≥5 of the reference's pattern families
    lambda d: d.strftime("%d/%m/%Y"),
    lambda d: d.strftime("%Y-%m-%d"),
    lambda d: d.strftime("%Y%m%d"),
    lambda d: d.strftime("%d %b %Y"),
    lambda d: d.strftime("%b %d, %Y"),
    lambda d: d.strftime("%d.%m.%Y"),
    lambda d: d.strftime("%m-%d-%Y"),
)


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _invoice_block(rng: random.Random, anomalous: bool) -> list[str]:
    """Lines carrying the extractable fields."""
    from datetime import date as _date

    inv_no = f"INV-{rng.randrange(10000, 99999)}"
    d = _date(2024, 1, 1) + timedelta(days=rng.randrange(0, 700))
    if anomalous and rng.random() < 0.5:
        d = _date(2027, 1, 1) + timedelta(days=rng.randrange(0, 300))  # future
    render = rng.choice(_DATE_RENDERERS)
    n_items = rng.randrange(22, 30) if (anomalous and rng.random() < 0.5) else rng.randrange(1, 6)
    items, qty_total = [], 0
    subtotal_c = 0
    for i in range(n_items):
        qty = rng.randrange(1, 9)
        unit_c = rng.randrange(100, 50000)
        tot_c = qty * unit_c
        subtotal_c += tot_c
        items.append(f"{_sentence(rng, 2)} | {qty} | {unit_c//100}.{unit_c%100:02d} | {tot_c//100}.{tot_c%100:02d}")
        qty_total += qty
    if anomalous and rng.random() < 0.5:
        subtotal_c = max(subtotal_c, 1_500_000)  # >10000.00 total
    tax_c = subtotal_c // 10
    final_c = subtotal_c + tax_c
    vendor = rng.choice(_VENDORS)
    lines = [
        vendor[0],
        vendor[1],
        vendor[2],
        f"Invoice Number: {inv_no}",
        f"Invoice Date: {render(d)}",
        "Description | Qty | Unit Price | Total",
        *items,
        f"Subtotal: ${subtotal_c//100}.{subtotal_c%100:02d}",
        f"Tax: ${tax_c//100}.{tax_c%100:02d}",
        f"Total: ${final_c//100}.{final_c%100:02d}",
        f"reference: {_sentence(rng, 3)}",
    ]
    return lines


def _as_html(rng: random.Random, body_lines: list[str]) -> str:
    nav = "".join(f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, 5))
    rows = [ln for ln in body_lines if " | " in ln]
    paras = [ln for ln in body_lines if " | " not in ln]
    table_html = ""
    if rows:
        trs = "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in r.split(" | ")) + "</tr>"
            for r in rows
        )
        table_html = f"<table>{trs}</table>"
    ps = "".join(f"<p>{ln}</p>" for ln in paras)
    return (
        "<!DOCTYPE html><html><head><title>doc</title>"
        "<script>var x=1;</script><style>p{margin:0}</style></head>"
        f"<body><nav>{nav}</nav><header>{_sentence(rng,4)} menu</header>"
        f"<div class='main'>{ps}{table_html}</div>"
        f"<aside>{_sentence(rng,6)}</aside>"
        f"<footer>© 2025 {_sentence(rng,2)} <a href='/terms'>terms</a></footer>"
        "</body></html>"
    )


def _as_markdown(rng: random.Random, body_lines: list[str]) -> str:
    out = [f"# {_sentence(rng, 3)}", ""]
    for ln in body_lines:
        if " | " in ln:
            out.append("| " + ln.replace(" | ", " | ") + " |")
        elif ":" in ln:
            out.append(f"- **{ln}**")
        else:
            out.append(ln)
    out.append(f"[details]({_sentence(rng,1)}.example) and `{_sentence(rng,2)}`")
    return "\n".join(out)


def _as_pdf_layout(rng: random.Random, body_lines: list[str]) -> str:
    n_pages = rng.randrange(1, 4)
    per_page = max(1, len(body_lines) // n_pages)
    out = ["%PDF-LAYOUT 1.0"]
    for p in range(n_pages):
        out.append(f"@page {p + 1}")
        chunk = body_lines[p * per_page:(p + 1) * per_page] if p < n_pages - 1 else body_lines[p * per_page:]
        frags = []
        y = 720
        for ln in chunk:
            if " | " in ln:
                # table rows stay one fragment so the shared "a | b | c"
                # table shape survives reading-order reconstruction
                frags.append((72, y, ln))
            elif rng.random() < 0.4 and len(ln) > 20:
                # split a prose line into two fragments on one visual line
                # (jittered y within LINE_TOLERANCE) — must be re-merged
                cut = len(ln) // 2
                cut = ln.rfind(" ", 0, cut) if " " in ln[:cut] else cut
                frags.append((72, y + rng.choice((-2, 0, 2)), ln[:cut].strip()))
                frags.append((300, y, ln[cut:].strip()))
            else:
                frags.append((72 + rng.randrange(0, 40), y, ln))
            y -= rng.randrange(12, 20)
        rng.shuffle(frags)  # out-of-order fragments: reading order must be rebuilt
        out.extend(f"{x},{yy}:{t}" for x, yy, t in frags)
    return "\n".join(out)


def _as_malformed(rng: random.Random, body_lines: list[str]) -> str:
    kind = rng.randrange(3)
    base = "\n".join(body_lines)
    if kind == 0:
        return "<html><body><div><p>" + base[: max(5, len(base) // 3)]  # truncated html
    if kind == 1:
        return ""  # empty payload
    return base[:200] + "\x00\x07\x1b[31m" + base[200:240]  # control-char noise


def _conv_turns(conv_ord: int, conv_id: str, n_turns: int, seed: int) -> list[dict]:
    rng = random.Random((seed << 20) ^ conv_ord)
    ts = BASE_TS + timedelta(seconds=conv_ord * 977)
    rows = []
    for t in range(n_turns):
        role = ROLES[rng.randrange(len(ROLES))] if t else "user"
        tool = rng.choice(TOOLS) if role == "tool" else ""
        r = rng.random()
        has_invoice = rng.random() < 0.45 and role in ("assistant", "tool")
        anomalous = rng.random() < 0.05
        body = (_invoice_block(rng, anomalous) if has_invoice
                else [_sentence(rng, rng.randrange(6, 18)) for _ in range(rng.randrange(2, 7))])
        if r < 0.30:
            text = _as_html(rng, body)
        elif r < 0.50:
            text = _as_markdown(rng, body)
        elif r < 0.60:
            text = _as_pdf_layout(rng, body)
        elif r < 0.92:
            text = "\n".join(body)
        else:
            text = _as_malformed(rng, body)
        ts += timedelta(seconds=rng.randrange(1, 120))
        rows.append({"conv_id": conv_id, "turn_idx": t, "role": role,
                     "text": text, "tool": tool, "ts": ts})
        # exact duplicate rows (same conv_id/turn_idx/text) for dedup tests
        if rng.random() < 0.01:
            rows.append(dict(rows[-1]))
    return rows


SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def conversation_sizes(n_turns: int, seed: int) -> list[int]:
    """Split ``n_turns`` into conversations: ~30 % in 2 hot conversations
    (skew), the rest in convs of 2–40 turns."""
    rng = random.Random(seed ^ 0x5EED)
    hot = max(1, int(n_turns * 0.15))
    sizes = [hot, hot]
    remaining = n_turns - 2 * hot
    while remaining > 0:
        s = min(remaining, rng.randrange(2, 41))
        sizes.append(s)
        remaining -= s
    return sizes


def generate_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    """Build the corpus as one Arrow table, rows shuffled across
    conversations (the pipeline must not rely on input order)."""
    sizes = conversation_sizes(n_turns, seed)
    rows: list[dict] = []
    for ord_, size in enumerate(sizes):
        conv_id = f"conv-{seed}-{ord_:06d}"
        rows.extend(_conv_turns(ord_, conv_id, size, seed))
    random.Random(seed ^ 0xC0FFEE).shuffle(rows)
    cols = {name: [r[name] for r in rows] for name in SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=SCHEMA)


def materialize_transcripts(out_dir: str, n_turns: int, seed: int = 42,
                            n_shards: int = 8) -> list[str]:
    """Write the corpus as ``n_shards`` Parquet shard files (the resume
    unit).  Idempotent: existing complete output is reused."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"shard-{i:05d}.parquet") for i in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return paths
    table = generate_transcripts(n_turns, seed)
    per = (table.num_rows + n_shards - 1) // n_shards
    for i, path in enumerate(paths):
        chunk = table.slice(i * per, per)
        tmp = path + ".tmp"
        pq.write_table(chunk, tmp)
        os.replace(tmp, path)
    return paths
