"""Export / row-shaping pipeline — re-expression of the reference's
exporter (``app/utils/exporter.py``).

``shape_export_rows`` is S9 (``_create_dataframe_sync``, :38-84): one
flat row per record with the address concatenated and the per-record
line-item rollup (Σqty, Σtotal, avg unit price) — the same 12-column
layout, field-mapped to the transcript substrate:

    Filename→conv_id/turn_idx, Invoice Number, Vendor Name, Address,
    Invoice Date, Grand Total, Taxes, Final Total, Quantity, Unit Price,
    Total, Pages

Money renders as canonical 2-decimal strings (the reference's
``float_format='%.2f'``, :94) from exact cents.

Sinks: Parquet (primary, distributed, partitioned), CSV (distributed,
``Dataset.write_csv``), Excel (S8 — driver-side report sink on the
stdlib SpreadsheetML writer in ``core/xlsx.py``; styled sheet matching
exporter.py:99-119, no openpyxl required)."""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset

from ..core.money import cents_to_str

EXPORT_COLUMNS = [
    "filename", "invoice_number", "vendor_name", "address", "invoice_date",
    "grand_total", "taxes", "final_total", "quantity", "unit_price",
    "total", "pages",
]


def shape_export_batch(batch: pa.Table) -> pa.Table:
    rows = batch.select([
        "conv_id", "turn_idx", "invoice_number", "vendor_name",
        "vendor_street", "vendor_city", "vendor_state", "vendor_postal",
        "invoice_date", "grand_total_cents", "taxes_cents",
        "final_total_cents", "items_qty", "items_total_cents",
        "items_avg_unit_price_cents", "pages",
    ]).to_pylist()
    out: dict[str, list] = {c: [] for c in EXPORT_COLUMNS}
    for r in rows:
        # address concat, empty parts dropped (exporter.py:41-49)
        parts = [r["vendor_street"], r["vendor_city"], r["vendor_state"],
                 r["vendor_postal"]]
        out["filename"].append(f"{r['conv_id']}#{r['turn_idx']}")
        out["invoice_number"].append(r["invoice_number"] or "")
        out["vendor_name"].append(r["vendor_name"])
        out["address"].append(", ".join(p for p in parts if p))
        out["invoice_date"].append(
            r["invoice_date"].isoformat() if r["invoice_date"] else "")
        out["grand_total"].append(cents_to_str(r["grand_total_cents"]))
        out["taxes"].append(cents_to_str(r["taxes_cents"]))
        out["final_total"].append(cents_to_str(r["final_total_cents"]))
        out["quantity"].append(r["items_qty"])
        out["unit_price"].append(cents_to_str(r["items_avg_unit_price_cents"]))
        out["total"].append(cents_to_str(r["items_total_cents"]))
        out["pages"].append(r["pages"])
    return pa.table({
        **{c: pa.array(out[c], pa.string()) for c in EXPORT_COLUMNS
           if c not in ("quantity", "pages")},
        "quantity": pa.array(out["quantity"], pa.int64()),
        "pages": pa.array(out["pages"], pa.int32()),
    }).select(EXPORT_COLUMNS)


def shape_export_rows(validated: Dataset) -> Dataset:
    return validated.map_batches(shape_export_batch, batch_format="pyarrow")


def write_export(validated: Dataset, out_dir: str, fmt: str = "parquet") -> None:
    """Distributed sinks (S7): a directory of part files, never one giant
    file (resumable layout lives in state/lineage.py)."""
    shaped = shape_export_rows(validated)
    if fmt == "parquet":
        shaped.write_parquet(out_dir)
    elif fmt == "csv":
        shaped.write_csv(out_dir)
    elif fmt == "jsonl":
        # newline-delimited JSON — the interchange format most
        # training-data loaders read; distributed part files like the
        # other sinks (Ray's write_json emits one .json (JSONL-format)
        # file per block)
        shaped.write_json(out_dir)
    else:
        raise ValueError(f"Unsupported export format: {fmt}")


def export_excel(validated: Dataset, path: str,
                 max_rows: int = 1_048_575) -> None:
    """S8 Excel sink (exporter.py:99-119): one 'Invoices' sheet, bold
    header, auto column widths = max cell length + 2 — written by the
    stdlib SpreadsheetML writer (core/xlsx.py; openpyxl isn't in this
    container and isn't needed).  Driver-side like the reference: Excel
    is a REPORT format — the sheet cap is Excel's own 2^20-row limit,
    and big results belong in the parquet/csv sinks."""
    from ..core.xlsx import write_xlsx

    shaped = shape_export_rows(validated)
    rows: list[list] = []
    for b in shaped.iter_batches(batch_size=8192, batch_format="pyarrow"):
        cols = [b.column(c).to_pylist() for c in EXPORT_COLUMNS]
        rows.extend([list(r) for r in zip(*cols)])
        if len(rows) > max_rows:
            raise ValueError(
                f"export_excel: result exceeds {max_rows} rows (Excel sheet "
                "limit); use write_export(..., fmt='parquet'|'csv')")
    write_xlsx(path, EXPORT_COLUMNS, rows, sheet_name="Invoices")


def bundle_export(out_dir: str, zip_path: str) -> str:
    """S10 (result download) minus the HTTP layer: package a finished
    export directory (part files + any lineage manifest) into one
    downloadable ZIP with a content listing — the artifact the
    reference's download endpoint streams (``app.py`` /download,
    ``app/utils/exporter.py`` BytesIO handoff).  Serving it is a web
    framework's job, not the engine's; everything up to the bytes is
    here."""
    import json
    import os
    import zipfile

    names = sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(out_dir) for f in files)
    if not names:
        raise ValueError(f"bundle_export: nothing to bundle in {out_dir}")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        listing = []
        for path in names:
            arc = os.path.relpath(path, out_dir)
            z.write(path, arc)
            listing.append({"name": arc, "bytes": os.path.getsize(path)})
        z.writestr("_LISTING.json", json.dumps(listing, indent=1))
    return zip_path


def flag_unapproved_vendors(validated: Dataset,
                            approved: set[str] | list[str]) -> Dataset:
    """J4 (README unapproved-vendor flagging): broadcast ANTI-join of the
    extracted vendor name against a small approved list — membership
    check inside map_batches, no shuffle.  Adds ``vendor_approved`` and
    keeps only rows that extracted a vendor at all."""
    import ray

    approved_ref = ray.put(frozenset(v.strip().lower() for v in approved))

    def flag(b: pa.Table) -> pa.Table:
        ok = ray.get(approved_ref)
        names = b.column("vendor_name").to_pylist()
        mask = [bool(n and n.strip()) for n in names]
        sub = b.filter(pa.array(mask))
        names = sub.column("vendor_name").to_pylist()
        return sub.append_column(
            "vendor_approved",
            pa.array([n.strip().lower() in ok for n in names], pa.bool_()))

    return validated.map_batches(flag, batch_format="pyarrow")


def write_export_partitioned(ds: Dataset, out_dir: str,
                             partition_cols: list[str]) -> None:
    """Hive-partitioned parquet sink (one directory per key value —
    the brief's resumable-output layout for key-partitioned datasets):
    a failed run can re-process only the missing key directories, and
    readers prune partitions at the path level
    (``read_parquet(out_dir)`` restores the columns from the paths)."""
    ds.write_parquet(out_dir, partition_cols=list(partition_cols))
