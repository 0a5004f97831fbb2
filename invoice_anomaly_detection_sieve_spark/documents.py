"""Span → typed-column extraction for the interleaved documents table.

The engine's only input is ``(doc_id string, spans array<struct<kind, text,
media_ref, offset>>)`` (BASELINE.json input_hint). This module derives the
typed header/line columns every constraint consumes — the Spark analog of
the reference's relational layout (``invoices`` header columns +
``invoice_lines`` child rows, app/schema.sql:21-61) — as pure Column
expressions so extraction is one codegen'd projection with zero shuffles
and zero Python.

The partition key is *derived*, not stored: prefix of ``doc_id`` before the
first '-' (≈ ``vendor_id`` scoping every reference check,
app/retrieval.py:20).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import normalize as N

LINE_JSON_SCHEMA = "desc string, qty double, unit_price double, amount double, sku string"


def part_of(doc_id: Column) -> Column:
    """Derived partition key: doc_id prefix before the first '-'."""
    return F.substring_index(doc_id, "-", 1)


def _offset_cmp(a: Column, b: Column) -> Column:
    return F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0)


def spans_of_kind(spans: Column, kind: str) -> Column:
    """Offset-ordered spans of one kind."""
    return F.array_sort(F.filter(spans, lambda s: s["kind"] == kind), _offset_cmp)


def first_span_text(spans: Column, kind: str) -> Column:
    """text of the first span of a kind (F.get is null-safe on empty
    arrays even under ANSI mode)."""
    return F.get(spans_of_kind(spans, kind), 0)["text"]


def first_span_media(spans: Column, kind: str) -> Column:
    return F.get(spans_of_kind(spans, kind), 0)["media_ref"]


def numeric_span_text(spans: Column, kind: str) -> Column:
    """First span text of a kind coerced to double (try_cast: junk ⇒ null,
    never an ANSI error — the analog of the reference's tolerant
    ``_to_float``, app/features.py:11-17)."""
    return first_span_text(spans, kind).try_cast("double")


def all_media_refs(spans: Column) -> Column:
    """Every non-null media_ref in span order (for the referential check)."""
    ordered = F.array_sort(spans, _offset_cmp)
    return F.filter(F.transform(ordered, lambda s: s["media_ref"]), lambda r: r.isNotNull())


def lines_col(spans: Column) -> Column:
    """Ordered array of parsed line payloads + desc_norm.

    Line spans carry JSON ``{"desc","qty","unit_price","amount","sku"}`` in
    ``text``; order is the offset order (≈ ORDER BY line_no,
    app/main.py:59). ``from_json`` is lenient: junk ⇒ null fields.
    """
    ordered = spans_of_kind(spans, "line")
    parsed = F.transform(ordered, lambda s: F.from_json(s["text"], LINE_JSON_SCHEMA))
    return F.transform(
        parsed,
        lambda p: F.struct(
            p["desc"].alias("desc"),
            p["qty"].alias("qty"),
            p["unit_price"].alias("unit_price"),
            p["amount"].alias("amount"),
            N.desc_norm(p["desc"]).alias("desc_norm"),
        ),
    )


def extract_docs(documents: DataFrame) -> DataFrame:
    """Two staged projections: documents → typed per-doc columns.

    Output: part, doc_id, invnum_raw, invnum_norm, po, total, tax_total,
    currency, date, payee, media_key, pdf_hash, media_refs, lines, n_lines,
    line_amount_sum, desc_blob, spans, span_canon.

    Staging matters: ``lines`` (the JSON parse) is consumed by four
    downstream expressions (lines, n_lines, line_amount_sum, desc_blob).
    Emitting it in a first projection and referencing the *attribute* in a
    second one makes Catalyst keep the projects separate (CollapseProject
    refuses to duplicate a non-cheap expression referenced more than once),
    so the parse runs once per row instead of four times. Higher-order
    lambdas must always traverse attributes, never expression trees — an
    expression inside a lambda body is re-evaluated per array element.
    """
    spans = F.col("spans")
    stage1 = documents.select(
        part_of(F.col("doc_id")).alias("part"),
        F.col("doc_id"),
        first_span_text(spans, "header").alias("invnum_raw"),
        first_span_text(spans, "po").alias("po"),
        numeric_span_text(spans, "amount").alias("total"),
        numeric_span_text(spans, "tax").alias("tax_total"),
        first_span_text(spans, "currency").alias("currency"),
        F.try_to_timestamp(first_span_text(spans, "date")).cast("date").alias("date"),
        first_span_text(spans, "payee").alias("payee"),
        first_span_media(spans, "media").alias("media_key"),
        first_span_media(spans, "pdf").alias("pdf_hash"),
        all_media_refs(spans).alias("media_refs"),
        lines_col(spans).alias("lines"),
        F.col("spans"),
        N.span_canonical(spans).alias("span_canon"),
    )
    lines = F.col("lines")  # attribute reference: parsed exactly once
    return stage1.select(
        "*",
        N.invnum_norm(F.col("invnum_raw")).alias("invnum_norm"),
        F.size(lines).alias("n_lines"),
        F.aggregate(
            lines, F.lit(0.0), lambda acc, l: acc + F.coalesce(l["amount"], F.lit(0.0))
        ).alias("line_amount_sum"),
        F.array_join(
            F.transform(lines, lambda l: F.coalesce(l["desc_norm"], F.lit(""))), " "
        ).alias("desc_blob"),
    )
