"""S8: PDF text extraction (`/root/reference/app/indexer/pdfparser.py:
21-70` uses pdfminer extract_pages/LTTextContainer).

pdfminer is not installed in this container, so the decoder is
import-gated: when pdfminer.six is present it is used exactly like the
reference; otherwise a minimal built-in parser handles UNCOMPRESSED
pdf content streams (literal-string `(...) Tj` / `TJ` show operators),
which is enough for the deterministic synthetic fixtures — and the
Spark-side plumbing (binary column in, Arrow-batched mapInPandas,
typed output) is real either way.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

try:  # pragma: no cover - not available in this sandbox
    from pdfminer.high_level import extract_text as _pdfminer_extract
except Exception:  # ImportError or any pdfminer init failure
    _pdfminer_extract = None

_TJ_RE = re.compile(rb"\((?P<s>(?:\\.|[^\\()])*)\)\s*Tj")
_TJ_ARRAY_RE = re.compile(rb"\[(?P<a>[^\]]*)\]\s*TJ")
_LIT_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
_ESC_RE = re.compile(rb"\\([nrtbf()\\])")
_ESCMAP = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
           b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(lit: bytes) -> bytes:
    return _ESC_RE.sub(lambda m: _ESCMAP[m.group(1)], lit)


def extract_pdf_text(data: bytes | bytearray | None) -> str:
    """Text of one PDF. pdfminer when available (reference parity);
    built-in Tj/TJ literal extraction for uncompressed streams
    otherwise."""
    if not data:
        return ""
    data = bytes(data)
    if _pdfminer_extract is not None:
        import io
        return _pdfminer_extract(io.BytesIO(data))
    parts: list[bytes] = []
    for m in _TJ_RE.finditer(data):
        parts.append(_unescape(m.group("s")))
    for m in _TJ_ARRAY_RE.finditer(data):
        for lit in _LIT_RE.findall(m.group("a")):
            parts.append(_unescape(lit[1:-1]))
    return b" ".join(parts).decode("latin-1", errors="replace")


PDF_TEXT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_chars", T.IntegerType()),
])


def extract_pdf_df(pdf_df: DataFrame, data_col: str = "payload") -> DataFrame:
    """(doc_id, <data_col>: binary) -> (doc_id, text, n_chars) via
    Arrow-batched mapInPandas — same plumbing shape as HTML extraction
    (SURVEY.md §2.1 S7/S8)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[data_col].map(extract_pdf_text)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "text": texts,
                "n_chars": texts.map(len).astype("int32"),
            })

    return (pdf_df.select("doc_id", data_col)
            .mapInPandas(kernel, schema=PDF_TEXT_SCHEMA))


def synth_pdf(text: str) -> bytes:
    """Minimal valid single-page uncompressed PDF showing `text` —
    deterministic fixture for the built-in extractor."""
    esc = (text.replace("\\", r"\\").replace("(", r"\(")
           .replace(")", r"\)"))
    stream = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode("latin-1")
    body = [
        b"%PDF-1.4",
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d >> stream" % len(stream),
        stream,
        b"endstream endobj",
        b"trailer << /Root 1 0 R >>",
        b"%%EOF",
    ]
    return b"\n".join(body)
