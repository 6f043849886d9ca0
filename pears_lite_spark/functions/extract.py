"""HTML -> (title, text, snippet, lang) extraction: the per-row invariant.

The reference extracts with BeautifulSoup + jusText + langdetect
(`/root/reference/app/indexer/htmlparser.py:16-31,78-110`): title from
`<title>`, body = jusText non-boilerplate paragraphs joined with ' '
plus a trailing space, snippet = `body[:300].replace(',','-')`, language
via langdetect. None of those libraries exist in this environment, so
this module is a faithful, deterministic, self-contained reimplementation
of that pipeline using jusText's published classification parameters
(max_link_density=0.3, stopwords_low=0.1, stopwords_high=0.3,
length_low=30, length_high=100 — `htmlparser.py:22-26`):

- paragraphs = text of block-level segments (<p>, <li>, <h*>, <div>,
  <td>, <nav>, <footer>, ...), whitespace-normalized;
- a paragraph is KEPT iff link_density <= 0.3 AND len >= 30 AND
  stopword_density >= 0.1 (jusText's core good/bad split; the
  short/near-good refinement collapses deterministically for our corpus);
- body = kept paragraphs joined by ' ' + trailing ' ' (htmlparser.py:106);
- snippet = body[:300].replace(',', '-') (htmlparser.py:109);
- language = stopword-profile argmax over {en,de,fr,es} ('xx' when no
  profile scores), replacing langdetect (htmlparser.py:98).

The SAME function runs driver-side (pytest oracle) and inside the Arrow
`mapInPandas` UDF (engine) — the parity test asserts byte-identical
output, which is the per-row invariant named in BASELINE.json.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import types as T

MAX_LINK_DENSITY = 0.3
STOPWORDS_LOW = 0.1
STOPWORDS_HIGH = 0.3
LENGTH_LOW = 30
LENGTH_HIGH = 100
SNIPPET_LEN = 300

# compact function-word profiles for the deterministic language id
LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the of and to a in is was as for on with that it by at "
                    "from his he this are be or an were which have".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf des ein "
                    "eine nicht sich dem als auch es an werden aus er".split()),
    "fr": frozenset("le la les de des et un une du en est que pour dans qui "
                    "par sur au plus avec ne se pas ce il".split()),
    "es": frozenset("el la los las de y que en un una del es por con para su "
                    "se no al lo como más pero sus le".split()),
}
STOPWORDS_EN = LANG_STOPWORDS["en"]

_LANGS = ("en", "de", "fr", "es")
# one combined word -> language bitmask map: a single dict probe per
# word instead of four frozenset probes (extraction is the ingest
# hot path — see BASELINE.md; output is byte-identical)
_LANG_MASK: dict[str, int] = {}
for _i, _lg in enumerate(_LANGS):
    for _w in LANG_STOPWORDS[_lg]:
        _LANG_MASK[_w] = _LANG_MASK.get(_w, 0) | (1 << _i)


def _lang_hits(words) -> list[int]:
    """Per-language stopword hit counts: Counter over masks keeps the
    per-word loop in C (<=16 distinct masks to unpack)."""
    from collections import Counter
    counts = [0, 0, 0, 0]
    for m, k in Counter(map(_LANG_MASK.get, words)).items():
        if m:
            if m & 1:
                counts[0] += k
            if m & 2:
                counts[1] += k
            if m & 4:
                counts[2] += k
            if m & 8:
                counts[3] += k
    return counts

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|li|ul|ol|h[1-6]|td|tr|table|nav|footer|header|article|"
    r"section|br|blockquote|pre|body|html)\b[^>]*>",
    re.IGNORECASE,
)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1>",
                        re.IGNORECASE | re.DOTALL)
_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head>", re.IGNORECASE | re.DOTALL)
_WORD_RE = re.compile(r"[\w']+", re.UNICODE)


def _norm_space(s: str) -> str:
    return " ".join(s.split())


def _strip_tags(s: str) -> str:
    if "<" not in s:
        return _norm_space(s)
    return _norm_space(_TAG_RE.sub(" ", s))


def detect_lang(text: str) -> str:
    """Deterministic stopword-profile language id (langdetect stand-in)."""
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return "xx"
    counts = _lang_hits(words)
    best_lang, best_hits = "xx", 0
    for lang, hits in zip(_LANGS, counts):  # fixed order = deterministic ties
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "xx"


def _classify_counted(raw_html_segment: str):
    """(clean_text, keep?, lang_counts|None) for one block segment;
    counts are returned only when computed (kept paragraphs always
    carry them) so extract_html can reuse them for language id."""
    text = _strip_tags(raw_html_segment)
    if not text:
        return "", False, None
    if "<a" in raw_html_segment or "<A" in raw_html_segment:
        link_chars = sum(len(_strip_tags(m))
                         for m in _A_RE.findall(raw_html_segment))
        if link_chars / len(text) > MAX_LINK_DENSITY:
            return text, False, None
    if len(text) < LENGTH_LOW:
        return text, False, None
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if not words:
        return text, False, None
    # jusText runs with a per-language stoplist; we are language-agnostic
    # and take the best-matching known profile (deterministic).
    counts = _lang_hits(words)
    return text, max(counts) / len(words) >= STOPWORDS_LOW, counts


def classify_paragraph(raw_html_segment: str) -> tuple[str, bool]:
    """Return (clean_text, keep?) for one block-level segment."""
    text, keep, _ = _classify_counted(raw_html_segment)
    return text, keep


def extract_html(html: bytes | str) -> tuple[str, str, str, str]:
    """(title, body_text, snippet, lang) — mirrors
    `/root/reference/app/indexer/htmlparser.py:78-110` semantics.

    Language id reuses the per-paragraph stopword counts: the body is
    the kept paragraphs joined by ' ', so summing their counts (plus
    the title's) equals `detect_lang(title + ' ' + body)` exactly —
    no second tokenization pass over the document."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    m = _TITLE_RE.search(html)
    title = _strip_tags(m.group(1)) if m else ""
    body_html = _SCRIPT_RE.sub(" ", _HEAD_RE.sub(" ", html))
    kept: list[str] = []
    totals = _lang_hits(w.lower() for w in _WORD_RE.findall(title)) \
        if title else [0, 0, 0, 0]
    any_word = bool(title and _WORD_RE.search(title))
    for seg in _BLOCK_SPLIT_RE.split(body_html):
        text, keep, counts = _classify_counted(seg)
        if keep:
            kept.append(text)
            any_word = True
            for i in range(4):
                totals[i] += counts[i]
    # join with ' ' and trailing space, per htmlparser.py:104-106
    body = ""
    for p in kept:
        body += p + " "
    snippet = body[:SNIPPET_LEN].replace(",", "-")
    best_lang, best_hits = "xx", 0
    for lang, hits in zip(_LANGS, totals):
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    lang = (best_lang if best_hits > 0 else "xx") if any_word else "xx"
    return title, body, snippet, lang


EXTRACT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("snippet", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def extract_map_in_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel over (url, warc_ts, html) -> EXTRACT_SCHEMA.

    jusText-style extraction is inherently per-document Python; the Arrow
    boundary stays batch-level (SURVEY.md §7 hard-part (a)).
    """
    for pdf in batches:
        rows = pdf["html"].map(extract_html)
        yield pd.DataFrame({
            "url": pdf["url"],
            "warc_ts": pdf["warc_ts"],
            "title": rows.map(lambda r: r[0]),
            "text": rows.map(lambda r: r[1]),
            "snippet": rows.map(lambda r: r[2]),
            "lang": rows.map(lambda r: r[3]),
        })


def extract_df(corpus_df):
    """documents(url, warc_ts, html, ...) -> extracted columns via Arrow."""
    return corpus_df.select("url", "warc_ts", "html").mapInPandas(
        extract_map_in_pandas, schema=EXTRACT_SCHEMA)
