"""Canonical text extraction — the §7.0 minimum slice.

One pure, versioned function per row: given ``(html, text)`` produce the
canonical text and title.  The per-row invariant (BASELINE.json input_hint)
is that the extracted text is byte-identical per url across runs and
parallelism levels — guaranteed here by determinism (no environment, no
ordering dependence).

The wide ``html`` binary column is dropped immediately after this stage
(``select_columns``) so shuffle payloads stay narrow (SURVEY.md §7.4).
"""

import re

import pyarrow as pa

EXTRACTOR_VERSION = 1

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text_from_html(html: bytes) -> str:
    """Deterministic tag-stripping extraction: title text then body text,
    whitespace-normalized, title separated by a newline."""
    if not html:
        return ""
    m = _TITLE_RE.search(html)
    title = m.group(1).decode("utf-8", "replace") if m else ""
    body = _TAG_RE.sub(b" ", _TITLE_RE.sub(b" ", html)).decode("utf-8", "replace")
    body = _WS_RE.sub(" ", body).strip()
    title = _WS_RE.sub(" ", title).strip()
    return f"{title}\n{body}" if title else body


def _canonical_text(text: str, html) -> str:
    return text if text else extract_text_from_html(html)


def _title_of(text: str) -> str:
    return text.split("\n", 1)[0].strip().lower()


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: url/warc_ts/lang pass through; emits canonical
    ``text`` and normalized ``title``; drops ``html``."""
    texts = batch.column("text").to_pylist()
    htmls = batch.column("html").to_pylist()
    canon = [_canonical_text(t, h) for t, h in zip(texts, htmls)]
    titles = [_title_of(t) for t in canon]
    out = pa.table(
        {
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(canon, type=pa.string()),
            "title": pa.array(titles, type=pa.string()),
        }
    )
    return out
