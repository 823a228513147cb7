"""Spelling-corpus readers → Datasets (reference corpus parsers as sources).

* ``read_bigtxt``  — big.txt-style raw text → (word, freq) table, the
  word-frequency corpus of /root/reference/src/corpus/parser.rs:37-127
  (``BigTxtCorpus``): lowercase alphanumeric tokens, counted.
* ``read_mitton``  — Mitton-format spelling corpora
  (/root/reference/src/corpus/parser.rs:168-233): lines of ``$correct``
  followed by misspelling lines (optionally ``misspelling freq``), yielding
  the labeled (correction, misspelling, freq) pairs table.

Both are Ray-Data-native: files are read distributed
(``read_binary_files`` keeps each file whole, since Mitton parsing is
stateful across lines within a file), parsing is a ``map_batches`` over the
file payloads, and the word count is a partial-aggregate + groupby-sum.
"""

import pyarrow as pa

from ..functions.tokenize import tokenize


def read_bigtxt(paths):
    """(token, freq) over one or more raw-text files."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_binary_files(paths)

    def count_tokens(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for payload in t.column("bytes").to_pylist():
            c.update(tokenize(payload.decode("utf-8", errors="replace")))
        toks = sorted(c)
        return pa.table(
            {
                "token": pa.array(toks, type=pa.string()),
                "freq": pa.array([c[t_] for t_ in toks], type=pa.int64()),
            }
        )

    # partial counts per file batch, then one small groupby-sum
    return (
        ds.map_batches(count_tokens, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("freq", alias_name="freq"))
    )


def parse_mitton(text: str) -> list[tuple[str, str, int]]:
    """Pure parser: Mitton lines -> [(correct, misspelling, freq)].
    ``$word`` starts a new correction; following non-$ lines are its
    misspellings, optionally ``word count``; ``?`` corrections are kept
    verbatim (unknown-correction marker in the published corpora)."""
    out = []
    correct = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("$"):
            correct = line[1:].strip()
            continue
        if correct is None:
            continue
        parts = line.split()
        if len(parts) == 2 and parts[1].isdigit():
            out.append((correct, parts[0], int(parts[1])))
        else:
            out.append((correct, line, 1))
    return out


def read_mitton(paths):
    """(correct, misspelling, freq) labeled-pairs Dataset."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(t: pa.Table) -> pa.Table:
        cs, ms, fs = [], [], []
        for payload in t.column("bytes").to_pylist():
            for c, m, f in parse_mitton(payload.decode("utf-8", errors="replace")):
                cs.append(c)
                ms.append(m)
                fs.append(f)
        return pa.table(
            {
                "correct": pa.array(cs, type=pa.string()),
                "misspelling": pa.array(ms, type=pa.string()),
                "freq": pa.array(fs, type=pa.int64()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
