"""Dictionary (de)serialization: term/value tables as Parquet.

Parquet replaces the reference's bincode/JSON/protobuf formats
(/root/reference/src/serialization/, trait ``DictionarySerializer``
mod.rs:54-90): the canonical interchange form of a dictionary is its sorted
term table (+ optional value columns), from which any backend rebuilds —
the reference's ``extract_terms`` → ``DictionaryFactory::create`` convert
path (src/serialization/mod.rs:123, src/cli/commands.rs:224-272).

* ``dict_to_table(d)``           — walk the index, emit sorted (term) table
* ``table_to_dict(t, backend)``  — rebuild trie/DAWG from the table
* ``write_dictionary`` / ``read_dictionary`` — Parquet round-trip
"""

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernel import build_dawg, build_trie


def dict_to_table(d) -> pa.Table:
    """Dump a kernel dictionary (Trie/Dawg/MappedTrie) to its sorted term
    table; mapped dictionaries add a ``value`` column (the reference's
    ``MappedDictionary`` serialization carries values alongside terms)."""
    if hasattr(d, "iter_items"):
        items = sorted(d.iter_items())
        return pa.table({
            "term": pa.array([t for t, _ in items], type=pa.string()),
            "value": pa.array([v for _, v in items]),
        })
    terms = sorted(d.iter_terms())
    return pa.table({"term": pa.array(terms, type=pa.string())})


def table_to_dict(t: pa.Table, backend: str = "dawg"):
    """Rebuild a dictionary from a term table (factory-style backend pick,
    reference src/dictionary/factory.rs:35-157)."""
    terms = sorted(set(x for x in t.column("term").to_pylist() if x is not None))
    if backend == "dawg":
        return build_dawg(terms, presorted=True)
    if backend == "trie":
        return build_trie(terms)
    if backend == "array_trie":
        from ..kernel import build_array_trie

        return build_array_trie(terms, presorted=True)
    if backend == "path_map":
        from ..kernel import build_mapped_trie

        if "value" in t.column_names:
            pairs = zip(t.column("term").to_pylist(), t.column("value").to_pylist())
            return build_mapped_trie((term, v) for term, v in pairs if term is not None)
        return build_mapped_trie((term, None) for term in terms)
    raise ValueError(f"unknown dictionary backend: {backend!r}")


def write_dictionary(d, path: str) -> None:
    pq.write_table(dict_to_table(d), path, compression="zstd")


def read_dictionary(path: str, backend: str = "dawg"):
    return table_to_dict(pq.read_table(path), backend)


# ----------------------------------------------------------------------
# Format auto-detection (the reference's cli/detect.rs:52-261 chain:
# user override -> exact magic bytes -> extension -> content heuristic ->
# default).  Formats: parquet (the bincode/protobuf replacement), json,
# text, and gzip-wrapped json/text (the reference's *Gzip variants).
# ----------------------------------------------------------------------
FORMATS = ("parquet", "json", "text", "json_gzip", "text_gzip")


def detect_format(path: str, user_format: str | None = None) -> str:
    import os

    if user_format is not None:
        if user_format not in FORMATS:
            raise ValueError(f"unknown format {user_format!r}")
        return user_format

    # 1. exact: magic bytes
    try:
        with open(path, "rb") as f:
            head = f.read(4)
        if head == b"PAR1":
            return "parquet"
        if head[:2] == b"\x1f\x8b":
            import gzip

            with gzip.open(path, "rb") as g:
                inner = g.read(64).lstrip()
            return "json_gzip" if inner[:1] in (b"[", b"{") else "text_gzip"
    except OSError:
        pass

    # 2. extension
    ext = os.path.splitext(path)[1].lower()
    if ext in (".parquet", ".pq"):
        return "parquet"
    if ext == ".json":
        return "json"
    if ext in (".txt", ".dict", ".dat"):
        return "text"

    # 3. content heuristic
    try:
        with open(path, "rb") as f:
            first = f.read(64).lstrip()
        if first[:1] in (b"[", b"{"):
            return "json"
    except OSError:
        pass

    # 4. default
    return "text"


def read_terms(path: str, fmt: str | None = None) -> list[str]:
    """Load a sorted distinct term list from any supported format."""
    import gzip
    import json

    fmt = detect_format(path, fmt)
    if fmt == "parquet":
        return sorted(set(pq.read_table(path).column("term").to_pylist()))
    opener = gzip.open if fmt.endswith("_gzip") else open
    with opener(path, "rt", encoding="utf-8") as f:
        if fmt.startswith("json"):
            data = json.load(f)
            terms = data if isinstance(data, list) else sorted(data)
        else:
            terms = [line.strip() for line in f if line.strip()]
    return sorted(set(terms))


def write_terms(terms, path: str, fmt: str | None = None) -> None:
    """Write a term list in the format implied by ``fmt``/extension."""
    import gzip
    import json
    import os

    if fmt is None:
        ext = os.path.splitext(path)[1].lower()
        if path.endswith((".json.gz",)):
            fmt = "json_gzip"
        elif ext == ".gz":
            fmt = "text_gzip"
        elif ext in (".parquet", ".pq"):
            fmt = "parquet"
        elif ext == ".json":
            fmt = "json"
        else:
            fmt = "text"
    terms = sorted(set(terms))
    if fmt == "parquet":
        pq.write_table(
            pa.table({"term": pa.array(terms, type=pa.string())}), path,
            compression="zstd",
        )
        return
    opener = gzip.open if fmt.endswith("_gzip") else open
    with opener(path, "wt", encoding="utf-8") as f:
        if fmt.startswith("json"):
            json.dump(terms, f)
        else:
            f.write("\n".join(terms) + ("\n" if terms else ""))
