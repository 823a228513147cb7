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
    """Dump a kernel dictionary (Trie/Dawg) to its sorted term table."""
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
    raise ValueError(f"unknown dictionary backend: {backend!r}")


def write_dictionary(d, path: str) -> None:
    pq.write_table(dict_to_table(d), path, compression="zstd")


def read_dictionary(path: str, backend: str = "dawg"):
    return table_to_dict(pq.read_table(path), backend)
