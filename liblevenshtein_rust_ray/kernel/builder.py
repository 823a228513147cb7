"""Fluent, VALIDATED builder APIs — the reference's
``TransducerBuilder`` (/root/reference/src/transducer/builder.rs:40-103)
and ``QueryBuilder`` (builder_api.rs:35-209) surfaces.

The underlying engine stays plain functions (kernel.query) — the builders
add the ergonomic/validating layer the reference exposes publicly:

    t = (TransducerBuilder()
         .dictionary(["apple", "apply"])      # or a prebuilt Trie/Dawg/ArrayTrie
         .algorithm("transposition")
         .backend("array_trie")
         .build())
    hits = (t.query("aple").max_distance(1).ordered().limit(5).execute())

Both builders raise ``BuilderError`` on missing/invalid configuration at
build/execute time (builder.rs:103's Result contract), not deep inside a
traversal.
"""

from .algorithm import ALGORITHMS, STANDARD
from .query import Candidate, ordered_query, query as _query


class BuilderError(ValueError):
    pass


class TransducerBuilder:
    def __init__(self):
        self._dictionary = None
        self._algorithm = STANDARD
        self._backend = "trie"
        self._subst = None

    def dictionary(self, terms_or_dict) -> "TransducerBuilder":
        self._dictionary = terms_or_dict
        return self

    def algorithm(self, algorithm: str) -> "TransducerBuilder":
        if algorithm not in ALGORITHMS:
            raise BuilderError(f"unknown algorithm {algorithm!r}")
        self._algorithm = algorithm
        return self

    def backend(self, backend: str) -> "TransducerBuilder":
        if backend not in ("trie", "dawg", "array_trie"):
            raise BuilderError(f"unknown backend {backend!r}")
        self._backend = backend
        return self

    def substitution(self, subst) -> "TransducerBuilder":
        self._subst = subst
        return self

    def build(self) -> "Transducer":
        if self._dictionary is None:
            raise BuilderError("dictionary is required (builder.rs:103)")
        d = self._dictionary
        if isinstance(d, (list, tuple, set, frozenset)):
            from .arraytrie import build_array_trie
            from .dawg import build_dawg, build_trie

            terms = sorted(set(d))
            if not terms:
                raise BuilderError("dictionary must not be empty")
            d = {"trie": build_trie, "dawg": build_dawg,
                 "array_trie": build_array_trie}[self._backend](terms)
        return Transducer(d, self._algorithm, self._subst)


class Transducer:
    """Built query engine; ``query(term)`` starts a fluent QueryBuilder."""

    def __init__(self, dictionary, algorithm: str = STANDARD, subst=None):
        self.dictionary = dictionary
        self.algorithm = algorithm
        self.subst = subst

    def query(self, term) -> "QueryBuilder":
        return QueryBuilder(self, term)


class QueryBuilder:
    def __init__(self, transducer: Transducer, term):
        self._t = transducer
        self._term = term
        self._n = 2
        self._algorithm = None
        self._prefix = False
        self._ordered = False
        self._limit = None
        self._predicate = None

    def max_distance(self, n: int) -> "QueryBuilder":
        if n < 0:
            raise BuilderError("max_distance must be >= 0")
        self._n = n
        return self

    def algorithm(self, algorithm: str) -> "QueryBuilder":
        if algorithm not in ALGORITHMS:
            raise BuilderError(f"unknown algorithm {algorithm!r}")
        self._algorithm = algorithm
        return self

    def prefix_mode(self, enabled: bool = True) -> "QueryBuilder":
        self._prefix = enabled
        return self

    def ordered(self) -> "QueryBuilder":
        self._ordered = True
        return self

    def limit(self, n: int) -> "QueryBuilder":
        if n < 0:
            raise BuilderError("limit must be >= 0")
        self._limit = n
        self._ordered = True  # a limit only makes sense on the sorted contract
        return self

    def filter(self, predicate) -> "QueryBuilder":
        self._predicate = predicate
        self._ordered = True
        return self

    def execute(self) -> list[Candidate]:
        alg = self._algorithm or self._t.algorithm
        if self._ordered:
            return ordered_query(
                self._t.dictionary, self._term, self._n, alg,
                prefix_mode=self._prefix, subst=self._t.subst,
                limit=self._limit, predicate=self._predicate,
            )
        return list(_query(self._t.dictionary, self._term, self._n, alg,
                           prefix_mode=self._prefix, subst=self._t.subst))

    def collect_terms(self) -> list:
        """Terms only (builder_api.rs:192 collect_vec)."""
        return [c.term for c in self.execute()]
