"""Pure-Python Levenshtein-automaton kernel (no Ray).

Re-implements the query/data semantics of universal-automata/liblevenshtein-rust
(the reference at /root/reference) from its published behavior: Schulz & Mihov
(2002) Levenshtein automata with the Standard, Transposition and MergeAndSplit
transition tables, subsumption-minimal states, trie/DAWG dictionaries and the
intersected automaton-dictionary traversal.

This module is deliberately Ray-free: it is the per-block scoring kernel that
Ray Data actor pools call inside ``map_groups`` / ``map_batches``.  Parallelism
lives *across* blocks, never inside a traversal (reference keeps per-query
state strictly single-threaded, see /root/reference/src/transducer/pool.rs:43-47).
"""

from .algorithm import STANDARD, TRANSPOSITION, MERGE_AND_SPLIT, ALGORITHMS
from .position import subsumes
from .state import (
    state_insert,
    infer_distance,
    infer_prefix_distance,
    min_distance,
)
from .transition import (
    initial_state,
    transition_state,
    characteristic_vector,
)
from .distance import (
    standard_distance,
    transposition_distance,
    merge_and_split_distance,
    distance_fn,
    strip_common_affixes,
    MemoCache,
)
from .dawg import Trie, Dawg, build_trie, build_dawg
from .arraytrie import ArrayTrie, batched_query, build_array_trie
from .pathmap import MappedTrie, build_mapped_trie
from .zipper import Zipper, with_prefix
from .bloom import BloomFilter, BloomBackedDict
from .query import query, ordered_query, Candidate
from .automaton import LevenshteinAutomaton
from .builder import TransducerBuilder, QueryBuilder, Transducer, BuilderError

__all__ = [
    "STANDARD",
    "TRANSPOSITION",
    "MERGE_AND_SPLIT",
    "ALGORITHMS",
    "subsumes",
    "state_insert",
    "infer_distance",
    "infer_prefix_distance",
    "min_distance",
    "initial_state",
    "transition_state",
    "characteristic_vector",
    "standard_distance",
    "transposition_distance",
    "merge_and_split_distance",
    "distance_fn",
    "strip_common_affixes",
    "MemoCache",
    "Trie",
    "Dawg",
    "build_trie",
    "build_dawg",
    "ArrayTrie",
    "build_array_trie",
    "batched_query",
    "MappedTrie",
    "build_mapped_trie",
    "Zipper",
    "with_prefix",
    "query",
    "ordered_query",
    "Candidate",
    "LevenshteinAutomaton",
    "TransducerBuilder",
    "QueryBuilder",
    "Transducer",
    "BuilderError",
]
