"""Algorithm variants of the Levenshtein automaton.

Mirrors the reference's ``Algorithm`` enum
(/root/reference/src/transducer/algorithm.rs:15-43):

* ``standard``       — insert / delete / substitute (classic Levenshtein)
* ``transposition``  — adds adjacent-swap as one edit (Damerau / OSA)
* ``merge_and_split``— adds merge (two query chars -> one dict char) and
  split (one query char -> two dict chars), each costing one edit
"""

STANDARD = "standard"
TRANSPOSITION = "transposition"
MERGE_AND_SPLIT = "merge_and_split"

ALGORITHMS = (STANDARD, TRANSPOSITION, MERGE_AND_SPLIT)


def validate_algorithm(algorithm: str) -> str:
    if algorithm not in ALGORITHMS:
        raise ValueError(f"unknown algorithm {algorithm!r}; expected one of {ALGORITHMS}")
    return algorithm
