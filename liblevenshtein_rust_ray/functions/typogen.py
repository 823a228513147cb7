"""Deterministic typo generator — semantics of the reference's
``TypoGenerator`` (/root/reference/src/corpus/generator.rs:35-212): seeded
insert / delete / substitute / transpose edits at a known edit distance.

Used by the fixtures generator (near-duplicate page variants with known
ground-truth distance) and the conformance corpus (FIXTURES.md §4).
"""

import random


class TypoGenerator:
    """Seeded generator of words at a chosen edit distance.

    ``algorithm`` decides which edit set is available: ``transposition``
    includes adjacent swaps (distance 1 under Damerau, 2 under standard) —
    default excludes them so distances are exact under ALL three algorithms.
    """

    ALPHABET = "abcdefghijklmnopqrstuvwxyz"

    def __init__(self, seed: int = 42, allow_transpose: bool = False):
        self.rng = random.Random(seed)
        self.allow_transpose = allow_transpose

    def one_edit(self, word: str) -> str:
        ops = ["insert", "delete", "substitute"]
        if self.allow_transpose and len(word) >= 2:
            ops.append("transpose")
        if not word:
            ops = ["insert"]
        elif len(word) <= 1:
            ops = ["insert", "substitute"]
        op = self.rng.choice(ops)
        i = self.rng.randrange(len(word) + 1 if op == "insert" else len(word))
        if op == "insert":
            c = self.rng.choice(self.ALPHABET)
            return word[:i] + c + word[i:]
        if op == "delete":
            return word[:i] + word[i + 1 :]
        if op == "substitute":
            c = self.rng.choice([a for a in self.ALPHABET if a != word[i]])
            return word[:i] + c + word[i:][1:]
        # transpose adjacent
        i = self.rng.randrange(len(word) - 1)
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]

    def generate_typos(self, word: str, distance: int) -> str:
        """Apply ``distance`` successive single edits (the result's true edit
        distance may be lower by coincidence; fixtures verify with the DP)."""
        out = word
        for _ in range(distance):
            out = self.one_edit(out)
        return out

    def all_distance_1(self, word: str) -> list[str]:
        """Every distance-1 variant (insert/delete/substitute), mirroring the
        reference's ``all_distance_1`` exhaustive enumeration."""
        out = set()
        for i in range(len(word) + 1):
            for c in self.ALPHABET:
                out.add(word[:i] + c + word[i:])
        for i in range(len(word)):
            out.add(word[:i] + word[i + 1 :])
            for c in self.ALPHABET:
                if c != word[i]:
                    out.add(word[:i] + c + word[i + 1 :])
        out.discard(word)
        return sorted(out)
