"""Restricted substitution sets: zero-cost character equivalences.

Capability port of the reference's ``SubstitutionSet`` presets and policies
(/root/reference/src/transducer/substitution_set.rs:156-640,
substitution_policy.rs): a policy's ``is_allowed(dict_unit, query_unit)`` is
consulted when building the characteristic vector, so allowed substitutions
match with NO edit cost (transition.rs:49-67).

Pairs are directional (dict char, query char); presets include both
directions where appropriate (mirroring the reference's preset tables
substitution_set.rs:414-510).  Works for ``str`` units and ``bytes`` units
(ints) — pairs are stored as characters and looked up accordingly.
"""


class SubstitutionSet:
    """Unrestricted-by-default set of allowed (dict_char, query_char)
    zero-cost substitutions."""

    def __init__(self, pairs=()):
        self._pairs = set()
        for a, b in pairs:
            self.allow(a, b)

    def allow(self, a, b) -> None:
        """Allow dictionary char ``a`` to match query char ``b`` for free.
        NOT symmetric — add both directions for bidirectional equivalence."""
        self._pairs.add((a, b))

    def is_allowed(self, dict_unit, query_unit) -> bool:
        if isinstance(dict_unit, int):  # bytes-mode units
            dict_unit = chr(dict_unit)
        if isinstance(query_unit, int):
            query_unit = chr(query_unit)
        return (dict_unit, query_unit) in self._pairs

    def __len__(self) -> int:
        return len(self._pairs)

    def __or__(self, other: "SubstitutionSet") -> "SubstitutionSet":
        out = SubstitutionSet()
        out._pairs = self._pairs | other._pairs
        return out


def _sym(*pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def phonetic_basic() -> SubstitutionSet:
    """f/p, c/k, c/s, s/z, a/e, i/y (reference substitution_set.rs:414-430)."""
    return SubstitutionSet(
        _sym(("f", "p"), ("c", "k"), ("c", "s"), ("s", "z"), ("a", "e"), ("i", "y"))
    )


def keyboard_qwerty() -> SubstitutionSet:
    """Adjacent-key QWERTY substitutions (substitution_set.rs:432-470)."""
    rows = ["qwertyuiop", "asdfghjkl", "zxcvbnm"]
    pairs = []
    for row in rows:
        for a, b in zip(row, row[1:]):
            pairs.extend(_sym((a, b)))
    # vertical adjacencies (the reference's hand-picked set)
    for a, b in [("q", "a"), ("w", "s"), ("e", "d"), ("r", "f"), ("t", "g"),
                 ("y", "h"), ("u", "j"), ("i", "k"), ("o", "l")]:
        pairs.extend(_sym((a, b)))
    return SubstitutionSet(pairs)


def leet_speak() -> SubstitutionSet:
    """e/3, a/@, a/4, o/0, i/1, l/1, s/$, s/5, t/7, b/8, g/9
    (substitution_set.rs:472-485)."""
    return SubstitutionSet(
        _sym(("e", "3"), ("a", "@"), ("a", "4"), ("o", "0"), ("i", "1"),
             ("l", "1"), ("s", "$"), ("s", "5"), ("t", "7"), ("b", "8"),
             ("g", "9"))
    )


def ocr_friendly() -> SubstitutionSet:
    """0/O, 0/o, 1/I, 1/l, I/l, 8/B, 5/S, 6/G, 2/Z
    (substitution_set.rs:487-510)."""
    return SubstitutionSet(
        _sym(("0", "O"), ("0", "o"), ("1", "I"), ("1", "l"), ("I", "l"),
             ("8", "B"), ("5", "S"), ("6", "G"), ("2", "Z"))
    )


PRESETS = {
    "phonetic_basic": phonetic_basic,
    "keyboard_qwerty": keyboard_qwerty,
    "leet_speak": leet_speak,
    "ocr_friendly": ocr_friendly,
}
