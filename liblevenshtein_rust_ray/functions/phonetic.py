"""Phonetic rewrite-rule normalizer — the normalize-then-match pattern.

Capability port of the reference's verified rewrite system
(/root/reference/src/phonetic/application.rs:313-680 ``apply_rules_seq`` with
fuel bound; rule sets rules.rs:246-470: orthography — ph→f, gh→silent,
c→s/k by context, g→j before front vowels, silent final e; phonetic — th→t,
qu→kw).  Rules apply IN ORDER, each scanning left-to-right, with a fuel bound
guaranteeing termination (the property the reference proves in Coq).

This is a stateless per-row normalizer: ``ds.map_batches(PhoneticNormalize)``
before fuzzy matching (README.md:819-834 normalize-then-match).
"""

_FRONT_VOWELS = "ei"


def _apply_rule(word: str, pattern: str, replacement: str, context: str) -> str:
    """One rule, one left-to-right pass."""
    out = []
    i = 0
    n = len(word)
    plen = len(pattern)
    while i < n:
        if word[i : i + plen] == pattern:
            nxt = word[i + plen : i + plen + 1]
            if context == "any":
                ok = True
            elif context == "before_front_vowel":
                ok = nxt in _FRONT_VOWELS and nxt != ""
            elif context == "not_before_front_vowel":
                ok = not (nxt in _FRONT_VOWELS and nxt != "")
            elif context == "word_final":
                ok = i + plen == n
            else:
                raise ValueError(f"unknown context {context!r}")
            if ok:
                out.append(replacement)
                i += plen
                continue
        out.append(word[i])
        i += 1
    return "".join(out)


# (pattern, replacement, context) — order matters (reference rules.rs:16)
ORTHOGRAPHY_RULES = [
    ("ph", "f", "any"),
    ("gh", "", "any"),
    ("c", "s", "before_front_vowel"),
    ("c", "k", "not_before_front_vowel"),
    ("g", "j", "before_front_vowel"),
    ("e", "", "word_final"),
]

PHONETIC_RULES = [
    ("th", "t", "any"),
    ("qu", "kw", "any"),
]


def apply_rules_seq(rules, word: str, fuel: int = 1000) -> str:
    """Apply each rule once, in order (each rule is a single full scan; the
    fuel bound caps total pattern replacements, mirroring the reference's
    termination guarantee)."""
    spent = 0
    for pattern, replacement, context in rules:
        if spent >= fuel:
            break
        before = word
        word = _apply_rule(word, pattern, replacement, context)
        if word != before:
            spent += 1
    return word


def phonetic_normalize(word: str) -> str:
    """orthography + phonetic rule sets over a lowercased word."""
    return apply_rules_seq(ORTHOGRAPHY_RULES + PHONETIC_RULES, word.lower())
