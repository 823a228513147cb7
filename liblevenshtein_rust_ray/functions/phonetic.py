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


# (pattern, replacement, context, weight) — order matters (reference
# rules.rs:245-292; sequential application is NOT confluent, Theorem 3).
# The digraph outputs use the reference's single symbols: 'ç' (tsh) and
# '$' (sh).  The full zompist set is 13 rules: 8 orthography (weight 0.0),
# 3 phonetic approximations (weight 0.15), 2 test rules used by the
# non-confluence theorem.
ORTHOGRAPHY_RULES = [
    ("ch", "ç", "any", 0.0),                    # rules.rs:296 ch → ç
    ("sh", "$", "any", 0.0),                    # rules.rs:307 sh → $
    ("ph", "f", "any", 0.0),                    # rules.rs:318 ph → f
    ("c", "s", "before_front_vowel", 0.0),      # rules.rs:329 c → s / _[ie]
    ("c", "k", "any", 0.0),                     # rules.rs:340 c → k elsewhere
    ("g", "j", "before_front_vowel", 0.0),      # rules.rs:351 g → j / _[ie]
    ("e", "", "word_final", 0.0),               # rules.rs:362 e → ∅ / _#
    ("gh", "", "any", 0.0),                     # rules.rs:373 gh → ∅
]

PHONETIC_RULES = [
    ("th", "t", "any", 0.15),                   # rules.rs:384
    ("qu", "kw", "any", 0.15),                  # rules.rs:395
    ("kw", "qu", "any", 0.15),                  # rules.rs:406 (reverse)
]

TEST_RULES = [
    ("x", "yy", "any", 0.0),                    # rules.rs:417 (expansion)
    ("y", "z", "any", 0.0),                     # rules.rs:428
]


def zompist_rules():
    """All 13 rules in reference order (rules.rs:286-292)."""
    return ORTHOGRAPHY_RULES + PHONETIC_RULES + TEST_RULES


def apply_rules_seq(rules, word: str, fuel: int = 1000) -> str:
    """Apply each rule once, in order (each rule is a single full scan; the
    fuel bound caps total effective rule applications, mirroring the
    reference's termination guarantee — fuel=0 is the identity,
    properties.rs prop_zero_fuel_identity)."""
    spent = 0
    for pattern, replacement, context, _w in rules:
        if spent >= fuel:
            break
        before = word
        word = _apply_rule(word, pattern, replacement, context)
        if word != before:
            spent += 1
    return word


def rewrite_weight(rules, word: str) -> float:
    """Total weight of the rules that fired on ``word`` (the approximate-
    rule cost the reference attaches to phonetic matches)."""
    total = 0.0
    for pattern, replacement, context, w in rules:
        nxt = _apply_rule(word, pattern, replacement, context)
        if nxt != word:
            total += w
        word = nxt
    return total


def phonetic_normalize(word: str) -> str:
    """orthography + forward phonetic rules over a lowercased word (the
    normalize-then-match form).  The reverse rule kw→qu and the 2 test
    rules are excluded: sequentially kw→qu would undo qu→kw (the rule SET
    carries both directions for the matching side; the non-confluence
    theorem is exactly about such order sensitivity)."""
    return apply_rules_seq(ORTHOGRAPHY_RULES + PHONETIC_RULES[:2], word.lower())
