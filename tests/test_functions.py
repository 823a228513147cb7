"""Deterministic scalar functions (no Ray)."""

import numpy as np

from liblevenshtein_rust_ray.functions import (
    tokenize,
    token_count,
    shingles,
    char_ngrams,
    simhash64,
    simhash_bands,
    hamming64,
    minhash_signature,
    minhash_bands,
    TypoGenerator,
    quality_scores,
    langid_ngram,
    rolling_fingerprint,
    phonetic_normalize,
)
from liblevenshtein_rust_ray.functions.minhash import jaccard_estimate
from liblevenshtein_rust_ray.kernel import standard_distance


def test_tokenize():
    assert tokenize("Hello, World! 123") == ["hello", "world", "123"]
    assert token_count("") == 0
    assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingles(["a"], 3) == ["a"]
    assert char_ngrams("abcd", 3) == ["abc", "bcd"]


def test_simhash_deterministic_and_similar():
    a = simhash64(char_ngrams("the quick brown fox jumps", 3))
    b = simhash64(char_ngrams("the quick brown fox jumps", 3))
    assert a == b  # deterministic across calls (and processes: blake2b)
    c = simhash64(char_ngrams("the quick brown fox jumped", 3))
    d = simhash64(char_ngrams("completely different text here", 3))
    assert hamming64(a, c) < hamming64(a, d)
    assert len(simhash_bands(a, 4)) == 4
    assert sum(b << (16 * i) for i, b in enumerate(simhash_bands(a, 4))) == a


def test_minhash_jaccard():
    s1 = set(shingles(tokenize("a b c d e f g h i j k l m n o p"), 2))
    s2 = set(shingles(tokenize("a b c d e f g h i j k l m n o q"), 2))
    sig1 = minhash_signature(sorted(s1))
    sig2 = minhash_signature(sorted(s2))
    true_j = len(s1 & s2) / len(s1 | s2)
    est = jaccard_estimate(sig1, sig2)
    assert abs(est - true_j) < 0.3
    assert jaccard_estimate(sig1, sig1) == 1.0
    assert len(minhash_bands(sig1, 16)) == 16
    assert minhash_bands(sig1, 16) == minhash_bands(sig1, 16)


def test_typogen_deterministic_distance():
    g1 = TypoGenerator(seed=7)
    g2 = TypoGenerator(seed=7)
    w = "reference"
    assert g1.generate_typos(w, 2) == g2.generate_typos(w, 2)
    for d in (1, 2):
        t = TypoGenerator(seed=d).generate_typos(w, d)
        assert standard_distance(w, t) <= d
    v = TypoGenerator().all_distance_1("ab")
    assert all(standard_distance("ab", x) == 1 for x in v)
    assert "aab" in v and "b" in v and "ac" in v


def test_quality_scores():
    q = quality_scores("The quick brown fox, it jumps!")
    assert q["n_tokens"] == 6
    assert q["n_chars"] == 30
    assert 0 < q["punct_ratio"] < 0.2
    assert q["stopword_ratio"] > 0
    assert quality_scores("")["n_tokens"] == 0


def test_langid():
    assert langid_ngram("the cat and the dog are in the house of things") == "en"
    assert langid_ngram("der hund und die katze sind schön in einem haus") == "de"
    assert langid_ngram("xz") == "und"


def test_fingerprint():
    fp = rolling_fingerprint("some document text " * 20)
    assert fp == rolling_fingerprint("some document text " * 20)
    assert len(fp) <= 8
    assert rolling_fingerprint("") == []


def test_phonetic():
    assert phonetic_normalize("phone") == "fon"       # ph->f, final e dropped
    assert phonetic_normalize("night") == "nit"       # gh silent
    assert phonetic_normalize("cent") == "sent"       # c->s before front vowel
    assert phonetic_normalize("cat") == "kat"         # c->k elsewhere
    assert phonetic_normalize("queen") == "kween"     # qu->kw
    # normalize-then-match: variants collapse
    assert phonetic_normalize("fone") == phonetic_normalize("phone")


# ---------------------------------------------------------------------------
# Zompist 13-rule set: property tests mirroring the reference's 5 Coq
# theorems (src/phonetic/properties.rs, docs/verification/phonetic/
# zompist_rules.v).
# ---------------------------------------------------------------------------
def _rand_word(rng, k=10):
    import string

    return "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(0, k)))


def test_zompist_rule_count_and_golden():
    """Rule-by-rule golden results over the full 13-rule set
    (rules.rs:286-292): digraphs, context rules, silent letters, test rules."""
    from liblevenshtein_rust_ray.functions.phonetic import (
        ORTHOGRAPHY_RULES,
        PHONETIC_RULES,
        TEST_RULES,
        apply_rules_seq,
        zompist_rules,
    )

    assert len(zompist_rules()) == 13
    assert len(ORTHOGRAPHY_RULES) == 8
    assert len(PHONETIC_RULES) == 3
    assert len(TEST_RULES) == 2

    z = lambda w: apply_rules_seq(zompist_rules(), w)
    assert z("church") == "çurç"        # ch -> ç (both)
    assert z("shash") == "$a$"          # sh -> $
    assert z("philosophy") == "filosofz"  # ph -> f (y->z test rule)
    assert z("cent") == "sent"          # c -> s / _[ie]
    assert z("cat") == "kat"            # c -> k elsewhere
    assert z("gem") == "jem"            # g -> j / _[ie]
    assert z("gum") == "gum"            # g unchanged elsewhere
    assert z("late") == "lat"           # silent final e
    assert z("night") == "nit"          # gh silent + th->t n/a
    assert z("think") == "tink"         # th -> t
    assert z("box") == "bozz"           # x -> yy -> zz (test rules, in order)


def test_zompist_wellformed():
    """Theorem 1: every rule has a nonempty pattern and a known context."""
    from liblevenshtein_rust_ray.functions.phonetic import zompist_rules

    for pat, _rep, ctx, w in zompist_rules():
        assert len(pat) >= 1
        assert ctx in ("any", "before_front_vowel", "not_before_front_vowel",
                       "word_final")
        assert w >= 0.0


def test_zompist_bounded_expansion():
    """Theorem 2: one rule pass at most doubles the length (max
    replacement/pattern ratio is x->yy's 2), and the sequential
    application of r rules is bounded by 2^r."""
    import random

    from liblevenshtein_rust_ray.functions.phonetic import (
        _apply_rule,
        apply_rules_seq,
        zompist_rules,
    )

    rng = random.Random(11)
    for _ in range(300):
        s = _rand_word(rng)
        for pat, rep, ctx, _w in zompist_rules():
            assert len(_apply_rule(s, pat, rep, ctx)) <= max(1, 2 * len(s))
        assert len(apply_rules_seq(zompist_rules(), s)) <= max(1, 2 * len(s))


def test_zompist_non_confluence():
    """Theorem 3: rule order matters — [x->yy, y->z] vs the reverse order
    produce different outputs on 'x' (the reference's counterexample)."""
    from liblevenshtein_rust_ray.functions.phonetic import TEST_RULES, apply_rules_seq

    fwd = apply_rules_seq(TEST_RULES, "x")
    rev = apply_rules_seq(list(reversed(TEST_RULES)), "x")
    assert fwd == "zz"
    assert rev == "yy"
    assert fwd != rev


def test_zompist_termination_and_zero_fuel():
    """Theorem 4: application terminates within the fuel bound; zero fuel
    is the identity (properties.rs prop_zero_fuel_identity)."""
    import random

    from liblevenshtein_rust_ray.functions.phonetic import apply_rules_seq, zompist_rules

    rng = random.Random(12)
    for _ in range(200):
        s = _rand_word(rng)
        assert apply_rules_seq(zompist_rules(), s, fuel=0) == s
        out = apply_rules_seq(zompist_rules(), s, fuel=13)
        assert apply_rules_seq(zompist_rules(), s) == out


def test_zompist_idempotence():
    """Theorem 5 (qualified as in the reference): a second application
    changes nothing unless the first pass ends in a new word-final 'e'
    run (the silent-e rule is the single non-idempotent rule; every
    violation found by search is of that shape)."""
    import random

    from liblevenshtein_rust_ray.functions.phonetic import apply_rules_seq, zompist_rules

    rng = random.Random(13)
    for _ in range(1500):
        s = _rand_word(rng)
        once = apply_rules_seq(zompist_rules(), s)
        twice = apply_rules_seq(zompist_rules(), once)
        if once.endswith("e"):
            assert twice == once[:-1] or twice == once
        else:
            assert twice == once, (s, once, twice)


def test_rewrite_weight():
    from liblevenshtein_rust_ray.functions.phonetic import (
        PHONETIC_RULES,
        rewrite_weight,
    )

    assert rewrite_weight(PHONETIC_RULES, "think") == 0.15      # th fired
    assert rewrite_weight(PHONETIC_RULES, "quick") == 0.30      # qu->kw, kw->qu
    assert rewrite_weight(PHONETIC_RULES, "plain") == 0.0


def test_minhash_md5_vectorized_exact_parity():
    """The uint64 Mersenne-61 mulmod must be bit-identical to the
    Python-int (a*h + b) % p formula the SQL oracle mirrors."""
    import numpy as np

    from liblevenshtein_rust_ray.functions.minhash import (
        _P_INT, _mulmod_m61, md5_hash64, md5_perm_params,
        minhash_signature_md5)

    a, b = md5_perm_params(64)
    feats = [f"tok {i} x" for i in range(150)]
    hs = [md5_hash64(f) % _P_INT for f in feats]
    want = np.array(
        [min((ai * h + bi) % _P_INT for h in hs) for ai, bi in zip(a, b)],
        dtype=np.uint64)
    got = minhash_signature_md5(feats)
    assert (got == want).all()

    # adversarial operands: boundary values of every limb split
    av = np.array(a, dtype=np.uint64)
    a1 = (av >> np.uint64(30))[:, None]
    a0 = (av & np.uint64((1 << 30) - 1))[:, None]
    edge = np.array([0, 1, (1 << 31) - 1, 1 << 31, (1 << 60),
                     _P_INT - 2, _P_INT - 1], dtype=np.uint64)
    got2 = _mulmod_m61(a1, a0, edge[None, :])
    want2 = np.array([[(ai * int(x)) % _P_INT for x in edge] for ai in a],
                     dtype=np.uint64)
    assert (got2 == want2).all()
