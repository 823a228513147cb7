"""Configurable weighted edit operations — the GeneralizedAutomaton /
OperationSet capability (§2.4 of SURVEY.md; reference
/root/reference/src/transducer/generalized/, operation_set.rs:1-620,
operation_type.rs:134-440): edit operations as ⟨consume_query, consume_term,
weight⟩ triples with configurable weights, including the two-character
operations (transpose, merge, split).

``OperationSet`` carries the weights; ``weighted_distance`` is the DP over
them (minimal total weight to rewrite ``source`` into ``target``), and
``batch_weighted_distances`` the numpy form used inside ``map_batches``
stages.  ``None`` disables an operation.  Presets mirror the reference's
shipped configurations: ``standard()`` (unit costs), ``transposition()``,
``merge_split()``, ``ocr()`` (cheap substitutions/merges for glyph errors).

The shipped unit-cost algorithms remain the exact-parity kernels
(kernel.distance / kernel.transition); this module is the cost-model
extension point and is oracle-tested against a brute-force recursion.
"""

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class OperationSet:
    substitute: float | None = 1.0
    insert: float | None = 1.0
    delete: float | None = 1.0
    transpose: float | None = None  # adjacent swap (consumes 2 + 2)
    merge: float | None = None      # 2 source chars -> 1 target char
    split: float | None = None      # 1 source char -> 2 target chars
    # character-set-RESTRICTED operations (the reference's
    # ``OperationType::with_restriction``, operation_type.rs:237): exact
    # segment rewrites (src_seg -> dst_seg) at their own weight, on top of
    # the global per-op weights above — e.g. ("rn", "m", 0.2) prices the
    # classic OCR merge without cheapening every merge.
    rules: tuple = ()

    @staticmethod
    def standard() -> "OperationSet":
        return OperationSet()

    def with_rule(self, src: str, dst: str, weight: float) -> "OperationSet":
        """A copy with one restricted rewrite rule added (src segment ->
        dst segment at ``weight``); chainable."""
        from dataclasses import replace

        if not src and not dst:
            raise ValueError("a rule must consume at least one character")
        return replace(self, rules=self.rules + ((src, dst, weight),))

    @staticmethod
    def transposition(weight: float = 1.0) -> "OperationSet":
        return OperationSet(transpose=weight)

    @staticmethod
    def merge_split(weight: float = 1.0) -> "OperationSet":
        return OperationSet(merge=weight, split=weight)

    @staticmethod
    def ocr() -> "OperationSet":
        """Glyph-error model: substitutions and merges cheap (rn→m style),
        insert/delete full price."""
        return OperationSet(substitute=0.5, merge=0.5, split=0.5)

    @staticmethod
    def ocr_restricted() -> "OperationSet":
        """Restricted glyph-confusion model: unit costs globally, with the
        classic OCR confusions priced cheaply ONLY for their character
        sets (the with_restriction configuration the reference ships for
        scanner output)."""
        ops = OperationSet()
        for src, dst, w in (
            ("rn", "m", 0.25), ("m", "rn", 0.25),
            ("cl", "d", 0.25), ("d", "cl", 0.25),
            ("vv", "w", 0.25), ("w", "vv", 0.25),
            ("0", "o", 0.25), ("o", "0", 0.25),
            ("1", "l", 0.25), ("l", "1", 0.25),
            ("5", "s", 0.25), ("s", "5", 0.25),
        ):
            ops = ops.with_rule(src, dst, w)
        return ops


_INF = float("inf")


def weighted_distance(source: str, target: str, ops: OperationSet) -> float:
    """Minimal total weight rewriting ``source`` into ``target``.  Matches
    cost 0; disabled ops (None) are unavailable.  float('inf') when no op
    sequence connects the strings (e.g. insert disabled and target longer)."""
    m, n = len(source), len(target)
    D = np.full((m + 1, n + 1), _INF)
    D[0, 0] = 0.0
    for i in range(m + 1):
        for j in range(n + 1):
            d = D[i, j]
            if d == _INF:
                continue
            if i < m and j < n and source[i] == target[j]:
                D[i + 1, j + 1] = min(D[i + 1, j + 1], d)
            if ops.substitute is not None and i < m and j < n:
                D[i + 1, j + 1] = min(D[i + 1, j + 1], d + ops.substitute)
            if ops.insert is not None and j < n:
                D[i, j + 1] = min(D[i, j + 1], d + ops.insert)
            if ops.delete is not None and i < m:
                D[i + 1, j] = min(D[i + 1, j], d + ops.delete)
            if (
                ops.transpose is not None
                and i + 1 < m
                and j + 1 < n
                and source[i] == target[j + 1]
                and source[i + 1] == target[j]
            ):
                D[i + 2, j + 2] = min(D[i + 2, j + 2], d + ops.transpose)
            if ops.merge is not None and i + 1 < m and j < n:
                D[i + 2, j + 1] = min(D[i + 2, j + 1], d + ops.merge)
            if ops.split is not None and i < m and j + 1 < n:
                D[i + 1, j + 2] = min(D[i + 1, j + 2], d + ops.split)
            for s, t, w in ops.rules:
                ls, lt = len(s), len(t)
                if source[i:i + ls] == s and target[j:j + lt] == t:
                    D[i + ls, j + lt] = min(D[i + ls, j + lt], d + w)
    return float(D[m, n])


def brute_force_distance(source: str, target: str, ops: OperationSet,
                         _depth: int = 0) -> float:
    """Exponential recursion over the same operation set — the independent
    oracle for property tests (small strings only)."""
    if not source and not target:
        return 0.0
    best = _INF
    if source and target and source[0] == target[0]:
        best = min(best, brute_force_distance(source[1:], target[1:], ops))
    if ops.substitute is not None and source and target:
        best = min(best, ops.substitute + brute_force_distance(source[1:], target[1:], ops))
    if ops.insert is not None and target:
        best = min(best, ops.insert + brute_force_distance(source, target[1:], ops))
    if ops.delete is not None and source:
        best = min(best, ops.delete + brute_force_distance(source[1:], target, ops))
    if (
        ops.transpose is not None
        and len(source) >= 2
        and len(target) >= 2
        and source[0] == target[1]
        and source[1] == target[0]
    ):
        best = min(best, ops.transpose + brute_force_distance(source[2:], target[2:], ops))
    if ops.merge is not None and len(source) >= 2 and target:
        best = min(best, ops.merge + brute_force_distance(source[2:], target[1:], ops))
    if ops.split is not None and source and len(target) >= 2:
        best = min(best, ops.split + brute_force_distance(source[1:], target[2:], ops))
    for s, t, w in ops.rules:
        if source.startswith(s) and target.startswith(t):
            best = min(best, w + brute_force_distance(source[len(s):], target[len(t):], ops))
    return best


def batch_weighted_distances(queries, terms, ops: OperationSet,
                             cap: float | None = None) -> np.ndarray:
    """Per-pair weighted distances (float64); ``cap`` clamps results to
    cap + 1 like the unit-cost batch kernel.  O(pairs × |q| × |t|) — the
    cost-model knob, not the hot path; the unit-cost banded kernel covers
    the shipped algorithms."""
    out = np.empty(len(queries))
    for k, (q, t) in enumerate(zip(queries, terms)):
        d = weighted_distance(q, t, ops)
        out[k] = min(d, cap + 1) if cap is not None else d
    return out
