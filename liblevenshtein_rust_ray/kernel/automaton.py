"""Per-query Levenshtein automaton with interned states and memoized
transitions.

This is the practical analogue of the reference's *universal* Levenshtein
automaton (/root/reference/src/transducer/universal/automaton.rs:67-927,
Mitankin 2005): because a state's successor depends only on (state,
characteristic-vector bits), transitions are computed once and cached.  After
warm-up every dictionary-edge step costs one bitmask shift plus one dict
lookup — the Python stand-in for the reference's precomputed tables, and what
makes the per-block trie traversal fast enough inside Ray actors.

States are interned absolute position-sets; the characteristic vector over a
state's index span is packed into an int cache key.
"""

from .algorithm import STANDARD, validate_algorithm
from .state import infer_distance, infer_prefix_distance, min_distance
from .transition import transition_state, initial_state, _CV_CAP


class LevenshteinAutomaton:
    __slots__ = (
        "query",
        "qlen",
        "n",
        "algorithm",
        "prefix_mode",
        "subst",
        "_window",
        "_states",
        "_ids",
        "_memo",
        "_masks",
        "_spans",
        "_dist",
        "_start",
    )

    def __init__(self, query, max_distance: int, algorithm: str = STANDARD,
                 prefix_mode: bool = False, subst=None):
        validate_algorithm(algorithm)
        if max_distance < 0:
            raise ValueError(f"max_distance must be >= 0, got {max_distance}")
        self.query = query
        self.qlen = len(query)
        self.n = max_distance
        self.algorithm = algorithm
        self.prefix_mode = prefix_mode
        self.subst = subst
        self._window = min(max_distance + 1, _CV_CAP)
        self._states: list = []   # id -> tuple of positions
        self._ids: dict = {}      # tuple of positions -> id
        self._spans: list = []    # id -> (base, width) of the cv span
        self._memo: dict = {}     # (id, cv_bits) -> id | -1
        self._masks: dict = {}    # char unit -> int bitmask over query indices
        self._dist: list = []     # id -> cached final distances tuple
        init = tuple(initial_state(self.qlen, max_distance, algorithm))
        self._start = self._intern(init)

    # ------------------------------------------------------------------
    def start(self) -> int:
        return self._start

    def _intern(self, state: tuple) -> int:
        sid = self._ids.get(state)
        if sid is None:
            sid = len(self._states)
            self._ids[state] = sid
            self._states.append(state)
            base = min(p[0] for p in state)
            # epsilon closure can advance indices by up to n (deletions), and
            # each position reads a cv window of self._window — the cache key
            # must cover every bit the transition can observe
            hi = max(p[0] for p in state) + self.n + self._window
            self._spans.append((base, hi - base))
            self._dist.append(None)
        return sid

    def _mask(self, unit) -> int:
        m = self._masks.get(unit)
        if m is None:
            m = 0
            subst = self.subst
            for qi, qu in enumerate(self.query):
                if qu == unit or (subst is not None and subst.is_allowed(unit, qu)):
                    m |= 1 << qi
            self._masks[unit] = m
        return m

    def step(self, state_id: int, unit) -> int | None:
        """Transition on one dictionary character; returns next state id or
        ``None`` when the automaton dies (prunes the dictionary branch)."""
        base, width = self._spans[state_id]
        cv_bits = (self._mask(unit) >> base) & ((1 << width) - 1)
        key = (state_id, cv_bits)
        nxt = self._memo.get(key)
        if nxt is None:
            state = list(self._states[state_id])
            result = transition_state(
                state, unit, self.query, self.n, self.algorithm,
                prefix_mode=self.prefix_mode, subst=self.subst,
            )
            nxt = -1 if result is None else self._intern(tuple(result))
            self._memo[key] = nxt
        return None if nxt == -1 else nxt

    # ------------------------------------------------------------------
    def _distances(self, state_id: int):
        d = self._dist[state_id]
        if d is None:
            st = self._states[state_id]
            d = (
                infer_distance(st, self.qlen),
                infer_prefix_distance(st, self.qlen),
                min_distance(st),
            )
            self._dist[state_id] = d
        return d

    def distance(self, state_id: int):
        """Whole-term distance at a final dictionary node."""
        return self._distances(state_id)[0]

    def prefix_distance(self, state_id: int):
        return self._distances(state_id)[1]

    def substring_distance(self, state_id: int):
        return self._distances(state_id)[2]

    def accepts(self, term) -> int | None:
        """Distance if ``term`` is within ``n`` of the query, else ``None`` —
        the pair-acceptance API of the reference's universal automaton
        (universal/automaton.rs ``accepts``)."""
        sid = self._start
        for u in term:
            sid = self.step(sid, u)
            if sid is None:
                return None
        d = self.distance(sid)
        return d if d is not None and d <= self.n else None
