"""Dynamic contextual completion with drafts, checkpoints and undo — the
reference's ``DynamicContextualCompletionEngine`` interactive surface
(/root/reference/src/contextual/engine.rs:61-1174: create contexts, add
terms, per-context draft buffer insert/get/clear engine.rs:500-615,
checkpoint/undo stack engine.rs:646-756, scoped complete engine.rs:1058).

The batch-side analogue (explode-down visibility join) lives in
``pipelines.scoped``; this module is the ONLINE form: one mutable engine
per editing session.  Session state is exactly what the Dataset API cannot
express, so the distribution story is a raw Ray ACTOR (the documented
escape hatch): ``session = contextual_session()`` returns a named actor
handle whose methods mirror the engine 1:1 — many sessions scale out as
many actors, completions inside each stay single-threaded like the
reference's Mutex-guarded engine."""

from ..kernel import STANDARD, build_trie
from ..kernel.query import ordered_query


class ContextError(KeyError):
    pass


class ContextualEngine:
    """Pure-Python core (no Ray): contexts form a tree; a query in a
    context sees its own terms plus every ancestor's terms."""

    def __init__(self):
        self._parent: dict[int, int | None] = {}
        self._terms: dict[int, set] = {}
        self._drafts: dict[int, list] = {}
        self._checkpoints: dict[int, list] = {}
        self._next_id = 0

    # -- context tree --------------------------------------------------
    def create_root_context(self) -> int:
        return self._create(None)

    def create_child_context(self, parent: int) -> int:
        self._check(parent)
        return self._create(parent)

    def _create(self, parent) -> int:
        ctx = self._next_id
        self._next_id += 1
        self._parent[ctx] = parent
        self._terms[ctx] = set()
        self._drafts[ctx] = []
        self._checkpoints[ctx] = []
        return ctx

    def _check(self, ctx: int):
        if ctx not in self._parent:
            raise ContextError(f"context {ctx} not found")

    def context_exists(self, ctx: int) -> bool:
        return ctx in self._parent

    # -- terms ---------------------------------------------------------
    def add_term(self, ctx: int, term: str):
        self._check(ctx)
        self._terms[ctx].add(term)

    def remove_term(self, ctx: int, term: str):
        self._check(ctx)
        self._terms[ctx].discard(term)

    def visible_terms(self, ctx: int) -> list[str]:
        """Own + ancestor terms (engine.rs visibility rule)."""
        self._check(ctx)
        out: set = set()
        cur = ctx
        while cur is not None:
            out |= self._terms[cur]
            cur = self._parent[cur]
        return sorted(out)

    # -- draft buffer (engine.rs:500-615) ------------------------------
    def insert_str(self, ctx: int, s: str):
        self._check(ctx)
        self._drafts[ctx].extend(s)

    def get_draft(self, ctx: int) -> str:
        self._check(ctx)
        return "".join(self._drafts[ctx])

    def clear_draft(self, ctx: int):
        self._check(ctx)
        self._drafts[ctx].clear()

    def delete_chars(self, ctx: int, k: int = 1):
        self._check(ctx)
        del self._drafts[ctx][len(self._drafts[ctx]) - k:]

    # -- checkpoints / undo (engine.rs:646-756) ------------------------
    def checkpoint(self, ctx: int):
        """Push the current buffer position onto the checkpoint stack."""
        self._check(ctx)
        self._checkpoints[ctx].append(len(self._drafts[ctx]))

    def undo(self, ctx: int):
        """Restore the buffer to the most recent checkpoint, popping it."""
        self._check(ctx)
        stack = self._checkpoints[ctx]
        if not stack:
            raise ContextError(f"no checkpoints for context {ctx}")
        pos = stack.pop()
        del self._drafts[ctx][pos:]

    def checkpoint_count(self, ctx: int) -> int:
        self._check(ctx)
        return len(self._checkpoints[ctx])

    def clear_checkpoints(self, ctx: int):
        self._check(ctx)
        self._checkpoints[ctx].clear()

    # -- completion (engine.rs:1058-1174) ------------------------------
    def complete(self, ctx: int, query: str | None = None, n: int = 0,
                 algorithm: str = STANDARD, limit: int | None = None):
        """Prefix completions of ``query`` (default: the current draft's
        last whitespace-separated token) against the visible terms,
        ordered (distance asc, term lexicographic)."""
        self._check(ctx)
        if query is None:
            draft = self.get_draft(ctx)
            query = draft.split()[-1] if draft.split() else ""
        vis = self.visible_terms(ctx)
        if not vis or not query:
            return []
        trie = build_trie(vis)
        return [
            (c.term, c.distance)
            for c in ordered_query(trie, query, n, algorithm,
                                   prefix_mode=True, limit=limit)
        ]


def contextual_session(name: str | None = None):
    """A per-session Ray actor wrapping :class:`ContextualEngine` (state
    the Dataset API can't hold).  Call methods with ``.remote(...)``."""
    import ray

    cls = ray.remote(ContextualEngine)
    if name:
        return cls.options(name=name, get_if_exists=True).remote()
    return cls.remote()
