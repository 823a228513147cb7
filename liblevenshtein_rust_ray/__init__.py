"""liblevenshtein_rust_ray — a Ray-Data-native approximate-string-matching and
record-linkage engine with the query/data capabilities of
universal-automata/liblevenshtein-rust, re-expressed as distributed
``ray.data.Dataset`` pipelines over Arrow batches.

Layers:

* ``kernel``    — pure-Python Levenshtein-automaton kernel (no Ray)
* ``functions`` — deterministic per-record scalar functions
* ``sources``   — synthetic corpus generation + readers
* ``stages``    — Ray Data stage kernels (extract / block / score / cluster)
* ``pipelines`` — end-to-end pipelines (entity resolution, dedup, …)
* ``state``     — checkpoints + lineage manifests

Nothing at import time touches ``ray.init`` — sessions are owned by callers
(bench.py, CLI, the pytest fixture).
"""

__version__ = "0.1.0"


def _disable_numpy_thp_madvise() -> None:
    """Turn off numpy's MADV_HUGEPAGE on large buffers, in THIS process.

    With kernel ``transparent_hugepage/defrag = madvise`` (this sandbox and
    many cluster images), numpy's hint makes every fault on a >=4 MiB
    buffer eligible for SYNCHRONOUS hugepage compaction.  Measured on the
    sf0.5 hot bucket: the identical scorer call costs 1.1 s of CPU with
    the hint off and 1.2-29 s (compaction storms, charged as system time)
    with it on — this was the round-1 "multi-second host scheduling
    noise".  Runs at package import so every Ray worker that deserializes
    our UDFs gets it; the env-var form only works if set before numpy's
    first import, which we don't control inside workers."""
    try:
        from numpy.core import multiarray

        multiarray._set_madvise_hugepage(False)
    except Exception:
        pass  # older/newer numpy without the private toggle


_disable_numpy_thp_madvise()
