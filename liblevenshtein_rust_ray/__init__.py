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
