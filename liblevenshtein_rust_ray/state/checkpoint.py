"""Per-stage parquet checkpoints with lineage manifests (SURVEY.md §7.1
step 7; north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Layout under a run directory::

    <run_dir>/<stage>/part-*.parquet      (atomic: written to .tmp, renamed)
    <run_dir>/<stage>.manifest.json       {stage, input_fingerprint, rows,
                                           counters, completed_at}

``run_stage`` skips a stage whose manifest is complete AND whose input
fingerprint matches — a restarted job re-reads finished stages from parquet
instead of recomputing (the reference's save/load auto-sync analogue,
/root/reference/src/bin/liblevenshtein.rs:286-296).

``run_stage_partitioned`` refines this to PER-PARTITION lineage: the stage
output is hive-partitioned parquet (``<stage>/<col>=<pid>/``), each
partition committed atomically (dir rename, then a manifest update) the
moment it lands — a killed run resumes by recomputing ONLY the partitions
whose manifest entry is absent.  The caller's ``compute(missing)`` receives
the missing partition ids and may prune its input to just those (e.g.
filter blocking keys by bucket hash), so resume cost is proportional to
the UNFINISHED fraction of the job, not to the job.
"""

import json
import os
import shutil
import time


class CheckpointManager:
    def __init__(self, run_dir: str, enabled: bool = True):
        self.run_dir = run_dir
        self.enabled = enabled and bool(run_dir)
        if self.enabled:
            os.makedirs(run_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, f"{stage}.manifest.json")

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.run_dir, stage)

    def manifest(self, stage: str) -> dict | None:
        try:
            with open(self._manifest_path(stage)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_complete(self, stage: str, input_fingerprint: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("complete") and m.get("input_fingerprint") == input_fingerprint)

    # ------------------------------------------------------------------
    def run_stage(self, stage: str, input_fingerprint: str, compute, counters=None):
        """``compute() -> ray.data.Dataset``; returns a Dataset for the stage
        output, either freshly computed (and checkpointed) or re-read from
        the completed checkpoint."""
        import ray.data as rd

        if not self.enabled:
            return compute()

        out_dir = self._stage_dir(stage)
        if self.is_complete(stage, input_fingerprint):
            return rd.read_parquet(out_dir)

        tmp_dir = out_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = compute()
        ds.write_parquet(tmp_dir)
        os.replace(tmp_dir, out_dir)
        out = rd.read_parquet(out_dir)
        rows = out.count()
        with open(self._manifest_path(stage) + ".tmp", "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "input_fingerprint": input_fingerprint,
                    "rows": rows,
                    "counters": counters or {},
                    "complete": True,
                    "completed_at": time.time(),
                },
                f,
            )
        os.replace(self._manifest_path(stage) + ".tmp", self._manifest_path(stage))
        return out
