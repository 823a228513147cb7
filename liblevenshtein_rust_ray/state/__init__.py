"""Durable pipeline state: per-stage parquet checkpoints + lineage manifests."""

from .checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
