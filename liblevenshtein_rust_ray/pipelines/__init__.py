"""End-to-end Ray Data pipelines."""

from .entity_resolution import er_pipeline, er_clusters, evaluate_f1

__all__ = ["er_pipeline", "er_clusters", "evaluate_f1"]
