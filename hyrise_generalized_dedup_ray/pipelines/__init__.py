"""Composed end-to-end pipelines and the sequential reference oracle."""
