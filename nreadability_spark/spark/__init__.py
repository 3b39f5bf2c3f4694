"""Spark-side dataset operators for the extraction engine."""
