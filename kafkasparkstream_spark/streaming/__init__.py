"""Structured Streaming pipeline: the reference's continuous query, Spark-first."""
