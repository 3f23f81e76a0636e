"""Ingest adapters: edge formats → schema'd Spark DataFrames."""
