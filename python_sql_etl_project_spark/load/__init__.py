"""Warehouse load layer: incremental anti-join append."""
