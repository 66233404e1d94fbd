"""Placeholder — populated as the tier lands."""

QUERIES = {}
