"""Placeholder -- filled in a later milestone."""

QUERIES = {}
ORACLES = {}
