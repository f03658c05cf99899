"""Placeholder — populated in a later milestone."""
QUERIES: dict = {}
ORACLE: dict = {}
