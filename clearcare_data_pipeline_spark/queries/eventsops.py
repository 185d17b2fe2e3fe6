"""Placeholder — populated in this round."""
QUERIES: dict = {}
ORACLES: dict = {}
