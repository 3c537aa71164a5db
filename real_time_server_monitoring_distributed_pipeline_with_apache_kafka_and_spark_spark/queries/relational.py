"""relational queries (filled in build order SURVEY.md SS7.2)."""

QUERIES = {}
ORACLES = {}
