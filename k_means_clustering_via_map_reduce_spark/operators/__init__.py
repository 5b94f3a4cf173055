"""Extension operators: dedup, similarity search, text analysis,
multimodal plumbing. Importing this package registers their query-surface
entries into ``queries.QUERIES`` / ``queries.ORACLE_SQL``."""
