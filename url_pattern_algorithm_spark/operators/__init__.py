"""DataFrame operators: frontier core, pattern-tree pipeline, classification,
rewrite learning, sampling/skew, dedup, similarity, text analysis."""
