"""DataFrame-level operators: envelope routing, dedup, similarity, text."""
