"""Relational operators: joins, aggregates, dedup, similarity, quality."""
