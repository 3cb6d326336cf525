"""Relational + spatial operators: joins, aggregations, analytics."""
