"""Column-level function library (cells, geometry, text, vectors)."""
