"""Serial numpy oracle: single-process reference implementation (SURVEY §5.2)."""
