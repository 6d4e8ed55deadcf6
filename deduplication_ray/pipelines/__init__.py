"""End-to-end pipeline DAGs: image dedup (flagship), text dedup, relational
query operators, similarity search."""
