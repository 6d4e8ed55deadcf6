"""Distributed state: union-find label propagation, checkpoint/lineage."""
