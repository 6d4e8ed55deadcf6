"""Pipeline stages: map_batches transforms and actor-pool classes.

Every stage is Dataset-in/Dataset-out or an Arrow-batch callable; no stage
owns a Ray session. Stateful stages (signature computation) are callable
classes sized as actor pools by the pipeline assembler.
"""
