"""Sources & sinks: table storage facade (Parquet now, Lance when available),
checkpoint manifests, and the reference-conformant DDP1 binary container."""
