"""Table storage facade with lineage manifests.

Generalizes the reference's DDP1 container (spec comment at
``/root/reference/src/compressor.c:30-39``): where DDP1 packs header +
dictionary payload + id stream into one file with hand-rolled little-endian
scalars (``compressor.c:10-28``), the graft stores each logical table as a
directory of Parquet part files plus a ``_manifest.json`` carrying what DDP1's
header carried (config identity, counts) *and* what it lacked (lineage,
partition completion for resume).

Lance is the target format at scale; ``pylance`` is not installable in this
offline sandbox, so Parquet stands in behind this facade (``FORMAT`` switches
in one place — the API is format-agnostic).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

MANIFEST_NAME = "_manifest.json"
FORMAT = "parquet"  # -> "lance" when pylance is available


def _detect_format(path: str) -> str:
    """Format by extension: a file's own suffix, or — for a directory — the
    MAJORITY suffix of its data files, with parquet (the engine's native
    checkpoint format) winning any tie or mixture that includes it, so one
    stray export.csv next to fifty part-*.parquet files cannot flip the
    whole directory to CSV. Sidecars (_manifest.json, _metadata, hidden
    files) are ignored."""
    exts = {".parquet": "parquet", ".csv": "csv",
            ".json": "json", ".jsonl": "json"}
    if isinstance(path, (list, tuple)):
        path = path[0] if path else ""
    root, ext = os.path.splitext(path)
    if ext in exts:
        return exts[ext]
    if os.path.isdir(path):
        counts: dict[str, int] = {}
        for f in os.listdir(path):
            if f.startswith("_") or f.startswith("."):
                continue
            e = os.path.splitext(f)[1]
            if e in exts:
                counts[exts[e]] = counts.get(exts[e], 0) + 1
        if counts:
            if "parquet" in counts:
                return "parquet"
            return max(counts, key=counts.get)
    return "parquet"


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """Dataset source with column pruning pushed to the read.

    Format-dispatched by extension: Parquet (native; columns pruned at the
    file read), CSV and JSON/JSONL (pruned by a projection right after the
    read — those formats are row-oriented, so bytes are read either way).
    Every pipeline in the engine accepts any of these interchangeably."""
    fmt = _detect_format(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    # CSV/JSON readers take no filter kwarg; apply the same expression right
    # after the read so every pipeline stays format-interchangeable (the
    # predicate just can't skip storage bytes on row-oriented formats)
    flt = kwargs.pop("filter", None)
    ds = (ray.data.read_csv(path, **kwargs) if fmt == "csv"
          else ray.data.read_json(path, **kwargs))
    if flt is not None:
        ds = ds.map_batches(lambda t: t.filter(flt), batch_format="pyarrow")
    return ds.select_columns(columns) if columns else ds


def write_table(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path, **kwargs)


def write_manifest(path: str, manifest: dict[str, Any]) -> None:
    """Atomic manifest commit: write-tmp-then-rename, so a crash mid-write
    never leaves a checkpoint that *looks* complete (the reference's failure
    mode is free-and-abort, e.g. ``compressor.c:176-183``; ours is resume)."""
    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))


def read_manifest(path: str) -> dict[str, Any] | None:
    p = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_arrow_table(table: pa.Table, path: str, filename: str = "part-0.parquet") -> None:
    """Driver-side small-table sink (truth tables, metrics)."""
    os.makedirs(path, exist_ok=True)
    pq.write_table(table, os.path.join(path, filename))


def dataset_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
