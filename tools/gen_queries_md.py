"""Regenerate docs/QUERIES.md from __ray_entry__.queries() docstrings.

Usage: python tools/gen_queries_md.py (any cwd)
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __ray_entry__ as E

    qs, oq = E.queries(), E.oracle_sql()

    def doc_of(fn) -> str:
        f = fn
        # unwrap lambdas that close over the real pipeline function
        if getattr(f, "__name__", "") == "<lambda>":
            cells = [c.cell_contents for c in (f.__closure__ or ())
                     if callable(getattr(c, "cell_contents", None))]
            for c in cells:
                if inspect.getdoc(c):
                    f = c
                    break
        d = inspect.getdoc(f) or ""
        first = d.split("\n\n")[0]
        one = re.sub(r"\s+", " ", first).strip()
        return one if len(one) <= 220 else one[:217] + "..."

    lines = [
        "# Query catalog — every registered driver query",
        "",
        "Auto-generated from `__ray_entry__.queries()` docstrings",
        "(`python tools/gen_queries_md.py`).",
        "`sql-checked` = the driver value-hash-compares the full result",
        "against the DuckDB oracle in `oracle_sql()`; `rows-only` = not",
        "ANSI-SQL-expressible (iterative/LSH/model ops), row-count checked.",
        "",
        "| # | query | check | what it computes |",
        "|---|---|---|---|",
    ]
    for i, name in enumerate(sorted(qs), 1):
        check = "sql-checked" if name in oq else "rows-only"
        lines.append(f"| {i} | `{name}` | {check} | {doc_of(qs[name])} |")
    with open("/root/repo/docs/QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(qs)} entries ({len([n for n in qs if n in oq])} "
          f"sql-checked)")


if __name__ == "__main__":
    main()
