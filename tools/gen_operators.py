#!/usr/bin/env python
"""Regenerate OPERATORS.md: the auto-generated operator/query catalog.

Ray-free (imports only; queries() builds a dict of callables and
oracle_sql() hits the fixture cache), so it can run while a bench owns
the Ray session:  PYTHONPATH=/root/repo python tools/gen_operators.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entry  # noqa: E402
import dcpray.functions as F  # noqa: E402

WIDTH = 160


def one_line(doc: str | None) -> str:
    if not doc:
        return ""
    s = re.sub(r"\s+", " ", doc.strip())
    s = s.replace("|", "\\|").replace("``", "`")
    return s if len(s) <= WIDTH else s[:WIDTH].rstrip() + "..."


def main() -> None:
    ops = sorted(F.__all__)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    rows = []
    for name in sorted(qs):
        mark = "✓" if name in oracles else "—"
        rows.append(f"| `{name}` | {mark} | {one_line(qs[name].__doc__)} |")

    out = f"""# Operator & query catalog

Auto-generated inventory (tools/gen_operators.py). Two surfaces:

## 1. Library operators (`dcpray.functions`)

{len(ops)} public operators: {", ".join(f"`{o}`" for o in ops)}

Plus the CDC engine surface: `dcpray.Lake / ReplayConfig / replay /
PipelineBuilder / compact / gc / IncrementalView / ViewSpec` and the
manifest stores in `dcpray.state.checkpoint`.

## 2. Driver queries (`__ray_entry__.queries()`)

{len(qs)} queries, {len([n for n in qs if n in oracles])} with DuckDB \
oracles (the driver compares
rows + schema + value hash at sf0.01). `—` entries are approximate or
non-SQL-expressible by nature; each has an oracle-checked exact
sibling or invariant tests (see SURVEY.md).

| Query | Oracle | What it verifies |
|---|---|---|
""" + "\n".join(rows) + "\n"

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OPERATORS.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}: {len(ops)} operators, {len(qs)} queries, "
          f"{len([n for n in qs if n in oracles])} oracles")


if __name__ == "__main__":
    main()
