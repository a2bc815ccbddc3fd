"""Regenerate QUERIES.md from the registered query surface."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402

q = e.queries()
o = e.oracle_sql()
lines = [
    "# QUERIES — the complete registered surface",
    "",
    f"Every entry in `__spark_entry__.queries()` ({len(q)} queries), its",
    "implementing module, and its first docstring sentence. ALL entries",
    "carry a DuckDB oracle in `oracle_sql()` and hash-match it at sf0.001",
    "and sf0.01 (`tests/test_oracle_parity.py`, the driver-gate mirror).",
    "",
    "| query | module | what it does |",
    "|---|---|---|",
]
for name in sorted(q):
    fn = q[name]
    mod = fn.__module__.replace("grebi_spark.", "")
    doc = (fn.__doc__ or "").strip().split("\n\n")[0]
    doc = " ".join(doc.split())
    if len(doc) > 220:
        doc = doc[:217] + "..."
    doc = doc.replace("|", "\\|")
    lines.append(f"| `{name}` | {mod} | {doc} |")
with open("/root/repo/QUERIES.md", "w") as fh:
    fh.write("\n".join(lines) + "\n")
print(f"wrote QUERIES.md with {len(q)} entries; oracles: {len(o)}")
