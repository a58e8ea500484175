"""ANSI-hazard lint — the defect class that produced advice items two
rounds running (round 7: a plain ``.cast('timestamp')`` on a scraped
string aborted the politeness job on one malformed row; negated
tie-break columns in ``max_by`` structs throw at runtime for string
ids).

Spark 4 runs ANSI mode: a single malformed value inside ``to_date`` /
``to_timestamp`` / CAST kills the whole job instead of degrading the
row, and unary ``-col`` is a type error for non-numeric columns. The
repo rule (CLAUDE.md): ``try_cast``/``try_to_date``/``try_to_timestamp``
on any user-data string, and no unary negation of possibly-non-numeric
columns.

Scope: the package only. ``__spark_entry__.py`` is oracle-twin code
whose strict ``.cast("date")`` calls on the synthetic TPC-H columns
intentionally mirror DuckDB's strict ``::DATE`` casts — per-row
degradation there would silently diverge from the oracle contract.

Each hit must be either structurally safe (applied to an
``F.lit(...)``) or carry an explicit ``# ansi-ok: <reason>`` waiver on
the same or the preceding line. The waiver is the point: every non-try
parse of an external string must state WHY loud job-abort is the
intended contract there.

Exit 0 = no unwaived hazards. Exit 1 = findings printed, one per line.

Usage: python tools/ansi_audit.py
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "zacks_estimates_financial_statements_spark")

#: (pattern, description). Patterns are checked per non-docstring line.
HAZARDS = [
    (re.compile(r"(?<!try_)\bto_(?:date|timestamp)\s*\("),
     "non-try to_date/to_timestamp: one malformed string aborts the job"),
    (re.compile(r"""\.cast\(\s*(["'])(?:date|timestamp(?:_ntz)?)\1"""),
     "plain .cast to date/timestamp: use try_to_date/try_to_timestamp "
     "on user-data strings"),
    # unary minus only: the char before '-' (if any) is an opener or
    # separator, never an operand — binary `a - F.col(b)` is arithmetic
    (re.compile(r"(?:^|[(,=\[{:+*])\s*-\s*F\.col\("),
     "unary negation of a column: throws under ANSI for non-numeric "
     "types (use min_by/struct tie-breaks or waive for numeric cols)"),
]

WAIVER = re.compile(r"#\s*ansi-ok\s*:")

#: ``F.lit(...)`` casts are programmer-supplied literals: a bad value is
#: an immediate, loud, data-independent config error — not the per-row
#: hazard this lint exists for.
LIT_CAST = re.compile(r"""F\.lit\([^()]*(?:\([^()]*\))?[^()]*\)\s*\.cast\(""")

TRIPLE = re.compile(r'"""|\'\'\'')


def iter_sources():
    for dirpath, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def audit_file(path: str) -> list[str]:
    findings = []
    lines = open(path, encoding="utf-8").read().splitlines()
    rel = os.path.relpath(path, ROOT)
    in_doc = False
    for i, line in enumerate(lines):
        quotes = len(TRIPLE.findall(line))
        if in_doc:
            if quotes % 2 == 1:
                in_doc = False
            continue
        if quotes % 2 == 1:
            in_doc = True
        code = line if WAIVER.search(line) else line.split("#", 1)[0]
        for pat, why in HAZARDS:
            if not pat.search(code):
                continue
            if WAIVER.search(line) or (i > 0 and WAIVER.search(lines[i - 1])):
                continue
            if pat is HAZARDS[1][0] and LIT_CAST.search(code):
                continue
            findings.append(f"{rel}:{i + 1}: {why}\n    {line.strip()}")
    return findings


def main() -> int:
    findings: list[str] = []
    for path in iter_sources():
        findings.extend(audit_file(path))
    if findings:
        print(f"ANSI audit: {len(findings)} unwaived hazard(s)")
        for f in findings:
            print(f)
        return 1
    print("ANSI audit: clean (no unwaived to_date/to_timestamp/cast/"
          "negation hazards in the package)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
