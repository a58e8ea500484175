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

Mechanics: source is tokenized, comments and docstrings are blanked
out (prose mentioning ``to_date(`` must not trip the gate), but
ordinary string literals REMAIN scanned — SQL strings passed to
``selectExpr``/``F.expr`` carry casts too, and a naive
``line.split('#')`` would hide a hazard behind a '#' inside a regex
literal (both failure modes observed in this lint's first version).
Unary minus is detected positionally: ``- F.col`` is a hazard when the
preceding token is an opener, an operator, or a Python keyword
(``return -F.col(...)``), and arithmetic when it is an operand.

Each hit must be either structurally safe (applied to an
``F.lit(...)``) or carry an explicit ``# ansi-ok: <reason>`` waiver on
the same or the preceding line. The waiver is the point: every non-try
parse of an external string must state WHY loud job-abort is the
intended contract there.

Exit 0 = no unwaived hazards. Exit 1 = findings printed, one per line.

Usage: python tools/ansi_audit.py
"""

from __future__ import annotations

import io
import keyword
import os
import re
import sys
import tokenize

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "zacks_estimates_financial_statements_spark")

#: (pattern, description) — scanned per comment/docstring-blanked line.
HAZARDS = [
    (re.compile(r"(?<!try_)\bto_(?:date|timestamp)\s*\("),
     "non-try to_date/to_timestamp: one malformed string aborts the job"),
    (re.compile(r"""\.cast\(\s*(["'])(?:date|timestamp(?:_ntz)?)\1"""),
     "plain .cast to date/timestamp: use try_to_date/try_to_timestamp "
     "on user-data strings"),
]

NEG = re.compile(r"-\s*F\.col\(")
NEG_WHY = ("unary negation of a column: throws under ANSI for "
           "non-numeric types (use min_by/struct tie-breaks or waive "
           "for numeric cols)")

WAIVER = re.compile(r"#\s*ansi-ok\s*:")

#: ``F.lit(...)`` casts are programmer-supplied literals: a bad value is
#: an immediate, loud, data-independent config error — not the per-row
#: hazard this lint exists for.
LIT_CAST = re.compile(r"""F\.lit\([^()]*(?:\([^()]*\))?[^()]*\)\s*\.cast\(""")

#: token types that end a logical line — a STRING right after one of
#: these (or at file start / after INDENT/DEDENT) is a docstring or a
#: no-op expression string, not data the code consumes
_LINE_STARTERS = (tokenize.NEWLINE, tokenize.INDENT, tokenize.DEDENT)


def _blank(rows: list[list[str]], start, end) -> None:
    """Blank the [start, end) token span (1-based rows) in place."""
    r0, c0 = start
    r1, c1 = end
    for r in range(r0, r1 + 1):
        row = rows[r - 1]
        lo = c0 if r == r0 else 0
        hi = c1 if r == r1 else len(row)
        for c in range(lo, min(hi, len(row))):
            row[c] = " "


def scan_source(src: str) -> tuple[list[str], set[int]]:
    """(scan_lines, waiver_lines): source with comments + docstrings
    blanked, and the 1-based line numbers carrying an ansi-ok waiver.
    Falls back to raw lines (waivers from a regex pass) if tokenize
    rejects the source — the gate must fail loudly on hazards, not
    silently on syntax."""
    lines = src.splitlines()
    rows = [list(ln) for ln in lines]
    waivers: set[int] = set()
    try:
        prev_sig = None
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.COMMENT:
                if WAIVER.search(tok.string):
                    waivers.add(tok.start[0])
                _blank(rows, tok.start, tok.end)
            elif tok.type == tokenize.STRING and (
                    prev_sig is None or prev_sig in _LINE_STARTERS):
                _blank(rows, tok.start, tok.end)
            if tok.type not in (tokenize.NL, tokenize.COMMENT):
                prev_sig = tok.type
    except (tokenize.TokenError, SyntaxError, IndentationError):
        rows = [list(ln) for ln in lines]
        waivers = {i + 1 for i, ln in enumerate(lines) if WAIVER.search(ln)}
    return ["".join(r) for r in rows], waivers


def _is_unary(code: str, pos: int) -> bool:
    """True if the '-' at ``pos`` negates its operand (vs subtraction):
    preceded by nothing, an opener/operator/separator, or a Python
    keyword (``return -F.col(...)``, ``else -F.col(...)``)."""
    j = pos - 1
    while j >= 0 and code[j] in " \t":
        j -= 1
    if j < 0:
        return True
    c = code[j]
    if c in ")]}\"'":
        return False
    if c.isalnum() or c == "_":
        k = j
        while k >= 0 and (code[k].isalnum() or code[k] == "_"):
            k -= 1
        return keyword.iskeyword(code[k + 1:j + 1])
    return True  # operator / opener / separator → unary


def iter_sources():
    for dirpath, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def audit_file(path: str) -> list[str]:
    src = open(path, encoding="utf-8").read()
    raw_lines = src.splitlines()
    scan_lines, waivers = scan_source(src)
    rel = os.path.relpath(path, ROOT)
    findings = []
    for i, code in enumerate(scan_lines, start=1):
        if i in waivers or (i - 1) in waivers:
            continue
        for pat, why in HAZARDS:
            if not pat.search(code):
                continue
            if pat is HAZARDS[1][0] and LIT_CAST.search(code):
                continue
            findings.append(f"{rel}:{i}: {why}\n    {raw_lines[i - 1].strip()}")
        for mm in NEG.finditer(code):
            if _is_unary(code, mm.start()):
                findings.append(
                    f"{rel}:{i}: {NEG_WHY}\n    {raw_lines[i - 1].strip()}")
                break
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
