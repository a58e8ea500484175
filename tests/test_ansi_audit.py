"""ANSI-hazard lint gate — see tools/ansi_audit.py.

Round 7 shipped a job-aborting plain ``.cast('timestamp')`` on a
scraped string and two latent string-id negations; this keeps the
package free of unwaived instances of that defect class, and pins the
scanner behaviors the round-8 self-review caught in the lint's first
version (docstring prose tripping the gate; a '#' inside a regex
literal hiding a real hazard; ``return -F.col(...)`` unflagged).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import ansi_audit  # noqa: E402


def _audit_src(tmp_path, src: str) -> list[str]:
    p = tmp_path / "snippet.py"
    p.write_text(src)
    return ansi_audit.audit_file(str(p))


def test_no_unwaived_ansi_hazards():
    findings = []
    for path in ansi_audit.iter_sources():
        findings.extend(ansi_audit.audit_file(path))
    assert findings == [], "\n".join(findings)


def test_docstring_prose_is_not_a_hazard(tmp_path):
    src = (
        '"""Module doc mentioning to_date(col) and .cast("timestamp")."""\n'
        "def f(x):\n"
        '    """wraps to_timestamp(s) safely."""\n'
        "    return x\n"
    )
    assert _audit_src(tmp_path, src) == []


def test_hash_inside_string_literal_does_not_hide_hazard(tmp_path):
    src = 'x = F.regexp_extract(c, "a#b", 1).cast("timestamp")\n'
    assert len(_audit_src(tmp_path, src)) == 1


def test_sql_string_hazards_are_scanned(tmp_path):
    src = 'df = df.selectExpr("to_timestamp(ts_str) AS ts")\n'
    assert len(_audit_src(tmp_path, src)) == 1


def test_unary_negation_forms(tmp_path):
    flagged = [
        'return -F.col("label")\n',
        'y = x if c else -F.col("id")\n',
        'z = F.struct((-F.col("a")).alias("n"))\n',
        'w = a * -F.col("b")\n',
    ]
    clean = [
        "d = total - F.col('n')\n",
        "e = row[0] - F.col('n')\n",
        "g = fn(x) - F.col('n')\n",
        "h = 1 - F.col('n')\n",
    ]
    for s in flagged:
        assert len(_audit_src(tmp_path, s)) == 1, s
    for s in clean:
        assert _audit_src(tmp_path, s) == [], s


def test_tokenize_failure_falls_back_to_raw_lines(tmp_path):
    # Unterminated string → tokenize.TokenError. The documented fallback
    # scans raw lines (hazards still flagged, waivers honored by regex)
    # instead of crashing — r8 advice: the except clause named a
    # nonexistent ``tokenize.TokenizeError`` so audit_file raised
    # AttributeError on unparseable source.
    src = (
        'x = F.to_timestamp(s)\n'
        'y = F.to_date(s)  # ansi-ok: loud abort intended\n'
        'broken = "unterminated\n'
    )
    findings = _audit_src(tmp_path, src)
    assert len(findings) == 1 and "to_timestamp" in findings[0]


def test_waiver_and_lit_cast_pass(tmp_path):
    src = (
        "a = F.lit(folder).cast('date')\n"
        "b = F.to_date(c)  # ansi-ok: loud abort intended\n"
        "# ansi-ok: numeric internal column\n"
        "d = F.struct((-F.col('__c')).alias('n'))\n"
    )
    assert _audit_src(tmp_path, src) == []
