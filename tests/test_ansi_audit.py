"""ANSI-hazard lint gate — see tools/ansi_audit.py.

Round 7 shipped a job-aborting plain ``.cast('timestamp')`` on a
scraped string and two latent string-id negations; this keeps the
package free of unwaived instances of that defect class.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import ansi_audit  # noqa: E402


def test_no_unwaived_ansi_hazards():
    findings = []
    for path in ansi_audit.iter_sources():
        findings.extend(ansi_audit.audit_file(path))
    assert findings == [], "\n".join(findings)
