"""The attestation artifact must never lag the query registry.

Round-6 lesson: CORRECTNESS_local_r06.json was emitted by hand before
the last operator landed, so the committed attestation silently missed
one registry entry. ``tools/oracle_check.py`` now refreshes
``CORRECTNESS_local.json`` on every FULL run as a side effect of the
check itself; this test pins the contract: the artifact exists, its
key set equals ``queries()``'s key set exactly, and every recorded row
is green (a committed artifact with red rows is a lie in the repo).
"""

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_keys():
    spec = importlib.util.spec_from_file_location(
        "entry_attest", os.path.join(ROOT, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.queries()), set(mod.oracle_sql())


def test_attestation_artifact_matches_registry():
    path = os.path.join(ROOT, "CORRECTNESS_local.json")
    assert os.path.exists(path), (
        "CORRECTNESS_local.json missing — run a FULL "
        "`python tools/oracle_check.py /root/testdata/sf0.01` "
        "(the tool writes it automatically) and commit it")
    results = json.load(open(path))
    qkeys, okeys = _registry_keys()
    assert set(results) == qkeys, (
        "attestation lags the registry: "
        f"missing={sorted(qkeys - set(results))} "
        f"extra={sorted(set(results) - qkeys)}")
    red = {n: r for n, r in results.items()
           if r.get("err") or r.get("rows_match") is False
           or r.get("schema_match") is False
           or r.get("hash_match") is False}
    assert not red, f"committed attestation has red rows: {sorted(red)}"
    # every oracle-sql twin must have produced a hash verdict (the
    # rows-only mode is reserved for queries with no SQL twin)
    weak = {n for n, r in results.items()
            if n in okeys and r.get("hash_match") is not True}
    assert not weak, f"oracle-backed queries without hash verdict: {weak}"


def test_newest_round_snapshot_matches_registry():
    """The NEWEST committed ``CORRECTNESS_local_rNN.json`` must not
    carry keys the registry no longer has — round-7 shipped a stale
    mid-round snapshot; renames/deletions since a stamp are the same
    fault. Keys ADDED to the registry since the last stamp are legal
    mid-round state (r10 added ``warc_roundtrip``): the stamp-time
    equality is enforced where it belongs, in ``tools/stamp_round.py``,
    which refuses to stamp a canonical artifact that lags the registry
    — so the next round CANNOT stamp until the snapshot catches up,
    and ``test_attestation_artifact_matches_registry`` keeps the
    CANONICAL file exactly equal to the registry every full run."""
    import re

    # sort by the parsed round number, not lexicographically: 'r100'
    # sorts before 'r99' as a string, which would pin the wrong file
    snaps = sorted(
        (f for f in os.listdir(ROOT)
         if re.fullmatch(r"CORRECTNESS_local_r\d+\.json", f)),
        key=lambda f: int(re.search(r"r(\d+)\.json", f).group(1)))
    assert snaps, "no round snapshot committed"
    newest = snaps[-1]
    results = json.load(open(os.path.join(ROOT, newest)))
    qkeys, _ = _registry_keys()
    unknown = set(results) - qkeys
    assert not unknown, (
        f"{newest} carries keys the registry no longer has "
        f"({sorted(unknown)}): a rename/deletion went out without a "
        "re-stamp — run the gates and `python tools/stamp_round.py "
        "<round>` as the round's last step")


def test_oracle_sql_keys_subset_of_queries():
    qkeys, okeys = _registry_keys()
    assert okeys <= qkeys, f"oracle-only keys: {sorted(okeys - qkeys)}"


def test_bench_headline_names_are_registered_queries():
    """A bench HEADLINE/TRACKED entry naming a nonexistent query would
    silently break the baseline and the driver's BENCH json."""
    spec = importlib.util.spec_from_file_location(
        "bench_attest", os.path.join(ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    qkeys, _ = _registry_keys()
    missing = [n for n in bench.HEADLINE if n not in qkeys]
    assert not missing, f"bench HEADLINE not in registry: {missing}"
    tracked = getattr(bench, "TRACKED_NON_HEADLINE", [])
    missing_t = [n for n in tracked
                 if n not in qkeys and not n.endswith("_fast")]
    assert not missing_t, f"bench tracked not in registry: {missing_t}"
