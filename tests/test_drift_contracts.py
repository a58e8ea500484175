"""Schema-drift contracts (r13 ``--drift-rate`` fuzz dial).

The dial re-encodes the PHYSICAL parquet schema with logical values
unchanged — int64→int32 where every value fits, timestamp unit/tz
rotation (the events.ts INT64-nanos ↔ TIMESTAMP-micros drift that has
ALREADY bitten once across driver testdata regenerations, TESTDATA.md),
one trailing ``__drift_pad`` column, and a seeded column-order
permutation. Both engines read the same drifted bytes, so any oracle
divergence is reader-schema DEPENDENCE.

Repo-wide contract the recon pinned (both 5 % drift-only and the
combined hi-rate battery ran 149/149 green): **readers project their
declared column contract by NAME** — ``__spark_entry__.TABLE_COLUMNS``
drives both the Spark ``_t()`` reads and the DuckDB oracle views
(tools/oracle_check.py), so trailing columns and physical column order
are absorbed at the reader boundary instead of leaking into
schema-enumerating operators (``profile_table`` profiles whatever its
input relation carries — the projection is what pins that input).
"""

from __future__ import annotations

import importlib.util
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_drift_test", os.path.join(ROOT, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fuzz():
    spec = importlib.util.spec_from_file_location(
        "contract_fuzz_drift_test",
        os.path.join(ROOT, "tools", "contract_fuzz.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def spark():
    from zacks_estimates_financial_statements_spark.session import get_spark
    return get_spark(master="local[4]",
                     extra_conf={"spark.ui.enabled": "false"})


@pytest.fixture(scope="module")
def drifted_dir(tmp_path_factory):
    """A drifted copy of the sf0.001 tables used below."""
    out = tmp_path_factory.mktemp("drifted")
    fz = _fuzz()
    for table in ("documents", "events"):
        t = pq.read_table(f"/root/testdata/sf0.001/{table}.parquet")
        d = fz.drift_table(t, table, 0.05)
        pq.write_table(d, os.path.join(out, f"{table}.parquet"))
    return str(out)


def test_drift_table_is_structural_and_deterministic():
    fz = _fuzz()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    d1 = fz.drift_table(t, "documents", 0.05)
    d2 = fz.drift_table(t, "documents", 0.05)
    assert d1.schema == d2.schema                      # seeded
    assert "__drift_pad" in d1.schema.names            # trailing pad
    assert set(d1.schema.names) - {"__drift_pad"} == set(t.schema.names)
    # values unchanged where types allow direct comparison
    for name in t.schema.names:
        if d1.schema.field(name).type == t.schema.field(name).type:
            assert d1.column(name).equals(t.column(name)), name
        else:
            # value-preserving re-encode (int32 downcast fits by check)
            assert pc.all(pc.equal(
                d1.column(name).cast(t.schema.field(name).type),
                t.column(name))).as_py() in (True, None), name


def test_reader_projection_absorbs_drift(spark, drifted_dir):
    """_t() returns the canonical contract columns in declared order on
    a drifted file — pad dropped, permutation undone — so every
    schema-enumerating downstream (profile_table) sees the contract."""
    m = _entry()
    df = m._t(spark, drifted_dir, "documents")
    assert df.columns == m.TABLE_COLUMNS["documents"]
    raw = spark.read.parquet(os.path.join(drifted_dir,
                                          "documents.parquet"))
    assert "__drift_pad" in raw.columns       # the drift is real
    assert raw.columns != df.columns          # ...and was reordered
    clean = m._t(spark, "/root/testdata/sf0.001", "documents")
    got = {r["doc_id"]: r["text"] for r in
           df.select("doc_id", "text").collect()}
    want = {r["doc_id"]: r["text"] for r in
            clean.select("doc_id", "text").collect()}
    assert got == want                        # values byte-identical


@pytest.mark.parametrize("table,col", [("events", "ts"),
                                       ("orders", "o_orderdate"),
                                       ("lineitem", "l_shipdate")])
def test_temporal_reader_handles_ts_reencodings(spark, tmp_path,
                                                table, col):
    """The TEMPORAL_COLUMNS dispatch in _t (LongType → nanos DIV 1000;
    timestamp-like → cast to the declared type) covers every variant
    the drift dial writes, on EVERY temporal contract column — the r13
    battery caught the dial rotating o_orderdate/l_shipdate to
    INT64-nanos, which the then-events-only dispatch left unreadable
    (PARQUET_TYPE_ILLEGAL) for 14 queries."""
    m = _entry()
    base = pq.read_table(f"/root/testdata/sf0.001/{table}.parquet")
    fz = _fuzz()
    key = m.TABLE_COLUMNS[table][0]
    clean = m._t(spark, "/root/testdata/sf0.001", table)
    want_type = clean.schema[col].dataType
    want = sorted((r[key], r[col]) for r in
                  clean.select(key, col).limit(50).collect()
                  if r[key] is not None)
    for i, ty in enumerate(fz._TS_DRIFTS):
        out = tmp_path / f"{table}_v{i}"
        out.mkdir()
        idx = base.schema.names.index(col)
        t = base.set_column(idx, pa.field(col, ty),
                            base.column(col).cast(ty))
        pq.write_table(t, str(out / f"{table}.parquet"))
        df = m._t(spark, str(out), table)
        assert df.schema[col].dataType == want_type, \
            f"{ty}: normalized to {df.schema[col].dataType}"
        got = sorted((r[key], r[col]) for r in
                     df.select(key, col).limit(50).collect()
                     if r[key] is not None)
        assert got == want, f"{col} variant {ty} diverged"
