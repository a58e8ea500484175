"""NULL/empty-string contract fuzz — run the full oracle battery on
data the synthetic testdata never shows it.

Round-8 self-review found a latent attestation divergence: the Spark
side of the politeness scheduler try-casts and DROPS NULL arrivals,
while its DuckDB twin kept them — green today only because the current
``events.parquet`` happens to contain no NULL ``ts``. That is a CLASS
of bug (every per-row degradation contract has an oracle twin that
must state the same contract), and the class is only testable with
data that exercises it.

This tool copies an sf directory with deterministic fault injection —
every top-level column of every table gets ~``--null-rate`` NULLs, and
string columns additionally get ~``--empty-rate`` empty strings — then
runs ``tools/oracle_check.py`` against the fuzzed directory. Both
engines read identical bytes, so the ONLY thing asserted is that the
Spark query and its oracle SQL agree on degraded input: a hash
mismatch here is a contract divergence that will flip a real
attestation red the day the driver's testdata generator drifts (it has
drifted before: the events.ts physical-type change, CLAUDE.md).

The fuzzed directory is NOT the canonical attestation input —
``oracle_check`` refuses to refresh ``CORRECTNESS_local.json`` for
non-canonical sf dirs, so this run can never clobber the round
artifact.

Masks are seeded by crc32(table|column): identical across runs and
machines, so a failure reproduces exactly.

Usage: python tools/contract_fuzz.py [--src /root/testdata/sf0.001]
           [--out /tmp/fuzz_sf] [--null-rate 0.02] [--empty-rate 0.01]
           [--dup-rate 0] [--nan-rate 0] [--conflict-rate 0]
           [--permute-rows] [--unicode-rate 0] [--extreme-rate 0]
           [query ...]
Exit = oracle_check's exit (1 on any divergence).

``--extreme-rate`` (r12) is the numeric-boundary fault class: masked
numeric values are replaced with rotating extremes (±1e±30 doubles,
subnormals, ±DBL_MAX, ±1e32 just over the decimal(38,6) max,
LONG_MIN/LONG_MAX/negative ids, float32 values whose square is inf) —
overflow/saturation behavior across Spark ANSI vs DuckDB was the
largest untested class after r11's Unicode dial.

``--permute-rows`` (r11) is the scan-ORDER fault class: a seeded
physical row shuffle applied after every value-level dial, so clones
stop sitting appended-after their originals and any contract that
implicitly consumes parquet row order (rid-tagging twins, window-tie
stories) is exercised with an adversarial order. Order-insensitive
hashing means any red here is genuine order DEPENDENCE.

Extra fault classes: ``--dup-rate`` appends verbatim clones of ~that
fraction of rows (duplicate ids with identical content — stresses
keep-first/grouped vs per-row plans); ``--nan-rate`` replaces ~that
fraction of double values with NaN (a ~1/3 subset of those -inf —
stresses aggregate and comparison semantics; Spark orders NaN LAST
and NaN==NaN in joins, engines differ).

Both classes were CLOSED in round 9 (round-8 reconnaissance sized
them at 20/148 and 12/148 divergences) and now run in the committed
gate (``tools/run_gates.py`` gate 6 passes all dials together):

- duplicate-id contracts — repo-wide rules, stated per operator and
  pinned by ``tests/test_dup_contracts.py``: KEYED outputs (selection,
  pairs, clusters, per-doc scores, quota slots, diffs) collapse
  verbatim copies of one id, with the dedup riding an exchange the
  plan already pays; PER-ROW multiset outputs (fingerprints,
  chunks, encoders, label attaches) amplify per physical row and the
  twins tag physical rows (``row_number() OVER ()``) so windows can't
  interleave two copies of one doc; corpus-STATISTIC operators (bm25)
  merge rows of one id deterministically and document it.
- non-finite contracts — non-finite measure → NULL per row: Spark's
  ANSI double→decimal cast already yields NULL for NaN/±Inf, the
  twins mirror with ``isfinite`` guards (``_decg``/``_fin_sql`` in
  ``__spark_entry__.py``); exact-percentile/robust-stats operators
  exclude non-finite values from the statistic (row kept, flag NULL).

``--conflict-rate`` (r10, closed: 10/148 divergences found and fixed)
appends clones that KEEP each table's key columns and MUTATE every
other column (strings get a ``~c`` suffix, numerics shift, embeddings
perturb element 0) — same id, different content, the fault every
re-scrape of a changed page produces. Contracts settled
(``tests/test_conflict_contracts.py``): KEYED single-version panels
(cdc_chunks, novelty_score, train_classifier) resolve to the
deterministic min-md5(content) WINNER version; per-VERSION decision
operators (token_budget_fill, domain_quota) charge/rank each distinct
(id, contributing-columns) version and attach by the FULL version,
never id alone; per-PHYSICAL-ROW panels (benchmark_contamination)
score each row on its own content; diff sides reduce to per-id MIN
fingerprints (corpus_diff); order ties only divergent copies can
create are pinned with content (paragraph_dedup). Two engine-behavior
classes also surfaced: Spark's JSON functions are Jackson-prefix-
LENIENT vs strict validators (json_extract now pins the flat-object
common subset) and ``round(double, 6)`` diverges on exact 7-digit
halves (chained GD iterates now use IEEE floor-form rounding).

High-rate recon (r10): one pass with EVERY dial raised
(``--null-rate 0.05 --empty-rate 0.03 --dup-rate 0.05 --nan-rate 0.05
--conflict-rate 0.05``) found 5 more latent divergences the 2% gate's
row draws had missed, all NULL-id/copy ORDERING stories now pinned:
NULL-id rows could WIN paragraph fingerprints on one engine only
(Spark min-struct sorts NULL first, SQL row_number last), count toward
repeated-span min_docs on one engine only (dense_rank counts NULL as
a distinct value, count-DISTINCT ignores it), and flip bm25/hybrid's
corpus-derived rank-3 query term; copies of one doc put one span hit
at one position twice and window ties split the islands differently.
Re-run the high-rate pass whenever a new fault class lands — rates
change which rows collide, so 2%-green does not imply 5%-green.

``--unicode-rate`` (r11, closed: 41/149 divergences found at the 5 %
sizing recon — the largest class since round 8 — all fixed) splices a
rotating adversarial Unicode snippet into string values (prefix /
mid / suffix). Each snippet targets a MEASURED engine divergence (see
UNICODE_SNIPPETS below); the repo-wide contracts the fixes pinned,
enforced by ``tests/test_unicode_contracts.py``:

- CASEFOLD: token grammars lower via ``text.simple_lower`` (İ→i
  translate first — U+0130 is the single codepoint whose Java FULL
  lowercase projects into [a-z0-9_] differently from utf8proc's
  SIMPLE mapping); URL schemes/hostnames lower via ``text.ascii_lower``
  (RFC 3986/4343: case-insensitivity is ASCII-only), twins via
  ``translate(x, 'A..Z', 'a..z')``.
- WHITESPACE: ``\\s`` never appears in a shared pattern (Java includes
  U+000B, RE2 does not); both sides embed ``text.WS_CHARS``.
- (?i)/\\b: RE2 case-folds the full Unicode fold set ((?i) makes ſ
  match [sS]) and Java's \\b is Unicode-aware — HTML tag and scheme
  patterns use per-letter ASCII classes and explicit ASCII-non-word
  boundaries (``extraction.SCRIPT_BLOCK_RE`` etc.), shared verbatim
  with the twins.
- EDIT DISTANCE: Spark levenshtein counts codepoints, DuckDB bytes —
  linkage blocks/measures over ``linkage.linkage_key`` (ascii_fold →
  printable-ASCII projection; empty projection = unlinkable).
- Closed-form URL twins became REAL SQL parses (``_canon_url_ctes``/
  ``_url_host_sql`` in ``__spark_entry__``): a fuzzed value can carry
  '/' and move the host/path boundary, which no closed form over the
  spliced-in column can express.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Key columns preserved by --conflict-rate clones: the clone keeps the
# key and mutates every OTHER column — the fault a real incremental
# ingest produces on every re-scrape of a changed page (same id,
# different content).
KEYS = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey"},
    "lineitem": {"l_orderkey", "l_linenumber"},
    "events": {"event_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


def _mutate_column(field: pa.Field, col: pa.ChunkedArray):
    """Deterministic content mutation for conflict clones; NULL stays
    NULL, NaN/-inf stay non-finite (the dials compose)."""
    if pa.types.is_string(field.type):
        return pc.binary_join_element_wise(col, pa.scalar("~c"), "")
    if pa.types.is_floating(field.type):
        return pc.add(col, pa.scalar(1.5, type=field.type))
    if pa.types.is_integer(field.type):
        return pc.add(col, pa.scalar(1, type=field.type))
    if pa.types.is_timestamp(field.type):
        return pc.add(col, pa.scalar(1_000_000, type=pa.duration("us")))
    if pa.types.is_list(field.type):
        vals = col.to_pylist()
        vals = [None if v is None
                else ([v[0] + 0.25] + v[1:] if len(v) else v)
                for v in vals]
        return pa.chunked_array([pa.array(vals, type=field.type)])
    return col


def _mask(table: str, col: str, n: int, rate: float, salt: str = "") -> np.ndarray:
    seed = zlib.crc32(f"{table}|{col}|{salt}".encode())
    return np.random.default_rng(seed).random(n) < rate


# --unicode-rate snippets (r11): one per divergence class the round-11
# engine probes measured (exhaustive per-codepoint lower/upper diff +
# function-level probes), rotated per (table, column, row). Each is a
# REAL cross-engine hazard, not decoration:
#   0 U+0130 İ — the ONE codepoint whose Java FULL lowercase ('i'+U+0307)
#     projects into [a-z0-9_] differently from utf8proc's SIMPLE 'i'
#   1 U+000B VT — in Java's \s, NOT in DuckDB/RE2's \s
#   2 U+017F ſ — RE2 (?i) case-folds it into [sS]; Java (?i) does not
#     (script/style/https patterns), embedded in a fake closing tag
#   3 final sigma — Java lower() is context-sensitive (ς at word end),
#     utf8proc always σ
#   4 ß + fi-ligature — full vs simple UPPER mapping (SS/FI vs ẞ/ﬁ)
#   5 NFD combining sequence — grapheme-vs-codepoint surfaces (reverse,
#     levenshtein), NFC/NFD inequality under byte comparison
#   6 astral plane — 4-byte UTF-8 / surrogate pairs (byte-based
#     levenshtein, length/substr arithmetic)
#   7 NBSP + ZWSP + ZWJ — whitespace-lookalikes no \s should match
#   8 bidi controls — RLO/PDF sandwich
#   9 U+2C2F Ⱟ + U+10570 𐕰 — Unicode-version skew: Java knows these
#     case pairs, utf8proc does not (raw lower() output divergence)
#  10 fullwidth digits — [0-9] must not match them on either engine
#  11 KELVIN + ANGSTROM signs — simple fold into k/å
#  12 CJK + NEL — non-Latin script ranges, U+0085 (in neither \s)
UNICODE_SNIPPETS = [
    "İstanbul",
    "a\x0bb",
    "x<ſcript>y</ſcript>z",
    "ΛΟΓΟΣ",
    "straße ofﬁce",
    "éclair café",
    "\U0001F600\U0001D49Cq",
    "a b​c‍d",
    "ab‮cd‬ef",
    "Ⱟ\U00010570w",
    "１２３",
    "KÅm",
    "中文t",
]


def _inject_unicode(col: pa.ChunkedArray, field: pa.Field,
                    mask: np.ndarray, table: str, name: str):
    """Splice a rotating adversarial snippet into masked string values:
    position rotates prefix/middle/suffix so the snippet lands at token
    starts, token interiors, and token ends. NULLs stay NULL; prior
    dials (empty strings) compose — an emptied value becomes just the
    snippet."""
    base = zlib.crc32(f"{table}|{name}|uni".encode())
    vals = col.to_pylist()
    out = []
    for i, v in enumerate(vals):
        if v is None or not mask[i]:
            out.append(v)
            continue
        snip = UNICODE_SNIPPETS[(base + i) % len(UNICODE_SNIPPETS)]
        mode = (base + i) % 3
        if mode == 0:
            out.append(snip + v)
        elif mode == 1:
            mid = len(v) // 2
            out.append(v[:mid] + snip + v[mid:])
        else:
            out.append(v + snip)
    return pa.chunked_array([pa.array(out, type=field.type)])


# --extreme-rate value pools (r12): numeric boundary values rotated per
# (table, column, row). Each is a REAL cross-engine hazard class:
#   doubles — ±1e30/±1e-30 (magnitude stress through round/sum chains),
#   5e-324 (subnormal), ±DBL_MAX (any *2 or square → ±inf), ±1e32
#   (just ABOVE decimal(38,6)'s ~9.99e31 max: ANSI cast aborts vs
#   DuckDB behavior), 9.9e31 (just below — must survive).
#   int64 — LONG_MIN (abs/negate aborts under ANSI), LONG_MIN+1,
#   LONG_MAX (any +1 wraps/aborts), -1 and a -1e18 mid-range negative
#   (sign behavior of % and substr arithmetic in synthesized inputs).
#   float32 (embedding lists) — 3e38 (square → inf in float32 math),
#   ±1e30, 1e-30, 6e-39 (float32 subnormal).
EXTREME_DOUBLES = [1e30, -1e30, 1e-30, -1e-30, 5e-324,
                   1.7976931348623157e308, -1.7976931348623157e308,
                   1e32, -1e32, 9.9e31]
EXTREME_INT64 = [-9223372036854775808, -9223372036854775807,
                 9223372036854775807, -1, -1_000_000_000_000_000_000]
EXTREME_INT32 = [-2147483648, -2147483647, 2147483647, -1]
EXTREME_FLOAT32 = [3e38, 1e30, -1e30, 1e-30, 6e-39]


def _inject_extremes(col: pa.ChunkedArray, field: pa.Field,
                     mask: np.ndarray, table: str, name: str):
    """Replace masked numeric values with rotating boundary values;
    NULLs stay NULL (the dials compose). List<float> columns get the
    extreme spliced into element 0 of non-empty lists."""
    base = zlib.crc32(f"{table}|{name}|extreme".encode())
    if pa.types.is_list(field.type):
        vals = col.to_pylist()
        out = []
        for i, v in enumerate(vals):
            if v is None or not mask[i] or not v:
                out.append(v)
                continue
            ex = EXTREME_FLOAT32[(base + i) % len(EXTREME_FLOAT32)]
            out.append([ex] + v[1:])
        return pa.chunked_array([pa.array(out, type=field.type)])
    if pa.types.is_floating(field.type):
        pool = EXTREME_DOUBLES
    elif pa.types.is_integer(field.type):
        pool = EXTREME_INT64 if field.type.bit_width == 64 \
            else EXTREME_INT32
    else:
        return col
    vals = col.to_pylist()
    out = [v if (v is None or not mask[i])
           else pool[(base + i) % len(pool)]
           for i, v in enumerate(vals)]
    return pa.chunked_array([pa.array(out, type=field.type)])


def _drift_seedval(table: str, name: str, salt: str) -> float:
    """Deterministic per-column draw in [0, 1) for schema-level drift
    decisions (drift is per COLUMN, not per row)."""
    return (zlib.crc32(f"{table}|{name}|{salt}".encode()) % 10**6) / 10**6


#: rotation of value-preserving physical timestamp encodings for the
#: drift dial — the events.ts fault class that has ALREADY bitten once
#: (TESTDATA: INT64 nanos ↔ TIMESTAMP micros NTZ across driver rounds).
#: 'us'/'ns' units are exact upcasts of micro-precision data; the tz
#: flavor flips NTZ ↔ UTC-adjusted (Spark: TimestampNTZType ↔
#: TimestampType under the pinned UTC session; DuckDB: TIMESTAMP ↔
#: TIMESTAMPTZ — epoch_us is total on both).
_TS_DRIFTS = [pa.timestamp("ns"),            # Spark nanosAsLong → BIGINT
              pa.timestamp("us", tz="UTC"),
              pa.timestamp("ns", tz="UTC")]


def drift_table(t: pa.Table, table: str, rate: float) -> pa.Table:
    """--drift-rate (r13): schema/physical-encoding drift with the
    LOGICAL values unchanged — both engines still read the same bytes,
    so any divergence is reader-schema DEPENDENCE (positional column
    addressing, hard-coded physical types, schema-enumerating
    operators). Faults, all seeded+deterministic:

    - int64 → int32 downcast where every value fits (per-column draw
      at ``min(1, rate × 25)`` — drift is schema-level, so the row-rate
      dial scales per-column applicability: the 2 % gate drifts ~half
      the eligible columns, the 5 % gate all of them);
    - timestamp physical re-encoding (unit ns / tz-adjusted rotation,
      variant chosen by the column's seed draw);
    - one trailing ``__drift_pad`` column appended (readers must
      project their contract, not ``SELECT *``);
    - a seeded physical column-order permutation.
    """
    if rate <= 0:
        return t
    p_col = min(1.0, rate * 25)
    for idx, name in enumerate(t.schema.names):
        field = t.schema.field(name)
        col = t.column(name)
        if (pa.types.is_int64(field.type)
                and _drift_seedval(table, name, "drift-i32") < p_col):
            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            if (mn is not None and mx is not None
                    and -2**31 <= mn and mx < 2**31):
                t = t.set_column(idx, pa.field(name, pa.int32()),
                                 col.cast(pa.int32()))
        elif (pa.types.is_timestamp(field.type)
                and _drift_seedval(table, name, "drift-ts") < p_col):
            variant = _TS_DRIFTS[
                zlib.crc32(f"{table}|{name}|tsvar".encode())
                % len(_TS_DRIFTS)]
            t = t.set_column(idx, pa.field(name, variant),
                             col.cast(variant))
    t = t.append_column(
        "__drift_pad",
        pa.chunked_array([pa.array(["pad"] * t.num_rows)]))
    perm_seed = zlib.crc32(f"{table}|drift-colperm".encode())
    order = np.random.default_rng(perm_seed).permutation(
        len(t.schema.names))
    return t.select([t.schema.names[i] for i in order])


def fuzz_table(path: str, table: str, null_rate: float,
               empty_rate: float, dup_rate: float = 0.0,
               nan_rate: float = 0.0,
               conflict_rate: float = 0.0,
               permute_rows: bool = False,
               unicode_rate: float = 0.0,
               extreme_rate: float = 0.0,
               drift_rate: float = 0.0) -> pa.Table:
    t = pq.read_table(path)
    n = t.num_rows
    for idx, name in enumerate(t.schema.names):
        field = t.schema.field(name)
        col = t.column(name)
        nulls = _mask(table, name, n, null_rate)
        if nulls.any():
            col = pc.if_else(pa.array(~nulls), col,
                             pa.scalar(None, type=field.type))
        if extreme_rate and (pa.types.is_floating(field.type)
                             or pa.types.is_integer(field.type)
                             or pa.types.is_list(field.type)):
            exts = _mask(table, name, n, extreme_rate, salt="extreme")
            if exts.any():
                col = _inject_extremes(col, field, exts, table, name)
        if pa.types.is_string(field.type):
            empties = _mask(table, name, n, empty_rate, salt="empty")
            if empties.any():
                col = pc.if_else(pa.array(~empties), col,
                                 pa.scalar("", type=field.type))
            if unicode_rate:
                unis = _mask(table, name, n, unicode_rate, salt="uni")
                if unis.any():
                    col = _inject_unicode(col, field, unis, table, name)
        if nan_rate and pa.types.is_floating(field.type):
            nans = _mask(table, name, n, nan_rate, salt="nan")
            if nans.any():
                # -inf sites are a ~1/3 SUBSET of the NaN'd rows (ADVICE r8:
                # an independent mask overwrote values that were never NaN'd,
                # including previously injected NULLs).
                infs = nans & _mask(table, name, n, 1.0 / 3, salt="inf")
                col = pc.if_else(pa.array(~nans), col,
                                 pa.scalar(float("nan"), type=field.type))
                col = pc.if_else(pa.array(~infs), col,
                                 pa.scalar(float("-inf"), type=field.type))
        t = t.set_column(idx, field, col)
    if dup_rate:
        dups = _mask(table, "__row__", n, dup_rate, salt="dup")
        if dups.any():
            t = pa.concat_tables([t, t.filter(pa.array(dups))])
    if conflict_rate:
        # clone from the post-fault base rows (NOT the verbatim dups):
        # same key, every other column mutated
        confl = _mask(table, "__row__", n, conflict_rate, salt="conflict")
        if confl.any():
            clone = t.slice(0, n).filter(pa.array(confl))
            for idx, name in enumerate(clone.schema.names):
                if name in KEYS[table]:
                    continue
                field = clone.schema.field(name)
                clone = clone.set_column(
                    idx, field, _mutate_column(field, clone.column(name)))
            t = pa.concat_tables([t, clone])
    if drift_rate:
        # schema-level drift AFTER the value dials (downcast eligibility
        # must see injected extremes) and BEFORE the row permute
        # (column drift is row-order-independent)
        t = drift_table(t, table, drift_rate)
    if permute_rows:
        # LAST, over everything including appended clones: a seeded
        # physical row-order shuffle. Parquet row order is the one
        # degree of freedom the value-level dials never move — and the
        # rid-tagging twins (row_number() OVER () as the physical-row
        # handle) plus every window-tie contract implicitly consume it.
        # Both engines read the same permuted bytes, and the oracle
        # hash is order-insensitive, so ANY divergence here is genuine
        # scan-order DEPENDENCE (a tie broken by input order on one
        # engine only), not cosmetic output ordering. It also unsticks
        # a hidden invariant of the dup/conflict dials: clones always
        # sat APPENDED AFTER their originals, so rid-window contracts
        # were only ever tested with original-before-copy adjacency.
        seed = zlib.crc32(f"{table}|permute".encode())
        perm = np.random.default_rng(seed).permutation(t.num_rows)
        t = t.take(pa.array(perm))
    return t


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/fuzz_sf")
    ap.add_argument("--null-rate", type=float, default=0.02)
    ap.add_argument("--empty-rate", type=float, default=0.01)
    ap.add_argument("--dup-rate", type=float, default=0.0)
    ap.add_argument("--nan-rate", type=float, default=0.0)
    ap.add_argument("--conflict-rate", type=float, default=0.0)
    ap.add_argument("--permute-rows", action="store_true",
                    help="seeded physical row-order shuffle, applied "
                         "after every other fault (scan-order "
                         "dependence detector)")
    ap.add_argument("--unicode-rate", type=float, default=0.0,
                    help="fraction of string values spliced with a "
                         "rotating adversarial Unicode snippet (full-vs-"
                         "simple case mapping, \\s membership, RE2 (?i) "
                         "folding, byte-vs-codepoint distances)")
    ap.add_argument("--extreme-rate", type=float, default=0.0,
                    help="fraction of numeric values replaced with "
                         "rotating boundary values (±1e±30, subnormals, "
                         "±DBL_MAX, decimal(38,6) overflow edge, "
                         "LONG_MIN/MAX ids, float32-inf squares)")
    ap.add_argument("--drift-rate", type=float, default=0.0,
                    help="schema/physical-encoding drift, values "
                         "unchanged: int64→int32 where it fits, "
                         "timestamp unit/tz re-encoding, a trailing pad "
                         "column, column-order permutation (per-column "
                         "probability = rate × 25)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for table in TABLES:
        src = os.path.join(args.src, f"{table}.parquet")
        fuzzed = fuzz_table(src, table, args.null_rate, args.empty_rate,
                            args.dup_rate, args.nan_rate,
                            args.conflict_rate, args.permute_rows,
                            args.unicode_rate, args.extreme_rate,
                            args.drift_rate)
        pq.write_table(fuzzed, os.path.join(args.out, f"{table}.parquet"))
        injected = sum(fuzzed.column(c).null_count
                       for c in fuzzed.schema.names)
        print(f"# fuzzed {table}: {fuzzed.num_rows} rows, "
              f"{injected} NULLs injected")

    cmd = [sys.executable, os.path.join(ROOT, "tools", "oracle_check.py"),
           args.out, *args.queries]
    return subprocess.run(cmd, cwd=ROOT).returncode


if __name__ == "__main__":
    sys.exit(main())
