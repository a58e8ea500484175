"""URL canonicalization for web-corpus curation.

Web-scale training corpora dedup first by canonical URL — it is free
relative to content hashing (no document bytes touched) and catches the
bulk of crawl-level duplication: scheme/case variants, ``www.``
prefixes, default ports, tracking parameters, query-parameter order,
trailing slashes, fragments. The rules here are the common subset of
the RFC 3986 §6 normalizations plus the tracking-parameter strip every
production crawler applies.

Everything is native Spark SQL expressions (regex + higher-order array
functions, no Python in the row path), so canonicalization is a pure
zero-shuffle projection at any corpus size, and the same rules are
closed-form expressible in ANSI SQL for the DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from zacks_estimates_financial_statements_spark.functions.text import ascii_lower

#: default strip set: parameters that are UNAMBIGUOUSLY analytics/click
#: tracking. Deliberately excludes bare ``ref``/``source``-style names —
#: on plenty of sites (code hosts' ``?ref=branch``, docs sites'
#: ``?ref=section``) they select CONTENT, and stripping them collapses
#: distinct resources into one canonical URL so keep-first dedup drops
#: real documents. Crawls that know their domains can widen the set via
#: the ``strip_params`` argument.
DEFAULT_TRACKING_PARAMS = ("utm_*", "gclid", "fbclid", "msclkid",
                           "mc_cid", "mc_eid")


def _strip_re(params: tuple[str, ...]) -> str:
    """``^(p1|p2|...)=`` matcher for ``name=value`` query parts; a
    trailing ``*`` in a name matches any suffix (``utm_*``)."""
    import re as _re

    alts = [_re.escape(p[:-1]) + "[^=]*" if p.endswith("*")
            else _re.escape(p) for p in params]
    return "^(" + "|".join(alts) + ")="


#: prebuilt regex for the default strip set (kept for oracle SQL reuse)
TRACKING_PARAM_RE = _strip_re(DEFAULT_TRACKING_PARAMS)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonical_url(url: Column,
                  strip_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
                  ) -> Column:
    """RFC 3986-style canonical form of an absolute http(s) URL:

    - fragment dropped;
    - scheme and host lowercased (path/query case is significant and
      preserved);
    - leading ``www.`` and the scheme's default port stripped;
    - tracking parameters removed (``strip_params``, default
      ``DEFAULT_TRACKING_PARAMS``; ``*`` suffix = prefix match),
      remaining query parameters sorted bytewise;
    - trailing path slashes trimmed (empty path becomes ``/``).

    Pure expression — compose inside any projection. Inputs without a
    ``scheme://`` prefix pass through the same host/path rules with an
    empty scheme.
    """
    u = F.regexp_replace(url, "#.*$", "")
    scheme = ascii_lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = ascii_lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1),
                            "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(pathq, r"\?(.*)$", 1)
    strip_re = _strip_re(tuple(strip_params))
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(strip_re))
    qs = F.array_join(F.array_sort(params), "&")
    # scheme-less inputs keep their shape (no bare '://' prefix), which
    # is also what makes canonical(canonical(u)) a fixed point for them
    prefix = F.when(scheme == "", F.lit("")) \
        .otherwise(F.concat(scheme, F.lit("://")))
    return F.concat(
        prefix, host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))


def url_host(url: Column) -> Column:
    """Lowercased host (www. and port stripped) — the domain-level
    grouping key for per-site quotas/blocklists."""
    rest = F.regexp_replace(F.regexp_replace(url, "#.*$", ""),
                            _SCHEME_RE, "")
    hostport = ascii_lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    return F.regexp_replace(F.regexp_replace(hostport, r"^www\.", ""),
                            r":[0-9]+$", "")


def url_dedup(df: DataFrame, id_col: str, url_col: str,
              strip_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
              ) -> DataFrame:
    """Crawl-level URL dedup: canonicalize, then keep the minimum-id row
    per canonical URL. Adds ``canonical_url``, ``n_variants`` (rows
    collapsing to this canonical form) and ``keep``.

    One shuffle (the window on the canonical string); canonicalization
    itself is projection-only. The same keep-first-by-id convention as
    ``dedup.exact_dup_groups``. ``strip_params`` passes through to
    ``canonical_url``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("canonical_url")
    out = (df.withColumn("canonical_url",
                         canonical_url(F.col(url_col), strip_params))
           .withColumn("n_variants", F.count("*").over(w))
           .withColumn("keep",
                       F.col(id_col) == F.min(id_col).over(w)))
    return out


#: literal-tier bound: each blocked domain adds one when-chain node,
#: and every node is a py4j round-trip at build time plus an analyzer
#: term — a multi-million-entry UT1 list as a Python sequence would
#: build an unusable expression tree (the repo's generated-wide-
#: expression rule). Larger sequences auto-convert to the relation
#: tier (r13, ADVICE).
_URL_FILTER_LITERAL_MAX = 1000


def url_filter(df: DataFrame, id_col: str, url_col: str,
               blocked_domains: "DataFrame | Sequence[str] | None" = None,
               blocked_patterns: tuple[str, ...] = ()) -> DataFrame:
    """URL blocklist gate — the UT1/RefinedWeb-style crawl filter:
    flag rows whose host falls under a blocked domain (suffix match on
    dot boundaries: ``evil.com`` blocks ``sub.evil.com`` but NOT
    ``notevil.com``) or whose URL matches a blocked regex (adult /
    gambling / tracker path patterns).

    ``blocked_domains``: either a plain SEQUENCE of domain strings
    (hand-maintained lists — like ``blocked_patterns``) or a 1-column
    DataFrame ``(domain)`` (list FILES are relations, so they stay out
    of the driver except the broadcast). ``blocked_patterns``:
    Java∩RE2-safe regexes, tried in order; the FIRST match is reported.

    Output: ``(id, url, host, matched_domain, matched_pattern, keep)``
    — one row per input, annotate-don't-drop (the gopher_gate
    convention); ``matched_domain`` is the LONGEST blocked suffix.

    Scale shape, by blocklist form (r12):

    - sequence: the longest-suffix match compiles into ONE codegen
      when-chain projection, longest domain first — zero joins, zero
      shuffles, no extra jobs, no second pass over the input lineage.
      (BENCH_r11 flagged the join tier's 3 extra stages + double
      base-lineage pass as url_filter's residual; a driver-side
      size-gate ``limit().collect()`` was measured at ~1 s of pure
      job overhead on an idle local[32], so the fast tier is chosen
      by INPUT TYPE, not by a hidden sizing job.)
    - DataFrame (UT1-class lists run ~4M domains): the host's
      dot-suffix chain (≤ label count) explodes and equi-joins the
      size-gated BROADCAST blocklist in codegen — the corpus never
      shuffles for the filter; only MATCHED rows aggregate (max_by
      suffix length) and join back by id (AQE broadcasts the matched
      relation while small — a pervasively-blocked corpus degrades to
      one skew-splittable equi-join, never a regex scan per entry).

    Pattern flags are a zero-shuffle projection in both tiers.
    """
    base = (df.select(F.col(id_col), F.col(url_col).alias("url"))
            .withColumn("host", url_host(F.col("url")))
            .withColumn("__labels", F.split("host", r"\.")))
    pat_col = F.lit(None).cast("string")
    for p in reversed(blocked_patterns):
        pat_col = F.when(F.col("url").rlike(p), F.lit(p)) \
            .otherwise(pat_col)
    if blocked_domains is None:
        return base.select(
            id_col, "url", "host",
            F.lit(None).cast("string").alias("matched_domain"),
            pat_col.alias("matched_pattern")).withColumn(
                "keep", F.col("matched_pattern").isNull())
    if not isinstance(blocked_domains, DataFrame):
        doms = sorted({d for d in blocked_domains if d is not None},
                      key=lambda d: (len(d), d))
        if len(doms) > _URL_FILTER_LITERAL_MAX:
            # too big for an expression tree: route through the
            # relation tier instead of building a 4M-node when-chain
            blocked_domains = df.sparkSession.createDataFrame(
                [(d,) for d in doms], "domain string")
            return url_filter(df, id_col, url_col, blocked_domains,
                              blocked_patterns)
        md = F.lit(None).cast("string")
        for dom in doms:   # ascending → the LAST wrap (longest) wins
            md = F.when((F.col("host") == dom)
                        | F.col("host").endswith("." + dom),
                        F.lit(dom)).otherwise(md)
        return (base.select(id_col, "url", "host",
                            md.alias("matched_domain"),
                            pat_col.alias("matched_pattern"))
                .withColumn("keep", F.col("matched_domain").isNull()
                            & F.col("matched_pattern").isNull()))
    dom_col = blocked_domains.columns[0]
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size("__labels")),
        lambda i: F.array_join(
            F.slice(F.col("__labels"), i,
                    F.size("__labels") - i + 1), "."))
    # the blocklist is a user-supplied relation (UT1-class lists run
    # ~4M domains): size-gate the broadcast hint so a pathologically
    # large list degrades to an AQE-planned equi-join instead of a
    # forced executor-wide broadcast
    from zacks_estimates_financial_statements_spark.util import maybe_broadcast

    cand = (base.select(F.col(id_col),
                        F.explode_outer(suffixes).alias("__cand"))
            .join(maybe_broadcast(blocked_domains.select(
                F.col(dom_col).alias("__cand"))),
                "__cand"))
    hits = (cand.groupBy(id_col)
            .agg(F.max_by("__cand", F.length("__cand"))
                 .alias("matched_domain")))
    return (base.join(hits, id_col, "left")
            .select(id_col, "url", "host", "matched_domain",
                    pat_col.alias("matched_pattern"))
            .withColumn("keep", F.col("matched_domain").isNull()
                        & F.col("matched_pattern").isNull()))


def politeness_schedule(df: DataFrame, key_col: str, id_col: str,
                        ts_col: str,
                        interval_sec: float = 10.0) -> DataFrame:
    """Per-key politeness scheduling — the batch planner for the
    reference's rate-limited fetch loops (estimate pages: 1 symbol /
    10 s, `/root/reference/estimate-extract.rkt:89-98`; statements:
    `delay-interval 12`, `financial-statement-extract.rkt:118-131`):
    given fetch *requests* ``(key, id, arrival ts)``, assign each the
    earliest dispatch time such that two fetches against the same key
    (host / rate-limit domain) are >= ``interval_sec`` apart, in
    arrival order.

    The recurrence ``sched_i = max(arr_i, sched_{i-1} + I)`` is
    sequential, but unrolls to the CLOSED FORM
    ``sched_i = i*I + max_{j<=i}(arr_j - j*I)`` — so the whole
    schedule is ONE running-max window per key (a single shuffle on
    the rate-limit key, no iteration, no UDF), and adding a new day of
    requests recomputes in one pass at any scale.

    Output: ``(key, id, arrival_us, sched_us, wait_us, position)``
    with times as epoch-microsecond BIGINTs (the repo's cross-engine
    timestamp convention) and ``position`` the 0-based fetch index
    within the key. ``wait_us`` is the rate-limit delay imposed on the
    request; its per-key mean is the politeness cost of the crawl.

    NULL-arrival contract: the timestamp is parsed with ``try_cast``
    (Spark 4 runs ANSI — a plain cast would abort the whole job on one
    malformed row). Rows whose timestamp fails to parse (or is NULL)
    are FILTERED OUT of the schedule — an unparseable arrival has no
    position in the arrival order. Quarantine them upstream with
    ``try_cast(ts as timestamp) IS NULL`` if they need surfacing; the
    streaming twin (``streaming.schedule_fetches``) applies the same
    rule so batch and stream stay unified.

    NULL-id contract: rows with a NULL ``id_col`` are likewise dropped.
    The id is the arrival-order tie-break, and a NULL there is a
    cross-engine ordering trap (Spark windows sort NULLs FIRST
    ascending, DuckDB LAST, pandas tuple sort puts NaN last): two
    same-host requests tying on ``arrival_us`` with one NULL id would
    get engine-dependent positions — and every downstream position is
    shifted either way. Repo rule: an unaddressable request cannot be
    scheduled (same contract as ``sessionize_batch``).
    """
    from pyspark.sql import Window

    if interval_sec <= 0:
        raise ValueError(f"interval_sec must be > 0: {interval_sec}")
    iv = int(round(interval_sec * 1_000_000))
    w = Window.partitionBy(key_col).orderBy("arrival_us", id_col)
    base = (df.select(
        F.col(key_col), F.col(id_col),
        F.unix_micros(F.col(ts_col).try_cast("timestamp"))
        .alias("arrival_us"))
        .where(F.col("arrival_us").isNotNull()
               & F.col(id_col).isNotNull()))
    pos = (F.row_number().over(w) - 1).cast("bigint")
    sched = (base
             .withColumn("position", pos)
             .withColumn("__slack",
                         F.col("arrival_us") - F.col("position") * iv)
             .withColumn(
                 "sched_us",
                 F.col("position") * iv
                 + F.max("__slack").over(
                     w.rowsBetween(Window.unboundedPreceding,
                                   Window.currentRow))))
    return sched.select(
        key_col, id_col, "arrival_us", "sched_us",
        (F.col("sched_us") - F.col("arrival_us")).alias("wait_us"),
        "position")


def registrable_domain(df: DataFrame, id_col: str, url_col: str,
                       suffixes: DataFrame,
                       suffix_col: str = "suffix") -> DataFrame:
    """Registrable-domain (eTLD+1) extraction against a public-suffix
    list — the grouping key ``domain_quota`` / ``pagerank`` should use
    (grouping by raw host splits one site into subdomain shards;
    grouping by bare TLD merges unrelated sites under ``co.uk``).

    Public-suffix semantics (the PSL algorithm's common case): the
    LONGEST listed suffix that tail-matches the host's dot-separated
    labels wins; the registrable domain is that suffix plus ONE more
    label. An unlisted TLD falls back to the last label (PSL's
    implicit ``*`` rule); a host that IS a public suffix has no
    registrable domain (NULL).

    Output: ``(id, url, host, public_suffix, registrable)``.

    Plan shape: each host explodes into its ≤ label-count suffix
    chain, inner-joins the BROADCAST suffix list, and a per-id min
    picks the longest match — the corpus never shuffles for the
    match (same argument as ``url_filter``); the only exchange is the
    per-id min over matched rows, bounded by match count ≤ one row
    per host label.
    """
    host = url_host(F.col(url_col))
    base = df.select(F.col(id_col), F.col(url_col).alias("url"),
                     host.alias("host"))
    labels = F.split("host", r"\.")
    n = F.size(labels)
    cand = (base
            .select(F.col(id_col),
                    F.posexplode(F.transform(
                        F.sequence(F.lit(1), n),
                        lambda i: F.concat_ws(
                            ".", F.slice(labels, i, n - i + 1))))
                    .alias("__i0", "__cand")))
    sfx = suffixes.select(ascii_lower(F.col(suffix_col)).alias("__cand"))
    best = (cand.join(F.broadcast(sfx), "__cand")
            .groupBy(id_col)
            .agg((F.min("__i0") + 1).alias("__s")))
    out = base.join(best, id_col, "left")
    labels_o = F.split("host", r"\.")
    n_o = F.size(labels_o)
    s = F.coalesce(F.col("__s"), n_o)
    return out.select(
        F.col(id_col), "url", "host",
        F.concat_ws(".", F.slice(labels_o, s, n_o - s + 1))
        .alias("public_suffix"),
        F.when(s >= 2,
               F.concat_ws(".", F.slice(labels_o, s - 1, n_o - s + 2)))
        .alias("registrable"))


def parse_robots(df: DataFrame, host_col: str,
                 robots_col: str) -> DataFrame:
    """Parse robots.txt files into a rules RELATION — the crawl-side
    companion of ``politeness_schedule`` / ``url_filter`` (the
    reference is itself a rate-limited scraper; a real crawl of its
    kind must honor robots): one row per (host, agent, rule), from
    the original 1994 semantics RFC 9309 §2.2 formalizes —
    ``User-agent`` lines open a group (CONSECUTIVE agent lines share
    it), following ``Allow``/``Disallow`` lines attach to that group,
    ``#`` comments and blank lines ignored, empty-path rules dropped
    (an empty Disallow allows everything). Path wildcards (``*``,
    ``$``) are NOT interpreted — prefixes are literal (documented
    subset; flag such rules upstream if needed).

    Output: ``(host, agent, allow, prefix, rule_order)`` — ``agent``
    lowercased, ``rule_order`` the rule line's index within its file
    (RFC tie-breaks don't need it — longest-prefix + allow-wins is
    order-free — but audits do).

    Plan shape: one line posexplode, two windows PER HOST (group
    boundary lag + running group id) — robots files are KB-sized, so
    a per-host window partition is bounded by file lines, never
    corpus-scale — then one (host, group) equi-join between the
    group's agent rows and its directive rows. No UDF, no driver
    parsing.
    """
    from pyspark.sql import Window

    lines = (df.select(F.col(host_col).alias("host"),
                       F.posexplode(F.split(F.col(robots_col), "\n"))
                       .alias("__i", "__l0"))
             .withColumn("__l", F.trim(F.regexp_replace("__l0",
                                                        "#.*$", "")))
             .filter(F.col("__l") != ""))
    kv = lines.select(
        "host", "__i",
        ascii_lower(F.trim(F.regexp_extract("__l", r"^([^:]+):", 1)))
        .alias("__k"),
        F.trim(F.regexp_extract("__l", r"^[^:]+:(.*)$", 1))
        .alias("__v"))
    kv = kv.filter(F.col("__k").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("__i")
    marked = (kv.withColumn("__ua", F.col("__k") == "user-agent")
              .withColumn("__prev_ua",
                          F.coalesce(F.lag("__ua").over(w),
                                     F.lit(False)))
              .withColumn("__b", (F.col("__ua")
                                  & ~F.col("__prev_ua")).cast("int"))
              .withColumn("__grp", F.sum("__b").over(
                  w.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))))
    agents = (marked.filter(F.col("__ua"))
              .select("host", "__grp",
                      ascii_lower(F.col("__v")).alias("agent")))
    rules = (marked.filter(~F.col("__ua") & (F.col("__v") != ""))
             .select("host", "__grp",
                     (F.col("__k") == "allow").alias("allow"),
                     F.col("__v").alias("prefix"),
                     F.col("__i").cast("bigint").alias("rule_order")))
    return agents.join(rules, ["host", "__grp"]).drop("__grp")


def robots_allowed(urls: DataFrame, rules: DataFrame, id_col: str,
                   url_col: str, agent: str = "*") -> DataFrame:
    """Evaluate crawl permission for every URL against a
    ``parse_robots`` rules relation, RFC 9309 §2.2.2 semantics for
    the literal-prefix subset: pick the host's matching group (an
    EXACT agent match excludes the ``*`` group — most-specific-group
    rule), find every rule whose prefix literally prefixes the URL
    path, and let the LONGEST prefix decide; at equal length, Allow
    wins. No matching rule (or no robots at all) = allowed.

    Output: ``(id, url, host, path, allowed, matched_prefix)``.

    Plan shape: per-host group selection is a tiny aggregation over
    the rules relation (bounded by robots lines); the URL check is
    ONE host equi-join carrying the ``startswith`` residual — the
    corpus side shuffles once on the host, matches are bounded by
    rules-per-host, and the winner is ``max_by`` over a
    ``(len(prefix), allow)`` struct in the per-id aggregation — no
    window over the matched relation.
    """
    a = agent.strip().lower()
    host = url_host(F.col(url_col))
    pathq = F.regexp_replace(
        F.regexp_replace(F.col(url_col), "#.*$", ""),
        r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    path = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    base = urls.select(F.col(id_col), F.col(url_col).alias("url"),
                       host.alias("host"), path.alias("path"))
    cand = rules.filter(F.col("agent").isin(a, "*"))
    has_exact = (cand.groupBy("host")
                 .agg(F.max((F.col("agent") == a).cast("int"))
                      .alias("__ex")))
    grp = (cand.join(has_exact, "host")
           .filter(((F.col("agent") == a) & (F.col("__ex") == 1))
                   | ((F.col("agent") == "*") & (F.col("__ex") == 0)))
           .select(F.col("host").alias("__rh"), "allow", "prefix"))
    hits = (base.join(grp, (F.col("host") == F.col("__rh"))
                      & F.col("path").startswith(F.col("prefix")))
            .groupBy(id_col)
            .agg(F.max_by(
                F.struct(F.col("allow"), F.col("prefix")),
                F.struct(F.length("prefix"),
                         F.col("allow").cast("int"))).alias("__win")))
    return (base.join(hits, id_col, "left")
            .select(F.col(id_col), "url", "host", "path",
                    F.coalesce(F.col("__win.allow"), F.lit(True))
                    .alias("allowed"),
                    F.col("__win.prefix").alias("matched_prefix")))


def url_features(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Crawl-frontier URL features — the cheap priors a frontier
    scheduler ranks by before fetching anything (pairs with
    ``politeness_schedule`` and the pagerank prior): path depth,
    query-parameter count, digit share of the path (IDs/pagination ≈
    low-value), path length, and ``is_index`` (root or trailing
    slash). All from the same scheme/host/path split
    ``canonical_url`` uses; zero-shuffle projection.

    Output: ``(id, url, host, depth, n_params, path_len, digit_frac,
    is_index)``; ``digit_frac`` NULL for empty paths.
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    host = url_host(F.col(url_col))
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    q = F.regexp_extract(pathq, r"\?(.*)$", 1)
    seg = F.filter(F.split(path, "/"), lambda s: s != "")
    n_params = F.when(q == "", F.lit(0)).otherwise(
        F.size(F.split(q, "&"))).cast("bigint")
    plen = F.length(path).cast("bigint")
    digits = F.length(F.regexp_replace(path, r"[^0-9]", ""))
    return df.select(
        F.col(id_col), F.col(url_col).alias("url"),
        host.alias("host"),
        F.size(seg).cast("bigint").alias("depth"),
        n_params.alias("n_params"), plen.alias("path_len"),
        F.when(plen > 0, F.round(digits.cast("double")
                                 / plen.cast("double"), 6))
        .alias("digit_frac"),
        ((path == "") | (path == "/") | path.endswith("/"))
        .alias("is_index"))
