"""URL canonicalization + registered-domain extraction, as ONE shared
SQL chain rendered to both engines.

A crawl/training-data pipeline never gets clean hosts: the same resource
arrives as ``HTTP://WWW.Site.COM:80/p/1/?utm_source=x&q=1#sec`` and
``http://site.com/p/1?q=1``.  Everything downstream — per-host caps,
domain blocklists (``feed_domain_suffix_blocklist``), dedup — is wrong
unless URLs are canonicalized FIRST, and the reference's domain
semantics (sse.py:198,213 — exact string match on the ``domain`` field)
silently assume someone already did this.  This module is that step:

- lowercase scheme + host, strip a leading ``www.``;
- strip a ``user[:pass]@`` userinfo prefix from the authority; keep a
  bracketed IPv6 literal (``[::1]``) intact as the host instead of
  truncating at the first ``:`` inside the brackets;
- drop the fragment;
- drop DEFAULT ports (80 for http, 443 for https), keep explicit
  non-default ports;
- drop tracking query parameters (``utm_*``, ``ref``, ``fbclid``)
  while PRESERVING the order of the surviving ones (param order is
  semantically significant to unknown endpoints — sorting would merge
  distinct resources);
- strip one trailing slash from a non-root path.

Like ``layout.hilbert_key_sql_ctes``, the canonicalization chain is
GENERATED ONCE by :func:`canonical_parts` and rendered per dialect
(Spark / DuckDB differ only in list-function NAMES: filter vs
list_filter, array_join vs array_to_string, split vs string_split), so
the two engines cannot drift — the catalog row's value oracle checks
the whole chain end to end.

Registered-domain extraction uses a public-suffix-STYLE literal table
(:data:`PUBLIC_SUFFIXES` — the real PSL is ~9k entries maintained by
Mozilla; same longest-suffix-wins contract, table swapped at deploy):
registered_domain(host) = the longest matching public suffix plus one
label.  The match itself is the catalog row's suffix-explode +
broadcast equi-join (the ``feed_domain_suffix_blocklist`` shape), never
a per-pattern scan.  All three real PSL rule classes are supported
(:func:`normalize_psl_rules`): normal suffixes, wildcards (``*.ck`` —
the ``*`` consumes exactly one label), and exceptions (``!www.ck`` —
beats every other matching rule; its public suffix is the rule minus
its leftmost label).  Documented deviations from the publicsuffix.org
algorithm (both next to the reference's Q3 missing-domain quirk in
SURVEY §2): (1) the implicit default ``*`` rule is NOT applied — a host
matching no rule rolls up to ITSELF rather than to its last two
labels (safer for blocklists: an unknown zone never aliases two sites
into one registered domain); (2) a host that IS a public suffix maps
to itself rather than to NULL; (3) no punycode/IDNA folding — hosts
are matched as-is.
"""

from __future__ import annotations

# Public-suffix-style table (longest match wins).  A deliberately small
# literal stand-in for the Mozilla PSL with the two shapes that matter:
# single-label TLDs and multi-label suffixes that make the naive
# "last two labels" rule wrong (site.co.uk's registered domain is
# site.co.uk, not co.uk).
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "com",
    "net",
    "org",
    "io",
    "gov",
    "edu",
    "co.uk",
    "org.uk",
    "ac.uk",
    "com.au",
    "net.au",
)

_DIALECTS = {
    "spark": {"filter": "filter", "join": "array_join", "split": "split"},
    "duckdb": {
        "filter": "list_filter",
        "join": "array_to_string",
        "split": "string_split",
    },
}

#: query params dropped by canonicalization.  Key PREFIXES match via
#: substr equality — NOT LIKE, whose '_' is a single-char wildcard:
#: "utm_%" would also drop utmost=/utmx= params, silently merging
#: distinct resources (r14 review finding).  Exact keys match as
#: "key=" prefixes (no '_' in them, but substr keeps one mechanism).
TRACKING_KEY_PREFIXES: tuple[str, ...] = (
    "utm_",
    "ref=",
    "fbclid=",
)


def site_diversify_sql(domain_col: str = "domain") -> str:
    """Per-host-stable suffix diversification for the URL rows/kernels:
    the feed carries seven hosts all under .example.com, which would
    make every registered domain identical and leave the PSL
    longest-match logic untested — rewrite domK's zone by K%3 so the
    three suffix shapes (single-label TLD, multi-label co.uk,
    single-label io) all occur.  Pure shared-dialect SQL; stable per
    host by construction (keyed on the dom index, never the event
    id)."""
    d = domain_col
    # guard the CAST behind an emptiness check: on a domain that does
    # not start with dom<digits>, regexp_extract yields '' — Spark
    # (non-ANSI) CASTs that to NULL but DuckDB raises a conversion
    # error, a cross-engine divergence (r14 review finding).  CASE is
    # lazy in both engines, so the CAST never sees ''.
    k = f"regexp_extract({d}, '^dom([0-9]+)', 1)"
    return (
        f"concat(regexp_extract({d}, '^([^.]+)', 1), "
        f"CASE WHEN {k} = '' THEN '.sites.io' "
        f"ELSE CASE CAST({k} AS BIGINT) % 3 "
        "WHEN 0 THEN '.example.com' WHEN 1 THEN '.example.co.uk' "
        "ELSE '.sites.io' END END)"
    )


def synth_url_sql(id_col: str = "id", domain_col: str = "domain") -> str:
    """Deterministic raw-URL synthesis from (id, domain) — the testdata
    carries hosts but not URLs, so the catalog row manufactures the
    mess the canonicalizer must clean (same device as
    ``join_blocked_entity_resolution``'s synthesized corruptions): mixed
    scheme/host case, www. prefixes, default AND non-default ports,
    tracking params around a kept one, trailing slashes, fragments.
    Pure CASE/concat/% arithmetic — identical text runs on both
    engines."""
    i = id_col
    d = domain_col
    scheme = (
        f"CASE {i} % 4 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' "
        f"WHEN 2 THEN 'https' ELSE 'HTTPS' END"
    )
    host = (
        f"concat(CASE WHEN {i} % 5 = 0 THEN 'www.' ELSE '' END, "
        f"CASE WHEN {i} % 3 = 0 THEN upper({d}) ELSE {d} END)"
    )
    port = (
        f"CASE {i} % 7 WHEN 0 THEN ':80' WHEN 1 THEN ':443' "
        f"WHEN 2 THEN ':8080' ELSE '' END"
    )
    path = (
        f"concat('/p/', CAST({i} % 50 AS STRING), "
        f"CASE WHEN {i} % 2 = 0 THEN '/' ELSE '' END)"
    )
    query = (
        f"CASE WHEN {i} % 3 = 1 THEN concat('?utm_source=feed&q=', "
        f"CAST({i} % 10 AS STRING), '&ref=abc') ELSE '' END"
    )
    frag = f"CASE WHEN {i} % 11 = 0 THEN '#sec' ELSE '' END"
    return (
        f"concat({scheme}, '://', {host}, {port}, {path}, {query}, {frag})"
    )


def canonical_parts(url_expr: str, dialect: str) -> dict[str, str]:
    """Render the canonicalization chain for ``dialect`` ('spark' |
    'duckdb') over a SQL expression producing the raw URL.  Returns SQL
    expression strings for:

    - ``host``: canonical host (lowercase, www.-stripped);
    - ``canon_url``: the full canonical URL.

    The chain inlines ``url_expr`` multiple times, so callers should
    bind the raw URL to a column first (one CTE / select) and pass the
    column name — both catalog rows do."""
    fns = _DIALECTS[dialect]
    u = url_expr
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z]+)://', 1))"
    # authority = between :// and the first /?#, then strip an optional
    # 'user[:pass]@' prefix — userinfo may not contain an unencoded '@',
    # so up-to-the-first-'@' is the whole userinfo (r14 ADVICE:
    # 'http://user@site.com/' must canonicalize host to 'site.com', not
    # 'user@site.com'; regexp_replace is a no-op when there is no '@')
    auth = (
        f"regexp_replace(regexp_extract({u}, "
        f"'^[A-Za-z]+://([^/?#]*)', 1), '^[^@]*@', '')"
    )
    # IPv6 literals arrive bracketed ('[::1]:8080'): the host is the
    # whole bracketed run — splitting at the first ':' would truncate
    # inside the brackets (r14 ADVICE).  instr/substr, not a regex:
    # a literal '[' inside a bracket expression parses differently
    # across the two engines' regex dialects.
    is_v6 = f"(substr({auth}, 1, 1) = '[' AND instr({auth}, ']') > 0)"
    host_raw = (
        f"CASE WHEN {is_v6} "
        f"THEN lower(substr({auth}, 1, instr({auth}, ']'))) "
        f"ELSE lower(regexp_extract({auth}, '^([^:]*)', 1)) END"
    )
    host = (
        f"CASE WHEN {host_raw} LIKE 'www.%' "
        f"THEN substr({host_raw}, 5) ELSE {host_raw} END"
    )
    port = (
        f"CASE WHEN {is_v6} "
        f"THEN regexp_extract(substr({auth}, instr({auth}, ']') + 1), "
        f"'^:([0-9]+)$', 1) "
        f"ELSE regexp_extract({auth}, ':([0-9]+)$', 1) END"
    )
    port_keep = (
        f"CASE WHEN ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') OR {port} = '' "
        f"THEN '' ELSE concat(':', {port}) END"
    )
    path_raw = f"regexp_extract({u}, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1)"
    path = (
        f"CASE WHEN length({path_raw}) > 1 AND {path_raw} LIKE '%/' "
        f"THEN substr({path_raw}, 1, length({path_raw}) - 1) "
        f"ELSE {path_raw} END"
    )
    # [?] not \? — Spark SQL unescapes backslashes inside string
    # literals (DuckDB does not), so a character class is the only
    # spelling that parses to the same regex in both dialects.  The
    # leading [^#?]* anchors the match to the FIRST '?' BEFORE any '#':
    # a bare '[?](...)' would match a '?' inside the fragment and
    # resurrect fragment text as a query (r14 review finding —
    # 'a#x?y=1' must canonicalize with NO query, and 'a?x=1?y=2' keeps
    # everything after the first '?').
    query_raw = f"regexp_extract({u}, '^[^#?]*[?]([^#]*)', 1)"
    drop = " OR ".join(
        f"substr(x, 1, {len(p)}) = '{p}'" for p in TRACKING_KEY_PREFIXES
    )
    # COALESCE: DuckDB's array_to_string returns NULL on an empty list
    # (all params dropped) where Spark's array_join returns '' — and
    # DuckDB's concat SKIPS NULLs, which would leave a dangling '?'
    query_kept = (
        f"COALESCE({fns['join']}({fns['filter']}({fns['split']}("
        f"{query_raw}, '&'), x -> NOT ({drop})), '&'), '')"
    )
    canon_url = (
        f"concat({scheme}, '://', {host}, {port_keep}, {path}, "
        f"CASE WHEN {query_kept} = '' THEN '' "
        f"ELSE concat('?', {query_kept}) END)"
    )
    return {"host": host, "canon_url": canon_url}


def canonical_host_frame(df):
    """The ONE filter/site/synth/canonicalize chain over an (id, domain)
    frame -> (id, raw_url, host, canon_url) — shared by the batch
    catalog rows (`feed_url_canonical_host`, `feed_url_host_cap`) and
    the streaming host-admission kernel, so the batch and streaming
    paths cannot drift (r14 review finding: the chain was previously
    duplicated as copy-pasted selectExpr stages).  Pure projections, so
    it is stream-safe and stays in whole-stage codegen."""
    from pyspark.sql import functions as F

    parts = canonical_parts("raw_url", "spark")
    return (
        df.filter(F.col("domain").isNotNull())
        .selectExpr("id", f"{site_diversify_sql('domain')} AS site")
        .selectExpr("id", f"{synth_url_sql('id', 'site')} AS raw_url")
        .selectExpr(
            "id",
            "raw_url",
            f"{parts['host']} AS host",
            f"{parts['canon_url']} AS canon_url",
        )
    )


def normalize_psl_rules(
    rules: tuple[str, ...] | list[str],
) -> list[tuple[str, int, int]]:
    """PSL rule -> (join_key, rank, offset) for the suffix-explode
    equi-join matcher.  With a host split into 1-based labels and a
    candidate suffix starting at label ``i``:

    - normal rule ``co.uk``  -> key 'co.uk',  rank 1, offset  0
      (public suffix starts AT the matched suffix);
    - wildcard ``*.ck``      -> key 'ck',     rank 1, offset -1
      (the ``*`` consumes the label BEFORE the matched parent, so the
      public suffix starts one label earlier; invalid when i == 1);
    - exception ``!www.ck``  -> key 'www.ck', rank 0, offset +1
      (public suffix is the rule minus its leftmost label, one later).

    The prevailing rule is min by (rank, public-suffix start): rank 0
    puts exceptions above everything (the spec's "exception rule wins"
    clause), and a smaller start index IS a longer match.  Candidates
    whose public-suffix start falls outside [1, n_labels] are dropped
    (e.g. a wildcard matching at i=1 has no label for the ``*``).
    Every rule class stays a plain equi-join key — millions of entries
    remain one broadcast hash join, never per-pattern scans."""
    out: list[tuple[str, int, int]] = []
    for r in rules:
        if r.startswith("!"):
            out.append((r[1:], 0, 1))
        elif r.startswith("*."):
            out.append((r[2:], 1, -1))
        else:
            out.append((r, 1, 0))
    return out


def registered_domain_py(
    host: str, rules: tuple[str, ...] | list[str] = PUBLIC_SUFFIXES
) -> str:
    """Pure-Python reference matcher — the ENGINE-INDEPENDENT property
    anchor for the cross-engine fuzz tests (r14 verdict: a dual oracle
    is structurally blind to bugs both engines agree on; this third,
    loop-and-compare implementation shares no code shape with the SQL).
    Same deviations as the SQL (module docstring): no-match -> host,
    whole-host-public-suffix -> host."""
    labels = host.split(".")
    n = len(labels)
    best: tuple[int, int] | None = None
    for key, rank, off in normalize_psl_rules(rules):
        klabels = key.split(".")
        i = n - len(klabels) + 1  # 1-based start if key is a suffix
        if i >= 1 and labels[i - 1 :] == klabels:
            ps = i + off
            if 1 <= ps <= n and (best is None or (rank, ps) < best):
                best = (rank, ps)
    if best is None:
        return host
    reg = max(best[1] - 1, 1)
    return ".".join(labels[reg - 1 :])


def registered_domain_frame(hosts_df, rules=PUBLIC_SUFFIXES):
    """(host) frame -> (host, registered_domain) via the suffix-explode
    + broadcast equi-join matcher (full PSL rule classes, see
    :func:`normalize_psl_rules`).  Hosts matching no rule roll up to
    themselves (left join + coalesce — an inner join would silently
    drop them downstream, the r14 ADVICE bug in the ingest example).

    Scale shape: explodes only the (dimension-sized) host frame into
    <= label-count suffix candidates each, equi-joins against the
    broadcast rule table, cuts longest-match with a host-partitioned
    row_number (WindowGroupLimit).  Ties in (rank, ps) can pick either
    row; the output depends only on ps, so the result is deterministic
    anyway."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = hosts_df.sparkSession
    lab = hosts_df.select("host", F.split("host", r"\.").alias("labels"))
    n = F.size("labels")
    cand = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            i.alias("i"),
            F.array_join(F.slice("labels", i, n - i + 1), ".").alias(
                "suffix"
            ),
        ),
    )
    sfx = lab.select(
        "host", "labels", F.explode(cand).alias("s")
    ).select("host", "labels", "s.i", "s.suffix")
    ps_tbl = spark.createDataFrame(
        normalize_psl_rules(rules), "suffix string, rank int, off int"
    )
    w = Window.partitionBy("host").orderBy("rank", "ps")
    nn = F.size("labels")
    best = (
        sfx.join(F.broadcast(ps_tbl), "suffix")
        .withColumn("ps", F.col("i") + F.col("off"))
        .filter((F.col("ps") >= 1) & (F.col("ps") <= nn))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "host",
            F.when(F.col("ps") <= 1, F.col("host"))
            .otherwise(
                F.array_join(
                    F.slice(
                        "labels",
                        F.col("ps") - 1,
                        nn - (F.col("ps") - 1) + 1,
                    ),
                    ".",
                )
            )
            .alias("registered_domain"),
        )
    )
    return hosts_df.join(best, "host", "left").select(
        "host",
        F.coalesce("registered_domain", "host").alias(
            "registered_domain"
        ),
    )


def registered_domain_duckdb_ctes(
    hosts_cte: str, rules=PUBLIC_SUFFIXES
) -> str:
    """DuckDB CTE chain mirroring :func:`registered_domain_frame`
    (same normalized rule table, same (rank, ps) prevailing order,
    same deviations) — rendered from the ONE rule normalization so the
    two engines cannot drift on rule-class semantics.  ``hosts_cte``
    must expose a ``host`` column; the chain defines ``psl_reg(host,
    registered_domain)`` covering EVERY input host (left join +
    coalesce inside)."""
    vals = ", ".join(
        f"('{k}', {r}, {o})" for k, r, o in normalize_psl_rules(rules)
    )
    return f"""
    psl_lab AS (SELECT host, string_split(host, '.') AS labels
                FROM {hosts_cte}),
    psl_sfx AS (SELECT host, labels,
                       unnest(generate_series(1, len(labels))) AS i
                FROM psl_lab),
    psl_sfx2 AS (SELECT host, labels, i,
                        array_to_string(labels[i:len(labels)], '.')
                          AS suffix
                 FROM psl_sfx),
    psl_rules AS (SELECT * FROM (VALUES {vals})
                  v(suffix, rank, off)),
    psl_m AS (SELECT host, labels, i + off AS ps,
                     row_number() OVER (
                       PARTITION BY host ORDER BY rank, i + off) AS rn
              FROM psl_sfx2 JOIN psl_rules USING (suffix)
              WHERE i + off BETWEEN 1 AND len(labels)),
    psl_best AS (SELECT host,
                        CASE WHEN ps <= 1 THEN host
                             ELSE array_to_string(
                               labels[ps-1:len(labels)], '.')
                        END AS registered_domain
                 FROM psl_m WHERE rn = 1),
    psl_reg AS (SELECT h.host,
                       COALESCE(b.registered_domain, h.host)
                         AS registered_domain
                FROM (SELECT DISTINCT host FROM {hosts_cte}) h
                LEFT JOIN psl_best b USING (host))"""
