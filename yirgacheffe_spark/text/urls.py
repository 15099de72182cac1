"""URL-level curation: canonicalization, domain filtering, per-domain caps.

The web-crawl stages that run BEFORE any text is read (CCNet / C4 /
RefinedWeb all start here): collapse URL variants so exact URL dedup
works, drop blocklisted domains, and cap per-domain document counts for
crawl diversity.  Everything is JVM column algebra over Spark's built-in
``try_parse_url`` (NULL, never an error, on junk input) — no Python in
the scan path, filters push down.

Canonical form (pinned; variants differ across pipelines):
scheme dropped, host lowercased with one leading ``www.`` stripped,
default-port suffix removed, path kept case-sensitively with a trailing
``/`` trimmed (root becomes empty), fragment dropped, tracking query
parameters (utm_*, fbclid, gclid, msclkid, mc_eid, igshid, ref,
ref_src) removed with the remaining parameters kept in original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# Query parameters that never change content identity.
_TRACKING_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)$"

# Hosts have a bounded label count; 10 suffix candidates cover anything real.
_MAX_HOST_LABELS = 10


def url_host(col) -> "F.Column":
    """Lowercased host with one leading ``www.`` stripped; NULL for
    unparseable URLs."""
    host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    return F.regexp_replace(
        F.regexp_replace(host, r"^www\.", ""), r":(80|443)$", ""
    )


def canonicalize_url(col) -> "F.Column":
    """Canonical URL string (module-docstring form): host + path + kept
    query.  NULL host (unparseable input) yields NULL."""
    host = url_host(col)
    path = F.coalesce(F.try_parse_url(col, F.lit("PATH")), F.lit(""))
    path = F.when(path == "/", F.lit("")).otherwise(
        F.regexp_replace(path, r"/$", "")
    )
    query = F.coalesce(F.try_parse_url(col, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(_TRACKING_RE),
    )
    q = F.array_join(kept, "&")
    return F.when(
        host.isNotNull(),
        F.concat(host, path,
                 F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))),
    )



def _salted_null_key(key_col: str, id_col: str) -> "F.Column":
    """Window partition key where NULL keys become per-row singletons: NUL
    prefix (which no canonical URL/host can contain) + the row id, falling
    back to a unique monotonic id when the row id is ALSO NULL — a NULL
    anywhere in the salt would otherwise collapse every such row back into
    the one giant NULL partition the salt exists to prevent (and the
    dedup/cap windows would then silently drop all but one of them)."""
    row = F.coalesce(
        F.col(id_col).cast("string"),
        F.monotonically_increasing_id().cast("string"),
    )
    return F.coalesce(F.col(key_col), F.concat(F.lit("\0"), row))


def dedup_by_canonical_url(df: DataFrame, url_col: str = "url",
                           id_col: str = "doc_id") -> DataFrame:
    """One row per canonical URL (lowest id wins — deterministic); rows
    whose URL cannot be parsed are kept (nothing to collide on).  One
    window over the canonical key, no driver rows.

    Unparseable rows get a per-row salted key (``\\0`` + id — the NUL
    prefix cannot appear in a canonical URL) so the window never gathers
    the whole junk-URL slice into one NULL partition: at web scale that
    slice is a material fraction of the crawl and would serialise into a
    single straggler task."""
    canon = canonicalize_url(F.col(url_col))
    w = W.partitionBy(_salted_null_key("_curl", id_col)).orderBy(
        F.col(id_col).asc())
    return (
        df.withColumn("_curl", canon)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_curl", "_rn")
    )


def _host_suffixes(host_col) -> "F.Column":
    """array of the host and every parent-domain suffix
    (``a.b.example.com`` -> [a.b.example.com, b.example.com, example.com,
    com]) — the standard way to make blocklist matching an equi-join
    instead of a per-row suffix scan.

    Suffixes are TAIL-anchored: for a host deeper than ``_MAX_HOST_LABELS``
    the emitted set is the full host (exact-match entry) plus the last
    ``_MAX_HOST_LABELS`` suffixes — the short tails (``evil.com``, ``com``)
    are what blocklists actually contain, so those must never be dropped,
    no matter how many subdomain labels an adversarial host prepends."""
    labels = F.split(host_col, r"\.")
    n = F.size(labels)
    tail = F.transform(
        F.sequence(F.greatest(F.lit(1), n - F.lit(_MAX_HOST_LABELS - 1)), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    return F.when(n > _MAX_HOST_LABELS,
                  F.concat(F.array(host_col), tail)).otherwise(tail)


def domain_filter(df: DataFrame, domains: DataFrame, url_col: str = "url",
                  mode: str = "block", id_col: str = "doc_id") -> DataFrame:
    """Drop (``mode="block"``) or keep only (``mode="allow"``) rows whose
    URL host equals a listed domain or is a subdomain of one.

    ``domains`` carries one lowercase column ``domain``.  Plan: each row's
    host explodes to its suffix chain (bounded), the list joins by
    equality — blocklists are dim-sized so Catalyst broadcasts; at
    million-entry scale the equi-join shuffles on the key, never a
    per-row list scan.  ``id_col`` is the stable row key the hit set
    joins back on (a generated id would not be stable across the two
    evaluations of the plan).
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be block|allow, got {mode!r}")
    if "domain" in domains.columns:
        domains = domains.select("domain")
    elif len(domains.columns) == 1:
        domains = domains.select(F.col(domains.columns[0]).alias("domain"))
    else:
        raise ValueError(
            "domains needs a 'domain' column (or exactly one column); got "
            f"{domains.columns} — refusing to guess which one holds the domain"
        )
    sfx = df.select(
        F.col(id_col),
        F.explode_outer(_host_suffixes(url_host(F.col(url_col)))).alias("domain"),
    )
    hit_rows = sfx.join(domains, "domain", "leftsemi").select(id_col).distinct()
    how = "left_anti" if mode == "block" else "left_semi"
    return df.join(hit_rows, id_col, how)


def cap_per_domain(df: DataFrame, max_docs: int, url_col: str = "url",
                   order_col: "str | None" = None,
                   id_col: str = "doc_id") -> DataFrame:
    """At most ``max_docs`` rows per host (crawl diversity): rank by
    ``order_col`` DESC when given (e.g. a quality score — keep the best),
    else by ``id_col`` ASC (deterministic); unparseable hosts are exempt.
    """
    if max_docs <= 0:
        raise ValueError("max_docs must be positive")
    order = ([F.col(order_col).desc()] if order_col else []) + [F.col(id_col).asc()]
    # Same NULL-salting as dedup_by_canonical_url: exempt rows become
    # singleton partitions instead of one giant NULL window partition.
    w = W.partitionBy(_salted_null_key("_host", id_col)).orderBy(*order)
    return (
        df.withColumn("_host", url_host(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_docs)
        .drop("_host", "_rn")
    )
