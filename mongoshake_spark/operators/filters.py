"""Filter chain (F1-F8) — the reference's OplogFilterChain re-expressed as
column predicates.

Reference semantics: filters implement ``Filter(log) bool`` and are OR-chained
— the first filter that matches DROPS the row
(/root/reference/collector/filter/oplog_filter.go:14-28, chain assembly
collector/syncer.go:135-142). Here each filter is a *keep* predicate
(the negation), and ``filter_chain`` ANDs them into one ``df.filter`` —
Catalyst merges the conjuncts and pushes them into the scan, so at 100 TB
the dropped rows never leave the parquet reader.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keep_not_noop() -> Column:
    """F1 NoopFilter: drop op == 'n'
    (collector/filter/oplog_filter.go:74-79)."""
    return F.col("op") != "n"


# F2 AutologousFilter namespace rules
# (collector/filter/doc_filter.go:13-28,58-81; oplog_filter.go:57-72):
# drop system namespaces by prefix/substring, with an allowlist that wins.
SYSTEM_NS_PREFIXES = ("admin.", "local.", "config.", "mongoshake.", "mongoshake_conflict.")
SYSTEM_NS_SUBSTRINGS = ("system.views",)
SYSTEM_NS_ALLOWLIST = ("admin.$cmd",)


def keep_not_autologous(
    prefixes: Sequence[str] = SYSTEM_NS_PREFIXES,
    substrings: Sequence[str] = SYSTEM_NS_SUBSTRINGS,
    allowlist: Sequence[str] = SYSTEM_NS_ALLOWLIST,
) -> Column:
    """F2: keep unless ns matches a system prefix/substring; the allowlist
    takes priority over the drop rules."""
    drop = F.lit(False)
    for p in prefixes:
        drop = drop | F.col("ns").startswith(p)
    for s in substrings:
        drop = drop | F.col("ns").contains(s)
    allowed = F.col("ns").isin(list(allowlist))
    return allowed | ~drop


def keep_gid(gids: Iterable[str], gid_col: str = "g") -> Column:
    """F3 GidFilter: keep rows whose gid is in the set; empty set = pass all
    (oplog_filter.go:30-55)."""
    gids = list(gids)
    if not gids:
        return F.lit(True)
    return F.col(gid_col).isin(gids)


def compile_ns_regex(patterns: Sequence[str]) -> str:
    """Compile a namespace white/black list to the reference's regex form
    ``^(a|b)$|^(a\\.|b\\.).*$`` (oplog_filter.go:107-124): a pattern matches
    the namespace exactly, or as a db-prefix of it."""
    if not patterns:
        return ""
    import re

    # full metacharacter escaping, not just '.': a namespace like
    # "db.c(1)" must not become a capture group (which would also match
    # "db.c1"), and "admin.$cmd" must not embed a mid-pattern '$' anchor
    # that can never match. re.escape's output stays inside the Java/RE2
    # common subset (backslash-escaped punctuation).
    escaped = [re.escape(p) for p in patterns]
    exact = "|".join(escaped)
    prefix = "|".join(e + r"\." for e in escaped)
    return f"^({exact})$|^({prefix}).*$"


def keep_namespace(
    whitelist: Sequence[str] = (),
    blacklist: Sequence[str] = (),
    ns_col: str | Column = "ns",
) -> Column:
    """F4 NamespaceFilter ns rule (oplog_filter.go:98-145 +
    doc_filter.go:83-105): whitelist keeps matching ns (empty = all),
    blacklist then drops — with the reference's ``$cmd`` override: if the ns
    is ``<db>.$cmd`` and <db> is the db of ANY whitelist entry, keep
    unconditionally (so ``db.col`` whitelists don't drop that db's commands).

    For feeds containing DDL, apply :func:`keep_namespace_ddl` instead —
    it rewrites commands to their effective namespace first."""
    ns = F.col(ns_col) if isinstance(ns_col, str) else ns_col
    keep = F.lit(True)
    white = compile_ns_regex(whitelist)
    black = compile_ns_regex(blacklist)
    if white:
        keep = keep & ns.rlike(white)
    if black:
        keep = keep & ~ns.rlike(black)
    white_dbs = sorted({p.split(".", 1)[0] for p in whitelist})
    if white_dbs:
        keep = (ns.endswith(".$cmd") & F.split(ns, r"\.", 2).getItem(0).isin(white_dbs)) | keep
    return keep


def keep_namespace_ddl(
    whitelist: Sequence[str] = (),
    blacklist: Sequence[str] = (),
    op_col: str = "op",
    ns_col: str = "ns",
    o_col: str = "o",
    cmap_col: Column | None = None,
) -> Column:
    """F4 NamespaceFilter, full DDL-aware form (oplog_filter.go:147-290).

    Commands are filtered on their EFFECTIVE namespace
    (:func:`mongoshake_spark.operators.transforms.effective_ns`), with the
    reference's per-command dispositions:

      startIndexBuild / abortIndexBuild -> always drop  (go:175-180)
      applyOps                          -> always keep  (go:218-219; inner-op
          filtering is the caller's job via transforms.flatten_apply_ops —
          the reference ships the same behavior, its sub-op rewrite is
          commented out)
      unparseable command object        -> keep          (go:168-172 "not
          implemented, ignore")
      illegal (non-string) command value -> keep         (go:202-206
          "illegal oplog, ignore": a collection-target command whose value
          parsed to NULL or to stringified JSON '{...}'/'[...]' — the
          effective-ns rewrite would produce garbage, so the row is kept
          before the ns rule sees it. Heuristic caveat: a genuine string
          value that itself starts with '{' or '[' is indistinguishable
          after from_json and is likewise kept.)
      everything else                   -> ns rule on effective ns
    """
    from mongoshake_spark.operators import transforms

    if cmap_col is None:
        # one parse per row, structurally (transforms.bind_command_map):
        # re-enter with the lambda variable bound to the parsed map
        return transforms.bind_command_map(
            o_col,
            lambda m: keep_namespace_ddl(
                whitelist, blacklist, op_col, ns_col, o_col, cmap_col=m
            ),
        )
    op = F.col(op_col)
    cmap = cmap_col
    cmd = F.get(F.map_keys(cmap), F.lit(0))
    val = F.try_element_at(cmap, cmd)
    eff = transforms.effective_ns(op_col, ns_col, o_col, cmap_col=cmap)
    ns_keep = keep_namespace(whitelist, blacklist, ns_col=eff)
    value_cmds = transforms.COLL_TARGET_COMMANDS + ("renameCollection",)
    illegal_value = val.isNull() | val.startswith("{") | val.startswith("[")
    return (
        F.when((op == "c") & cmd.isin(*transforms.ALWAYS_DROP_COMMANDS), F.lit(False))
        .when((op == "c") & (cmd == "applyOps"), F.lit(True))
        .when((op == "c") & cmd.isNull(), F.lit(True))
        .when((op == "c") & cmd.isin(*value_cmds) & illegal_value, F.lit(True))
        .otherwise(ns_keep)
    )


def filter_namespace_ddl(
    df: DataFrame,
    whitelist: Sequence[str] = (),
    blacklist: Sequence[str] = (),
    op_col: str = "op",
    ns_col: str = "ns",
    o_col: str = "o",
) -> DataFrame:
    """DataFrame form of :func:`keep_namespace_ddl`. Output columns =
    input columns.

    Historical note: this used to stage the parsed command map as a
    ``_cmap`` column, believing the projection made the single-parse
    contract explicit. It does not — predicate pushdown substitutes the
    alias back into the filter and re-expands one ``from_json`` per
    reference (51 in the q29 plan, ~2x filter wall; codegen CSE did not
    recover it). The structural fix is
    :func:`~mongoshake_spark.operators.transforms.bind_command_map`,
    which :func:`keep_namespace_ddl` now applies itself, so this wrapper
    is a plain filter again.
    """
    return df.filter(
        keep_namespace_ddl(whitelist, blacklist, op_col, ns_col, o_col)
    )


def assert_no_migrate(df: DataFrame, col: str = "fromMigrate") -> DataFrame:
    """F5 MigrateFilter: fromMigrate == true must crash the pipeline
    (oplog_filter.go:89-94; batcher.go:133-137). Distributed form: the
    raise lives inside a filter predicate, so it cannot be pruned away
    (a projected-then-dropped check column would be optimized out) and
    any offending row fails the job the moment it is scanned."""
    if col not in df.columns:
        return df
    check = F.when(
        F.col(col) == True,  # noqa: E712
        F.raise_error(F.lit("fromMigrate set: sharding balancer must be off")),
    ).otherwise(F.lit(True))
    return df.filter(check)


def is_ddl(op_col: str = "op") -> Column:
    """F7 DDLFilter classification (oplog_filter.go:81-87): op == 'c' is DDL
    (command); callers route DDL rows to the barrier path (streaming.apply)."""
    return F.col(op_col) == "c"


def strip_gid(df: DataFrame, gid_col: str = "g") -> DataFrame:
    """F8 gid strip projection (collector/syncer.go:618-633)."""
    if gid_col not in df.columns:
        return df
    return df.withColumn(gid_col, F.lit(None).cast("string"))


def filter_chain(df: DataFrame, *keep_predicates: Column) -> DataFrame:
    """Apply the whole chain as ONE filter (single conjunction): Catalyst
    merges and pushes it down; equivalent to the reference's first-match-drops
    OR-chain because keep = AND of the per-filter keeps."""
    pred = F.lit(True)
    for p in keep_predicates:
        pred = pred & p
    return df.filter(pred)


# BSON type-order sentinels and ranks (orphan_filter.go:16-24 mirrors
# mongo/bson/bsontypes.h; getBsonType maps math.MinInt64/MaxInt64 chunk
# bounds to MinKey/MaxKey, orphan_filter.go:219-245).
BSON_MINKEY = -(2**63)
BSON_MAXKEY = 2**63 - 1
_RANK_MINKEY, _RANK_NUMBER, _RANK_MAXKEY = 0, 10, 100


def _le_hex(col: Column, nbytes: int) -> Column:
    """Little-endian hex string of the low ``nbytes`` bytes of a long."""
    return F.concat(
        *[
            F.lpad(F.hex(F.shiftrightunsigned(col, 8 * i).bitwiseAND(F.lit(255))), 2, "0")
            for i in range(nbytes)
        ]
    )


def mongo_shard_key_hash(col: Column | str, bson_type: str = "number") -> Column:
    """Mongo's hashed-shard-key hash as a pure column expression
    (orphan_filter.go:94-135 ComputeHash, itself mirroring
    mongo/db/hasher.cpp): md5 over [int32-LE seed=0][int32-LE BSON type
    tag][payload]; result = first 8 digest bytes as a little-endian int64.

    ``bson_type='number'``: tag 10, payload = 8-byte LE of uint64(value).
    ``bson_type='string'``: tag 15, payload = int32-LE(byte_len+1) +
    UTF-8 bytes + NUL.

    Stays JVM-side (md5/unhex/conv/shift are all codegen-able): no UDF in
    the full-sync hot path where this runs per document.
    """
    c = F.col(col) if isinstance(col, str) else col
    # binary concat, not hex-string concat: only the few dynamic bytes go
    # through hex/unhex — the key's own bytes are passed as binary directly
    # (hexing the whole payload doubled the per-row string work; measured
    # 6.8s -> ~3s serial on the 600k-row q30)
    if bson_type == "number":
        payload = F.concat(F.unhex(F.lit("000000000A000000")), F.unhex(_le_hex(c, 8)))
    elif bson_type == "string":
        blen = F.octet_length(c)
        payload = F.concat(
            F.unhex(F.lit("000000000F000000")),
            F.unhex(_le_hex(blen + F.lit(1), 4)),
            c.cast("binary"),
            F.unhex(F.lit("00")),
        )
    else:
        raise ValueError(f"unsupported bson_type {bson_type!r}")
    digest = F.md5(payload)
    out = F.lit(0).cast("long")
    for i in range(8):
        byte = F.conv(F.substring(digest, 2 * i + 1, 2), 16, 10).cast("long")
        out = out.bitwiseOR(F.shiftleft(byte, 8 * i))
    return out


def _bson_rank(c: Column) -> Column:
    return (
        F.when(c == F.lit(BSON_MINKEY), F.lit(_RANK_MINKEY))
        .when(c == F.lit(BSON_MAXKEY), F.lit(_RANK_MAXKEY))
        .otherwise(F.lit(_RANK_NUMBER))
    )


def bson_lt(x: Column, y: Column) -> Column:
    """chunkLt (orphan_filter.go:196-217): different BSON types compare by
    type rank; MinKey/MaxKey never value-compare; numbers compare as
    float64 (the reference converts every numeric to float64 first,
    orphan_filter.go:227-236 — kept faithfully, including the precision
    loss above 2^53)."""
    rx, ry = _bson_rank(x), _bson_rank(y)
    return F.when(rx != ry, rx < ry).otherwise(
        (rx == _RANK_NUMBER) & (x.cast("double") < y.cast("double"))
    )


def orphan_filter(
    docs: DataFrame,
    chunks: DataFrame,
    key_col: str,
    ns: str,
    shard: str,
    shard_type: str = "ranged",
    key_bson_type: str | None = None,
) -> DataFrame:
    """F6 OrphanFilter (collector/filter/orphan_filter.go:26-92): keep only
    documents owned by this shard — shard key within one of the shard's
    chunk ranges [min,max).

    ``shard_type='hashed'`` reproduces HashedShard collections
    (orphan_filter.go:57-58,73-74): the key is first run through Mongo's
    md5 key hash (:func:`mongo_shard_key_hash`), then compared against the
    int64 chunk bounds with BSON type ordering — bounds equal to
    math.MinInt64/MaxInt64 act as MinKey/MaxKey sentinels
    (:func:`bson_lt`). Ownership is ``NOT lt(h, min) AND lt(h, max)``:
    inclusive min (equality falls through the reference's Mins loop to the
    Maxs check), exclusive max (equality on the last key continues to the
    next chunk).

    Spark-first: the chunk map is metadata-sized, so broadcast it and use a
    range-condition semi join. No shuffle of the fact side at any scale —
    each task streams its rows against the broadcast ranges.
    """
    owned = chunks.filter((F.col("ns") == ns) & (F.col("shard") == shard)).select(
        "min_key", "max_key"
    )
    if shard_type == "hashed":
        if key_bson_type is None:
            key_bson_type = (
                "string" if str(docs.schema[key_col].dataType) == "StringType()" else "number"
            )
        # Project the hash ONCE before the join: an expression inside the
        # broadcast-join condition is re-evaluated per (row x chunk) pair —
        # with 4 chunks that is 4x the md5 work (measured ~2x wall on q30).
        # The md5 runs map-side before any exchange, so an under-partitioned
        # scan would serialize it on one task — fan out first
        # (operators/parallel; no-op at real scan widths; measured 1.7x).
        from mongoshake_spark.operators.parallel import fan_out_scan

        docs = fan_out_scan(docs)
        hashed = docs.withColumn("_mongo_key_hash", mongo_shard_key_hash(docs[key_col], key_bson_type))
        h = F.col("_mongo_key_hash")
        cond = ~bson_lt(h, F.col("min_key")) & bson_lt(h, F.col("max_key"))
        return hashed.join(F.broadcast(owned), cond, "left_semi").drop("_mongo_key_hash")
    cond = (docs[key_col] >= F.col("min_key")) & (docs[key_col] < F.col("max_key"))
    return docs.join(F.broadcast(owned), cond, "left_semi")
