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
    escaped = [p.replace(".", r"\.") for p in patterns]
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
      everything else                   -> ns rule on effective ns
    """
    from mongoshake_spark.operators import transforms

    op = F.col(op_col)
    cmd = transforms.command_name(o_col)
    eff = transforms.effective_ns(op_col, ns_col, o_col)
    ns_keep = keep_namespace(whitelist, blacklist, ns_col=eff)
    return (
        F.when((op == "c") & cmd.isin(*transforms.ALWAYS_DROP_COMMANDS), F.lit(False))
        .when((op == "c") & (cmd == "applyOps"), F.lit(True))
        .when((op == "c") & cmd.isNull(), F.lit(True))
        .otherwise(ns_keep)
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


def orphan_filter(docs: DataFrame, chunks: DataFrame, key_col: str, ns: str, shard: str) -> DataFrame:
    """F6 OrphanFilter (collector/filter/orphan_filter.go:26-92): keep only
    documents owned by this shard — shard key within one of the shard's
    chunk ranges [min,max).

    Spark-first: the chunk map is metadata-sized, so broadcast it and use a
    range-condition semi join. No shuffle of the fact side at any scale —
    each task streams its rows against the broadcast ranges.
    """
    owned = chunks.filter((F.col("ns") == ns) & (F.col("shard") == shard)).select(
        "min_key", "max_key"
    )
    cond = (docs[key_col] >= F.col("min_key")) & (docs[key_col] < F.col("max_key"))
    return docs.join(F.broadcast(owned), cond, "left_semi")
