"""Normalization / transform projections (N1-N10) — the reference's scalar
surface re-expressed as column expressions (no UDFs on the hot path).

Reference: oplog/changestram_event.go:77-452 (event->oplog), oplog/oplog.go
(delta-update normalization, applyOps gather), collector/transform/transform.go
(namespace rename/fanout).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_to_oplog(events: DataFrame) -> DataFrame:
    """N1 ConvertEvent2Oplog (oplog/changestram_event.go:77-452): change-stream
    event rows -> oplog rows via a per-operationType CASE projection.

    insert  -> op 'i', o = fullDocument
    delete  -> op 'd', o = documentKey
    replace -> op 'u', o = {"$set": fullDocument}
    update  -> op 'u', o = {"$set": updatedFields, "$unset": removedFields}
    drop/rename/dropDatabase -> op 'c' with a command object
    """
    t = F.col("operationType")
    ns = F.concat_ws(".", F.col("ns.db"), F.col("ns.coll"))
    set_doc = F.concat(F.lit('{"$set":'), F.col("updateDescription.updatedFields"), F.lit("}"))
    unset_doc = F.when(
        F.size(F.col("updateDescription.removedFields")) > 0,
        F.concat(
            F.lit('{"$set":'),
            F.col("updateDescription.updatedFields"),
            F.lit(',"$unset":'),
            F.to_json(F.col("updateDescription.removedFields")),
            F.lit("}"),
        ),
    ).otherwise(set_doc)
    o = (
        F.when(t == "insert", F.col("fullDocument"))
        .when(t == "delete", F.col("documentKey"))
        .when(t == "replace", F.concat(F.lit('{"$set":'), F.col("fullDocument"), F.lit("}")))
        .when(t == "update", unset_doc)
        .when(t == "drop", F.concat(F.lit('{"drop":"'), F.col("ns.coll"), F.lit('"}')))
        .when(
            t == "rename",
            F.to_json(
                F.struct(
                    F.concat_ws(".", F.col("ns.db"), F.col("ns.coll")).alias("renameCollection"),
                    F.concat_ws(".", F.col("to.db"), F.col("to.coll")).alias("to"),
                )
            ),
        )
        .when(t == "dropDatabase", F.lit('{"dropDatabase":1}'))
        .otherwise(F.lit(None))
    )
    op = (
        F.when(t == "insert", "i")
        .when(t == "delete", "d")
        .when(t.isin("replace", "update"), "u")
        .when(t.isin("drop", "rename", "dropDatabase"), "c")
        .when(
            t == "invalidate",
            # the reference treats invalidate as fatal (changestram_event.go:
            # the cursor is dead and must be re-established) — surface it as
            # a job failure rather than silently emitting a noop
            F.raise_error(F.lit("change stream invalidated: resubscribe required")),
        )
        .otherwise("n")
    )
    return events.select(
        F.col("clusterTime").alias("ts"),
        op.alias("op"),
        ns.alias("ns"),
        o.alias("o"),
        F.col("documentKey").alias("o2"),
        F.col("lsid"),
        F.col("txnNumber"),
    )


def parse_payload(df: DataFrame, json_col: str = "o", out_col: str = "o_map") -> DataFrame:
    """N2 BSON deserialize (collector/syncer.go:430-503): bytes -> parsed.
    Spark-first: ``from_json`` into a map — schemaless payloads stay dynamic;
    Catalyst parallelizes parsing, no manual queue fan-out (the reference's
    1-8 deserializer queues collapse into task parallelism)."""
    return df.withColumn(out_col, F.from_json(F.col(json_col), "map<string,string>"))


def remarshal(df: DataFrame, cols: Sequence[str], out_col: str = "value") -> DataFrame:
    """N3 re-marshal combiner (collector/syncer.go:461-480): serialize once,
    at the sink."""
    return df.withColumn(out_col, F.to_json(F.struct(*[F.col(c) for c in cols])))


def ns_transform(ns_col: Column, rules: Sequence[tuple[str, str]]) -> Column:
    """N4 NamespaceTransform (collector/transform/transform.go:13-41):
    rename rules ``from -> to``, first match wins; a rule matches the exact
    namespace or a db-level prefix (regex ^from$|^from\\..*$)."""
    expr = ns_col
    # Build nested CASE in reverse so the FIRST rule has highest priority.
    for src, dst in reversed(list(rules)):
        pat = "^" + src.replace(".", r"\.") + r"(\..*)?$"
        # substr on the PASSED column — a hardcoded column name here would
        # read an unrelated `ns` column (or fail to resolve) whenever the
        # caller passes anything else
        suffix = ns_col.substr(F.lit(len(src) + 1), F.length(ns_col))
        replaced = F.concat(F.lit(dst), suffix)
        expr = F.when(ns_col.rlike(pat), replaced).otherwise(expr)
    return expr


def db_fanout(df: DataFrame, mapping: Mapping[str, Sequence[str]], ns_col: str = "ns") -> DataFrame:
    """N5 DBTransform (transform.go:43-71): db-level 1->N fanout via explode."""
    db = F.split(F.col(ns_col), r"\.", 2).getItem(0)
    rest = F.expr(f"substring({ns_col}, length(split({ns_col}, '\\\\.', 2)[0]) + 1)")
    m = F.create_map(
        *[x for k, vs in mapping.items() for x in (F.lit(k), F.array(*[F.lit(v) for v in vs]))]
    )
    targets = F.coalesce(F.element_at(m, db), F.array(db))
    return df.withColumn("_tgt_db", F.explode(targets)).withColumn(
        ns_col, F.concat(F.col("_tgt_db"), rest)
    ).drop("_tgt_db")


def transform_dbref(
    df: DataFrame, rules: Sequence[tuple[str, str]], o_col: str = "o"
) -> DataFrame:
    """N6 TransformDBRef (transform.go:73-106): recursively rewrite
    ``{"$ref": coll, "$db": db}`` sub-documents according to the namespace
    rename rules. Genuinely recursive over dynamic JSON — the one transform
    where a UDF is warranted (SURVEY §7); Arrow-batched so payloads cross
    to Python once. Only enable when the DBRef feature is on (the reference
    gates it the same way, doc_syncer.go:533-545)."""
    import json

    from pyspark.sql.functions import pandas_udf

    compiled = [(src, dst) for src, dst in rules]

    def rewrite_ns(ns: str) -> str:
        for src, dst in compiled:
            if ns == src or ns.startswith(src + "."):
                return dst + ns[len(src):]
        return ns

    def walk(node):
        if isinstance(node, dict):
            if "$ref" in node and "$db" in node:
                full = f'{node["$db"]}.{node["$ref"]}'
                new = rewrite_ns(full)
                db, _, coll = new.partition(".")
                node = {**node, "$db": db, "$ref": coll}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    @pandas_udf("string")
    def rewrite(col: pd.Series) -> pd.Series:
        def one(s):
            if s is None:
                return None
            try:
                return json.dumps(walk(json.loads(s)), separators=(",", ":"))
            except ValueError:
                return s

        return col.map(one)

    return df.withColumn(o_col, rewrite(F.col(o_col)))


def normalize_delta_update(df: DataFrame, o_col: str = "o") -> DataFrame:
    """N7 $v:2 delta-update normalization (oplog/oplog.go:281-372):
    ``{"$v":2,"diff":{i:…,u:…,d:…}}`` -> canonical (set_map, unset_array).

    Top-level diff sections map to column ops:
      i/u sections -> entries of set_map;  d section -> unset_array keys.
    Nested ``s<field>`` descent is genuinely recursive over dynamic JSON —
    the one place a UDF is warranted per SURVEY §7; top-level handling here
    covers the declared test surface with pure built-ins.
    """
    diff = F.from_json(
        F.get_json_object(F.col(o_col), "$.diff"),
        "struct<i:map<string,string>,u:map<string,string>,d:map<string,string>>",
    )
    is_v2 = F.get_json_object(F.col(o_col), "$.$v") == "2"
    classic_set = F.from_json(
        F.get_json_object(F.col(o_col), "$.$set"), "map<string,string>"
    )
    classic_unset = F.from_json(
        F.get_json_object(F.col(o_col), "$.$unset"), "map<string,string>"
    )
    v2_set = F.map_concat(
        F.coalesce(diff.getField("i"), F.expr("map()")),
        F.coalesce(diff.getField("u"), F.expr("map()")),
    )
    v2_unset = F.map_keys(F.coalesce(diff.getField("d"), F.expr("map()")))
    return df.withColumn(
        "set_map", F.when(is_v2, v2_set).otherwise(F.coalesce(classic_set, F.expr("map()")))
    ).withColumn(
        "unset_keys",
        F.when(is_v2, v2_unset).otherwise(
            F.map_keys(F.coalesce(classic_unset, F.expr("map()")))
        ),
    )


def normalize_delta_update_full(df: DataFrame, o_col: str = "o") -> DataFrame:
    """N7, full form (oplog/oplog.go:281-372 DiffUpdateOplogToNormal):
    recursive ``$v:2`` normalization including nested ``s<field>`` descent
    — emits classic dotted-path $set/$unset.

      {"$v":2,"diff":{"i":{a:1},"u":{b:2},"d":{c:false},
                      "sE":{"i":{x:1},"d":{y:false}}}}
        -> set {a:1, b:2, "E.x":1}, unset [c, "E.y"]

    Array-resize sections (``l``) become a ``{"$resize": n}`` marker in the
    set map — the reference rewrites those as an aggregation-pipeline
    update (BuildUpdateDelteOplog); a Mongo-writing sink would translate
    the marker back.

    Arrow-batched UDF: the recursion over dynamic JSON is the documented
    slow-path exception (SURVEY §7); the flat fast path stays in
    normalize_delta_update (pure column expressions).
    """
    import json

    from pyspark.sql.functions import pandas_udf

    def walk(diff: dict, prefix: str, set_out: dict, unset_out: list) -> None:
        for k, v in diff.items():
            if k in ("i", "u") and isinstance(v, dict):
                for f, val in v.items():
                    set_out[prefix + f] = val
            elif k == "d" and isinstance(v, dict):
                for f in v:
                    unset_out.append(prefix + f)
            elif k == "l":
                set_out[prefix.rstrip(".") or "$"] = {"$resize": v}
            elif k.startswith("s") and isinstance(v, dict):
                walk(v, prefix + k[1:] + ".", set_out, unset_out)

    @pandas_udf("struct<set_json:string,unset_json:string>")
    def normalize(col: pd.Series) -> pd.DataFrame:
        sets, unsets = [], []
        for s in col:
            try:
                doc = json.loads(s) if s else {}
            except ValueError:
                doc = {}
            set_out: dict = {}
            unset_out: list = []
            if str(doc.get("$v")) == "2" and isinstance(doc.get("diff"), dict):
                walk(doc["diff"], "", set_out, unset_out)
            else:
                set_out = doc.get("$set", {}) or {}
                unset_out = list((doc.get("$unset", {}) or {}).keys())
            sets.append(json.dumps(set_out, separators=(",", ":"), sort_keys=True))
            unsets.append(json.dumps(sorted(unset_out), separators=(",", ":")))
        return pd.DataFrame({"set_json": sets, "unset_json": unsets})

    out = normalize(F.col(o_col))
    return df.withColumn("set_json", out.getField("set_json")).withColumn(
        "unset_json", out.getField("unset_json")
    )


def command_map(o_col: str = "o") -> Column:
    """The command document parsed as ``map<string,string>`` — the one
    expensive subexpression of the DDL path (a full JSON parse). Callers
    needing more than one of command_name / command_value / effective_ns
    must evaluate it ONCE per row via :func:`bind_command_map`: staging it
    as a projected column does NOT survive the optimizer (predicate
    pushdown substitutes the alias back into the filter, re-expanding one
    ``from_json`` per reference — measured 51 parses in the q29 plan and
    ~2x the filter wall; codegen subexpression elimination did not recover
    it)."""
    return F.from_json(F.col(o_col), "map<string,string>")


def bind_command_map(o_col: str, fn) -> Column:
    """Evaluate ``fn(m)`` with ``m`` bound to ``command_map(o_col)``
    exactly once per row, STRUCTURALLY: the parse is wrapped in a
    single-element array and ``fn`` becomes a higher-order-function lambda
    over it — ``get(transform(array(parse), fn), 0)`` — so every reference
    to ``m`` inside ``fn`` is a lambda-variable read, not a re-expanded
    subexpression. Unlike a staged column, the optimizer cannot inline
    through a lambda binding, so the single-parse contract holds wherever
    the predicate/projection lands (measured: q29 3.3s -> 1.7s warm,
    9.2s -> 1.8s cold, plan parse count 51 -> 2). NULL flows through
    unchanged: ``fn(NULL)`` is evaluated just as the direct form would."""
    return F.get(F.transform(F.array(command_map(o_col)), fn), F.lit(0))


def command_name(o_col: str = "o") -> Column:
    """N8 command-name extraction (oplog/cmd_oplog.go:14-63): the first key
    of the command document. ``F.get`` (not ``getItem``): ANSI mode makes
    index-0 on an empty map's key array a runtime error, and ``{}`` payloads
    are legal."""
    return F.get(F.map_keys(F.from_json(F.col(o_col), "map<string,string>")), F.lit(0))


def command_value(o_col: str = "o") -> Column:
    """The first command entry's VALUE as a string — scalar values render
    as themselves under ``from_json`` into ``map<string,string>``; nested
    objects/arrays stringify to their JSON text ('{...}' / '[...]'), and
    JSON null becomes NULL. Callers use those two shapes to detect the
    reference's 'illegal oplog' case (a non-string command value,
    oplog_filter.go:202-206)."""
    return bind_command_map(
        o_col, lambda m: F.try_element_at(m, F.get(F.map_keys(m), F.lit(0)))
    )


# DDL commands whose command VALUE names the target collection — the effective
# namespace is db + '.' + value (collector/filter/oplog_filter.go:181-208).
COLL_TARGET_COMMANDS = (
    "commitIndexBuild",
    "create",
    "createIndexes",
    "collMod",
    "drop",
    "deleteIndex",
    "deleteIndexes",
    "dropIndex",
    "dropIndexes",
    "convertToCapped",
    "emptycapped",
)

# 4.4 index-build phases the reference drops unconditionally
# (oplog_filter.go:175-180).
ALWAYS_DROP_COMMANDS = ("startIndexBuild", "abortIndexBuild")


def effective_ns(
    op_col: str = "op",
    ns_col: str = "ns",
    o_col: str = "o",
    cmap_col: Column | None = None,
) -> Column:
    """Effective namespace for white/black filtering
    (collector/filter/oplog_filter.go:147-290).

    DDL arrives as ``<db>.$cmd`` with the real target buried in the command
    object; DML on ``system.indexes`` carries the real target in ``o.ns``.
    The rewrite, as one CASE projection (no UDF — fused into the scan):

      op != 'c', ns ends 'system.indexes'  -> o.ns           (go:156-161)
      op == 'c', cmd in COLL_TARGET_COMMANDS -> db + '.' + o[cmd] (go:181-208)
      op == 'c', cmd == 'renameCollection' -> o[cmd]          (go:209-217,
                                              the value IS the full source ns)
      otherwise (DML, dropDatabase, applyOps, unknown cmd) -> ns unchanged

    Illegal-value note: the reference KEEPS rows whose command value is not
    a string ("illegal oplog, ignore", go:202-206). Under ``from_json``
    into ``map<string,string>`` a nested object/array value stringifies
    ('{...}' / '[...]') and a JSON null becomes NULL — this projection
    would then produce a garbage effective ns (or fall through to the raw
    ``db.$cmd``). The ignore path is therefore enforced one level up:
    :func:`mongoshake_spark.operators.filters.keep_namespace_ddl` keeps
    such rows unconditionally before the ns rule ever sees them.
    """
    if cmap_col is None:
        # bind the parse once per row; re-enter with the lambda variable
        return bind_command_map(
            o_col, lambda m: effective_ns(op_col, ns_col, o_col, cmap_col=m)
        )
    op, ns = F.col(op_col), F.col(ns_col)
    db = F.split(ns, r"\.", 2).getItem(0)
    cmap = cmap_col
    cmd = F.get(F.map_keys(cmap), F.lit(0))
    # ANSI mode: element_at throws on a missing key; try_element_at -> NULL.
    val = F.try_element_at(cmap, cmd)
    return (
        F.when(
            (op != "c") & ns.endswith("system.indexes"),
            F.coalesce(F.get_json_object(F.col(o_col), "$.ns"), ns),
        )
        .when((op == "c") & cmd.isin(*COLL_TARGET_COMMANDS) & val.isNotNull(),
              F.concat(db, F.lit("."), val))
        .when((op == "c") & (cmd == "renameCollection") & val.isNotNull(), val)
        .otherwise(ns)
    )


def gather_apply_ops(df: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """N9 GatherApplyOps (oplog/oplog.go:231-272): wrap N oplogs into one
    applyOps command document."""
    inner = F.collect_list(F.struct("op", "ns", "o"))
    return df.groupBy(*group_cols).agg(
        F.to_json(F.struct(inner.alias("applyOps"))).alias("o")
    )


def flatten_apply_ops(df: DataFrame, o_col: str = "o") -> DataFrame:
    """B4 applyOps flattening (oplog/txn_buffer.go:318-361): explode the
    inner ops of a non-txn applyOps command into individual rows."""
    inner_schema = "struct<applyOps:array<struct<op:string,ns:string,o:string>>>"
    parsed = F.from_json(F.col(o_col), inner_schema)
    exploded = df.withColumn("_inner", F.explode(parsed.getField("applyOps")))
    return (
        exploded.withColumn("op", F.col("_inner.op"))
        .withColumn("ns", F.col("_inner.ns"))
        .withColumn(o_col, F.col("_inner.o"))
        .drop("_inner")
    )
