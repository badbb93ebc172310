"""W6 doCommand — DDL execution against the Spark catalog.

Reference: executor/db_writer.go:61-219 RunCommand dispatches each command
oplog against the target: createIndexes (rebuilt to command form),
commitIndexBuild -> createIndexes, dropDatabase, create (strip
autoIndexId), collMod/drop/rename/convertToCapped/... run as-is, unknown
commands wrapped in applyOps; admin-db routing per
oplog/cmd_oplog.go:51-56.

Spark mapping — the observable catalog effects:

  create            -> CREATE DATABASE/TABLE IF NOT EXISTS (schemaless
                       collections land as a generic (_id, doc) layout)
  drop              -> DROP TABLE IF EXISTS
  renameCollection  -> same-db: ALTER TABLE RENAME TO; cross-db: CTAS+DROP
                       (Spark cannot rename across databases)
  dropDatabase      -> DROP DATABASE CASCADE
  createIndexes /
  commitIndexBuild  -> merge the stripped index spec (W12 rules,
                       plans/full_sync.build_index_specs) into the table's
                       TBLPROPERTIES under 'mongoshake.indexes' — parquet
                       tables have no secondary indexes, so the table
                       property IS the target-side layout spec
  dropIndex(es) /
  deleteIndex(es)   -> remove matching entries from the property
  collMod / convertToCapped / emptycapped
                    -> recorded in 'mongoshake.collmod' (no catalog analog)
  applyOps / unknown -> recorded only (the reference wraps these in
                       applyOps and ships them through; with no Mongo
                       target the journal entry is the observable effect)

Every action is idempotent (IF NOT EXISTS / IF EXISTS / property
overwrite), preserving the kernel's replay-safety contract.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

_IDENT = re.compile(r"[^A-Za-z0-9_]")

INDEX_PROP = "mongoshake.indexes"
COLLMOD_PROP = "mongoshake.collmod"
DOC_SCHEMA = "_id STRING, doc STRING"

INDEX_CREATE_CMDS = ("createIndexes", "commitIndexBuild")
INDEX_DROP_CMDS = ("dropIndex", "dropIndexes", "deleteIndex", "deleteIndexes")
COLLMOD_CMDS = ("collMod", "convertToCapped", "emptycapped")


def _ident(name: str) -> str:
    return _IDENT.sub("_", name)


@dataclass
class SparkCatalogDDL:
    """Executes command oplogs against the session catalog. One instance
    per apply kernel; ``actions`` records what each command did (the
    journal the tests and the dead-letter audit read)."""

    spark: SparkSession
    actions: list[tuple] = field(default_factory=list)

    # -- helpers -----------------------------------------------------------

    def _tbl(self, db: str, coll: str) -> str:
        return f"`{_ident(db)}`.`{_ident(coll)}`"

    def _ensure_db(self, db: str) -> None:
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{_ident(db)}`")

    def _table_exists(self, db: str, coll: str) -> bool:
        return self.spark.catalog.tableExists(f"{_ident(db)}.{_ident(coll)}")

    def _get_prop(self, db: str, coll: str, prop: str) -> list:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {self._tbl(db, coll)}").collect()
        for r in rows:
            if r["key"] == prop:
                try:
                    return json.loads(r["value"])
                except (json.JSONDecodeError, TypeError):
                    # a corrupt stored payload (e.g. written by a foreign
                    # tool) must degrade to "no recorded specs" — raising
                    # here would poison the stream permanently, since
                    # every checkpoint retry replays the same command
                    return []
        return []

    def _set_prop(self, db: str, coll: str, prop: str, value) -> None:
        # Spark SQL string literals interpret BOTH quote doubling and
        # backslash escapes (escapedStringLiterals=false default), so a
        # json.dumps payload containing \" or \\ must have its
        # backslashes doubled too — single-quote-only escaping would
        # store corrupted JSON that _get_prop can never parse back
        payload = json.dumps(value).replace("\\", "\\\\").replace("'", "''")
        self.spark.sql(
            f"ALTER TABLE {self._tbl(db, coll)} SET TBLPROPERTIES ('{prop}' = '{payload}')"
        )

    # -- dispatch ----------------------------------------------------------

    def execute(self, ns: str, o_json: str) -> str:
        """Apply one command oplog; returns the action taken (a short tag
        mirroring RunCommand's switch arms)."""
        db = ns.split(".", 1)[0]
        try:
            o = json.loads(o_json)
            if not isinstance(o, dict) or not o:
                raise ValueError("not a command object")
        except (json.JSONDecodeError, ValueError, TypeError):
            # TypeError covers o_json=None / non-string payloads — a
            # malformed oplog must journal as unparseable, not escape
            # foreachBatch and kill the whole stream
            self.actions.append(("unparseable", ns, o_json))
            return "unparseable"
        cmd, value = next(iter(o.items()))
        handler = {
            "create": self._do_create,
            "drop": self._do_drop,
            "renameCollection": self._do_rename,
            "dropDatabase": self._do_drop_database,
        }.get(cmd)
        if handler is not None:
            action = handler(db, value, o)
        elif cmd in INDEX_CREATE_CMDS:
            action = self._do_create_indexes(db, value, o)
        elif cmd in INDEX_DROP_CMDS:
            action = self._do_drop_indexes(db, value, o)
        elif cmd in COLLMOD_CMDS:
            action = self._do_collmod(db, value, o, cmd)
        else:
            # db_writer.go:194-216 default arm: wrap in applyOps; with no
            # Mongo target the record is the effect
            action = "applyOps-wrapped"
        self.actions.append((action, ns, o_json))
        return action

    # -- arms --------------------------------------------------------------

    def _do_create(self, db: str, coll, o: dict) -> str:
        if not isinstance(coll, str):
            return "ignored-illegal"  # "illegal oplog, ignore"
        self._ensure_db(db)
        # reference strips autoIndexId when idIndex present (db_writer.go:167-172)
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._tbl(db, coll)} ({DOC_SCHEMA}) USING PARQUET"
        )
        return "create"

    def _do_drop(self, db: str, coll, o: dict) -> str:
        if not isinstance(coll, str):
            return "ignored-illegal"
        self.spark.sql(f"DROP TABLE IF EXISTS {self._tbl(db, coll)}")
        return "drop"

    def _do_rename(self, db: str, value, o: dict) -> str:
        # value = full source ns; o['to'] = full target ns
        # (oplog_filter.go:209-217: the value IS the namespace)
        to = o.get("to")
        if not isinstance(value, str) or "." not in value or not isinstance(to, str):
            return "ignored-illegal"
        sdb, scoll = value.split(".", 1)
        tdb, tcoll = (to.split(".", 1) if "." in to else (sdb, to))
        if not self._table_exists(sdb, scoll):
            return "rename-missing-source"
        self._ensure_db(tdb)
        if _ident(sdb) == _ident(tdb):
            self.spark.sql(
                f"ALTER TABLE {self._tbl(sdb, scoll)} RENAME TO {self._tbl(tdb, tcoll)}"
            )
        else:
            # Spark cannot rename across databases: CTAS + DROP. CTAS copies
            # data but NOT table properties, so the mongoshake.* specs
            # (index layout, collmod journal) are carried across explicitly
            # — dropping them would lose the W12 index state on a cross-db
            # move.
            carried = {
                prop: self._get_prop(sdb, scoll, prop)
                for prop in (INDEX_PROP, COLLMOD_PROP)
            }
            self.spark.sql(
                f"CREATE TABLE {self._tbl(tdb, tcoll)} USING PARQUET AS "
                f"SELECT * FROM {self._tbl(sdb, scoll)}"
            )
            for prop, value in carried.items():
                if value:
                    self._set_prop(tdb, tcoll, prop, value)
            self.spark.sql(f"DROP TABLE {self._tbl(sdb, scoll)}")
        return "renameCollection"

    def _do_drop_database(self, db: str, value, o: dict) -> str:
        self.spark.sql(f"DROP DATABASE IF EXISTS `{_ident(db)}` CASCADE")
        return "dropDatabase"

    def _do_create_indexes(self, db: str, coll, o: dict) -> str:
        from mongoshake_spark.plans.full_sync import build_index_specs

        if not isinstance(coll, str):
            return "ignored-illegal"
        # createIndexes carries the index fields inline (db_writer.go:67-88);
        # commitIndexBuild carries an 'indexes' array (db_writer.go:89-124)
        cmd = next(iter(o))
        raw = o.get("indexes") if cmd == "commitIndexBuild" else [
            {k: v for k, v in o.items() if k != cmd}
        ]
        if not isinstance(raw, list):
            return "ignored-illegal"
        ns = f"{db}.{coll}"
        specs = build_index_specs({ns: [i for i in raw if isinstance(i, dict)]}).get(ns, [])
        if not specs:
            return "createIndexes-empty"
        if not self._table_exists(db, coll):
            self._do_create(db, coll, o)
        merged = {s.get("name"): s for s in self._get_prop(db, coll, INDEX_PROP)}
        for s in specs:
            merged[s.get("name")] = s
        self._set_prop(db, coll, INDEX_PROP, list(merged.values()))
        return "createIndexes"

    def _do_drop_indexes(self, db: str, coll, o: dict) -> str:
        if not isinstance(coll, str) or not self._table_exists(db, coll):
            return "dropIndexes-missing"
        target = o.get("index")
        if target is None:
            # MongoDB errors on dropIndexes without an index argument — a
            # malformed oplog must not silently wipe every recorded spec
            return "ignored-illegal"
        existing = self._get_prop(db, coll, INDEX_PROP)
        # Mongo's documented index argument forms: '*' (all), a name, an
        # ARRAY of names, or the KEY-PATTERN DOCUMENT — treating the
        # latter two as no-match would silently no-op while reporting
        # success, diverging the recorded layout from the source
        if target == "*":
            kept = []
        elif isinstance(target, list):
            names = set(target)
            kept = [s for s in existing if s.get("name") not in names]
        elif isinstance(target, dict):
            kept = [s for s in existing if s.get("key") != target]
        else:
            kept = [s for s in existing if s.get("name") != target]
        self._set_prop(db, coll, INDEX_PROP, kept)
        return "dropIndexes"

    def _do_collmod(self, db: str, coll, o: dict, cmd: str) -> str:
        if not isinstance(coll, str) or not self._table_exists(db, coll):
            return f"{cmd}-missing"
        mods = self._get_prop(db, coll, COLLMOD_PROP)
        mods.append(o)
        self._set_prop(db, coll, COLLMOD_PROP, mods)
        return cmd
