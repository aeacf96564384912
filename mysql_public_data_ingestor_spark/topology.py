"""Sink topology expansion: config -> list of (database, table) targets.

reference: database/db_manager.go:115-139 —
  - ``copies`` N identical databases ``{prefix}{1..N}``, one table each
    named ``{table_prefix}``;
  - ``extra`` databases ``{prefix}_{name}`` with k tables
    ``{table_prefix}_{1..k}``.

Fixture (FIXTURES.md A4 / database/db_manager_test.go:131-162):
prefix=test_prefix, copies=2, extra={extra1: 3}, table_prefix=
test_table_prefix ⇒ DBs [test_prefix1, test_prefix2,
test_prefix_extra1] with tables [test_table_prefix] ×2 and
[test_table_prefix_1.._3].

Every target receives every batch (broadcast fan-out,
reference: main.go:148-155).
"""

from __future__ import annotations

from dataclasses import dataclass

from .config import DatabasesConfig


@dataclass(frozen=True)
class SinkTarget:
    database: str
    table: str

    @property
    def qualified(self) -> str:
        return f"{self.database}.{self.table}"


def expand_topology(cfg: DatabasesConfig) -> list[SinkTarget]:
    targets: list[SinkTarget] = []
    for i in range(1, cfg.copies + 1):
        targets.append(SinkTarget(f"{cfg.prefix}{i}", cfg.table_prefix))
    for name, extra in cfg.extra.items():
        db = f"{cfg.prefix}_{name}"
        for k in range(1, extra.tables + 1):
            targets.append(SinkTarget(db, f"{cfg.table_prefix}_{k}"))
    return targets


def bootstrap_ddl(cfg: DatabasesConfig, schema) -> list[str]:
    """Idempotent DDL statements creating the full topology
    (reference: InitializeDatabases, database/db_manager.go:115-139)."""
    from .schema import render_create_database, render_create_table

    stmts: list[str] = []
    seen_dbs: set[str] = set()
    for t in expand_topology(cfg):
        if t.database not in seen_dbs:
            stmts.append(render_create_database(t.database))
            seen_dbs.add(t.database)
        stmts.append(render_create_table(t.database, t.table, schema))
    return stmts


def bootstrap_catalog_topology(spark, cfg: DatabasesConfig, schema) -> list[str]:
    """Execute the topology DDL against Spark's own catalog (the
    in-env executable twin of the MySQL DDL path — reference:
    InitializeDatabases, database/db_manager.go:115-139): one schema
    (database) per target DB, one managed parquet table per target,
    idempotent. Returns the qualified table names created.
    """
    created: list[str] = []
    seen_dbs: set[str] = set()
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    for t in expand_topology(cfg):
        if t.database not in seen_dbs:
            spark.sql(f"CREATE DATABASE IF NOT EXISTS `{t.database}`")
            seen_dbs.add(t.database)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS `{t.database}`.`{t.table}` ({cols}) USING parquet"
        )
        created.append(t.qualified)
    return created
