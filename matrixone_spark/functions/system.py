"""System / meta functions (VERSION, DATABASE, USER, CONNECTION_ID, ...).

Reference parity: these are session-context lookups in the reference —
``Version`` resolves the ``version`` session variable
(pkg/sql/plan/function/func_unary.go:9082; default
``8.0.30-MatrixOne-v...`` per pkg/frontend/variables.go:3612 and
pkg/config/configuration.go:76), ``GitVersion``/``BuildVersion`` read
build info (func_unary.go:9114,9126), and DATABASE/USER/CONNECTION_ID/
CURRENT_ROLE/LAST_INSERT_ID/FOUND_ROWS resolve from the frontend session
(pkg/sql/plan/function/function_id.go:1053-1081).

Spark-first design: a Spark cluster has no MySQL connection state, so the
session context is an explicit, injectable dataclass whose fields become
*constant-folded literals* in the plan — zero runtime cost, and Catalyst
treats them like any other foldable expression. The MySQL-dialect
translator (matrixone_spark/mysql_dialect.py) rewrites ``VERSION()`` etc.
in SQL text to these literals, mirroring how the reference binds them at
plan-build time rather than execution time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class SessionContext:
    """Injectable stand-in for the reference's frontend session state.

    Defaults mirror the reference's defaults: version prefix from
    pkg/config/configuration.go:76 + server version "1.3.0"
    (pkg/frontend/mysql_protocol.go:83), charset utf8mb4
    (pkg/frontend/variables.go:1210), sys-tenant admin role "moadmin"
    (pkg/frontend/authenticate.go moAdminRoleName).
    """

    version: str = "8.0.30-MatrixOne-v1.3.0"
    git_version: str = "unknown"
    database: str = "mo"
    user: str = "root@localhost"
    role: str = "moadmin"
    connection_id: int = 1
    charset: str = "utf8mb4"
    collation: str = "utf8mb4_general_ci"
    # OLTP counters: no INSERT/SELECT-FOUND state in a batch engine; they
    # exist so MySQL-dialect queries referencing them still plan.
    last_insert_id: int = 0
    found_rows: int = 0
    row_count: int = field(default=-1)  # MySQL: -1 after non-DML
    # Statement-start timestamp ("YYYY-MM-DD HH:MM:SS[.ffffff]"); None →
    # Spark current_timestamp() (still per-statement-constant).
    statement_ts: "str | None" = None


DEFAULT_CONTEXT = SessionContext()


def version(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.version)


def git_version(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.git_version)


def database(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.database)


def user(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.user)


def current_role(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.role)


def connection_id(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.connection_id).cast("bigint")


def charset(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.charset)


def collation(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.collation)


def last_insert_id(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.last_insert_id).cast("bigint")


def found_rows(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.found_rows).cast("bigint")


def row_count(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.lit(ctx.row_count).cast("bigint")


# SQL-text rewrites for the MySQL dialect layer: call form → literal SQL.
def sql_literals(ctx: SessionContext = DEFAULT_CONTEXT) -> "dict[str, str]":
    q = lambda s: "'" + s.replace("'", "''") + "'"
    return {
        "version": q(ctx.version),
        "git_version": q(ctx.git_version),
        "database": q(ctx.database),
        "schema": q(ctx.database),
        "user": q(ctx.user),
        "current_user": q(ctx.user),
        "session_user": q(ctx.user),
        "system_user": q(ctx.user),
        "current_role": q(ctx.role),
        "connection_id": f"CAST({ctx.connection_id} AS BIGINT)",
        "charset": q(ctx.charset),
        "collation": q(ctx.collation),
        "last_insert_id": f"CAST({ctx.last_insert_id} AS BIGINT)",
        "found_rows": f"CAST({ctx.found_rows} AS BIGINT)",
        "row_count": f"CAST({ctx.row_count} AS BIGINT)",
    }


# --- Statement-time clock family -------------------------------------------
# Reference: now()/curdate()/current_timestamp evaluate ONCE per statement
# from the txn's timestamp (function_id.go NOW; frontend binds the clock at
# statement start), NOT per row. The batch analogue: fold the whole family
# from an injectable statement timestamp; with no injection, Spark's own
# current_timestamp() — itself statement-constant by SQL semantics — is used.
# Session timezone is UTC (session.py), so local and UTC variants coincide.


def statement_ts(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    if ctx.statement_ts is None:
        return F.current_timestamp()
    return F.lit(ctx.statement_ts).cast("timestamp")


def now(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return statement_ts(ctx)


def sysdate(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    """MySQL SYSDATE() re-reads the wall clock per row; in a deterministic
    batch engine that is indistinguishable from the statement clock, and the
    reference's BVT treatment pins it the same way."""
    return statement_ts(ctx)


def curdate(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return statement_ts(ctx).cast("date")


def curtime(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return F.date_format(statement_ts(ctx), "HH:mm:ss")


def utc_timestamp(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return statement_ts(ctx)


def utc_date(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return curdate(ctx)


def utc_time(ctx: SessionContext = DEFAULT_CONTEXT) -> Column:
    return curtime(ctx)
