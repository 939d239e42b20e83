"""JDBC write-back upsert sink (SURVEY.md §2.1 S7/S8, relational target).

The reference lands results in MySQL two ways:

- row-batched ``INSERT ... ON DUPLICATE KEY UPDATE`` on the composite
  natural PK (etl_sales/db/db_helpers.py:25-40);
- bulk upsert via a temp staging table that is loaded fast and then
  merged set-wise into the target (etl_inventory/seed_stock_points.py:
  155-175, update_stock_points.py:237-256).

Spark-first, the second shape is the right one and subsumes the first:

1. dedupe the batch keep-latest per key IN SPARK (one window over the
   batch — same semantics as applying the row-ordered upserts one by
   one, but computed distributed);
2. land the batch into a staging table with the parallel JDBC writer —
   executors stream rows straight into the database, N connections wide
   (``numPartitions``), never through the driver;
3. one set-based ``MERGE INTO target USING staging`` statement executed
   driver-side — a single SQL round-trip regardless of batch size, with
   a ``staging.order >= target.order`` refinement so replayed/stale rows
   never clobber newer data (the reference gets the same effect from
   re-running whole idempotent day-batches).

The only driver-side work is issuing two short DDL/DML strings; all row
movement is executor-parallel. At 100 TB-of-source scale the batch that
reaches a relational sink is the *aggregated* result (the reference's
``ventas_limpias`` rollups), so the staging write is O(result), and the
MERGE is the database's own set-based plan — this is exactly how
warehouse loads are done on 1000-executor clusters.

Streaming: ``jdbc_upsert_sink`` returns a ``foreachBatch``-compatible
callable, making every micro-batch an idempotent MERGE (T6 — redelivery
of a batch is a no-op because of the order refinement).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sinks import upsert_keep_latest


def _q(ident: str) -> str:
    """Quote a column identifier the way Spark's JDBC writer created it
    (case-exact double quotes for Derby/ANSI; MySQL uses backticks but
    accepts ANSI quotes with ANSI_QUOTES — the mysql dialect below emits
    backticks)."""
    return '"' + ident.replace('"', '""') + '"'


def build_merge_sql(
    target: str,
    staging: str,
    keys: list[str],
    cols: list[str],
    order_col: str,
    *,
    dialect: str = "ansi",
) -> str:
    """Render the set-based upsert statement for one staged batch.

    ``ansi`` renders ``MERGE INTO`` (Derby 10.11+, Postgres 15+, SQL
    Server, Oracle). ``mysql`` renders the reference's own idiom,
    ``INSERT ... SELECT ... AS new ON DUPLICATE KEY UPDATE`` with an
    ``IF(new.order >= old.order)`` guard per column
    (db_helpers.py:25-40). Pure string builder — unit-testable without a
    live server.
    """
    upd_cols = [c for c in cols if c not in keys]
    if dialect == "mysql":
        bq = lambda c: "`" + c.replace("`", "``") + "`"  # noqa: E731
        col_list = ", ".join(bq(c) for c in cols)
        assigns = ", ".join(
            f"{bq(c)} = IF(new.{bq(order_col)} >= {bq(target)}.{bq(order_col)}, "
            f"new.{bq(c)}, {bq(target)}.{bq(c)})"
            for c in upd_cols
        )
        return (
            f"INSERT INTO {bq(target)} ({col_list}) "
            f"SELECT {col_list} FROM {bq(staging)} AS new "
            f"ON DUPLICATE KEY UPDATE {assigns}"
        )
    if dialect != "ansi":
        raise ValueError(f"unknown dialect {dialect!r} (expected 'ansi' or 'mysql')")
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in keys)
    sets = ", ".join(f"{_q(c)} = s.{_q(c)}" for c in upd_cols)
    col_list = ", ".join(_q(c) for c in cols)
    src_list = ", ".join(f"s.{_q(c)}" for c in cols)
    return (
        f"MERGE INTO {target} t USING {staging} s ON {on} "
        f"WHEN MATCHED AND s.{_q(order_col)} >= t.{_q(order_col)} "
        f"THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({src_list})"
    )


def build_unique_index_sql(target: str, keys: list[str]) -> str:
    """DDL adding the unique key the mysql upsert idiom depends on
    (``INSERT … ON DUPLICATE KEY UPDATE`` only updates when an insert
    violates a UNIQUE/PRIMARY constraint). Issued once at first-load
    bootstrap; key string columns are VARCHAR by construction (see
    ``createTableColumnTypes`` handling), so the index is valid."""
    bq = lambda c: "`" + c.replace("`", "``") + "`"  # noqa: E731
    cols = ", ".join(bq(k) for k in keys)
    return (
        f"ALTER TABLE {bq(target)} ADD CONSTRAINT "
        f"{bq(target + '_upsert_uk')} UNIQUE ({cols})"
    )


def _execute_sql(spark: SparkSession, url: str, sql: str, *, driver: str | None) -> int:
    """Run one statement on the JDBC source through the JVM gateway
    (driver-side — used ONLY for short DDL/MERGE strings, never rows)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def _table_exists(spark: SparkSession, url: str, table: str, *, driver: str | None) -> bool:
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        # Unquoted DDL identifiers case-fold per-database (Derby: upper);
        # probe the metadata catalog with the folded name and the literal.
        # getTables treats the name as a LIKE pattern where '_' matches
        # any character — every snake_case table name is a wildcard, so
        # escape with the driver's search-string escape or a false
        # positive ('ventasXlimpias') would skip the target bootstrap.
        meta = conn.getMetaData()
        esc = meta.getSearchStringEscape() or "\\"
        escaped = (
            table.replace(esc, esc + esc)
            .replace("_", esc + "_")
            .replace("%", esc + "%")
        )
        for probe in (escaped.upper(), escaped, escaped.lower()):
            rs = meta.getTables(None, None, probe, None)
            try:
                if rs.next():
                    return True
            finally:
                rs.close()
        return False
    finally:
        conn.close()


def _require_unique_index(
    spark: SparkSession,
    url: str,
    table: str,
    keys: list[str],
    *,
    driver: str | None,
) -> None:
    """Assert a UNIQUE index covering exactly ``keys`` exists on a
    pre-existing mysql-dialect target — without one, ``INSERT … ON
    DUPLICATE KEY UPDATE`` never fires its UPDATE branch and every
    replayed batch silently inserts duplicate rows. Probed through JDBC
    ``DatabaseMetaData.getIndexInfo`` (portable; no dialect SQL), with
    the same identifier case-folding as ``_table_exists``."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        want = {k.lower() for k in keys}
        for probe in (table.upper(), table, table.lower()):
            rs = meta.getIndexInfo(None, None, probe, True, False)
            indexes: dict[str, set[str]] = {}
            try:
                while rs.next():
                    name = rs.getString("INDEX_NAME")
                    col = rs.getString("COLUMN_NAME")
                    if name and col:
                        indexes.setdefault(name, set()).add(col.lower())
            finally:
                rs.close()
            if any(cols == want for cols in indexes.values()):
                return
            if indexes:
                break  # table found, constraint genuinely absent
        raise RuntimeError(
            f"jdbc_upsert: pre-existing table {table!r} has no UNIQUE index "
            f"over exactly {sorted(keys)} (found: "
            f"{ {n: sorted(c) for n, c in indexes.items()} }). The mysql "
            "ON DUPLICATE KEY idiom would blind-insert duplicates — add "
            f"the constraint ({build_unique_index_sql(table, keys)}) or "
            "point the sink at a table it can bootstrap."
        )
    finally:
        conn.close()


def jdbc_upsert(
    spark: SparkSession,
    batch: DataFrame,
    url: str,
    target_table: str,
    keys: list[str],
    order_col: str,
    *,
    driver: str | None = None,
    staging_table: str | None = None,
    num_partitions: int | None = None,
    dialect: str = "ansi",
    batch_size: int = 10_000,
    varchar_len: int = 1024,
) -> None:
    """Upsert one batch into a live JDBC table (S7/S8 relational sink).

    Semantics match :func:`osmart_etl_spark.io.sinks.upsert_keep_latest`
    on the composite PK ``keys``: per key, the row with the greatest
    ``order_col`` wins; stale redeliveries are ignored; replaying the
    same batch is a no-op (T6 idempotence).
    """
    cols = batch.columns
    for c in [*keys, order_col]:
        if c not in cols:
            raise ValueError(f"column {c!r} not in batch columns {cols}")
    # Unique-by-default staging name: a SHARED default ("_staging") let
    # two concurrent upserts into one target overwrite each other's
    # staging mid-merge — one batch's rows never land while its caller
    # reports success and advances its watermark (round-12 review; the
    # streaming wrapper already suffixed batch_id). Callers that pass
    # an explicit staging_table own their own serialization. A hard
    # crash can orphan one "<target>_stg_*" table (the finally-DROP
    # never ran) — the prefix makes orphans identifiable for DBA GC,
    # a better failure than the old cross-writer clobber.
    if staging_table is None:
        import uuid as _uuid

        staging_table = f"{target_table}_stg_{_uuid.uuid4().hex[:8]}"
    staging = staging_table

    # Spark's default Derby/ANSI mapping renders StringType as CLOB/TEXT,
    # which cannot be compared in a MERGE ON clause (and cannot be a PK on
    # most engines) — so KEY string columns (and a string order column)
    # are mapped to comparable VARCHAR via createTableColumnTypes. ONLY
    # those: the writer sets NULL string values with the dialect's CLOB
    # type code, which Derby rejects against a VARCHAR column (ERROR
    # 22005) — nullable payload strings must therefore stay CLOB, which
    # the MERGE never compares, only assigns. Keys are non-null by
    # upsert definition (a NULL natural key is invalid input).
    cmp_cols = set(keys) | {order_col}
    type_specs = []
    for f in batch.schema.fields:
        if f.dataType.typeName() == "string" and f.name in cmp_cols:
            type_specs.append(f"{f.name} VARCHAR({varchar_len})")
        elif f.dataType.typeName() == "decimal" and f.dataType.precision > 31:
            # Spark decimal arithmetic widens to (38, s), beyond Derby's
            # 31-digit max; the dialect's silent remap DROPS THE SCALE
            # (342.59 landed as 342 — measured). Pin DECIMAL(31, s)
            # explicitly: precision shrinks (31 digits is far beyond any
            # money aggregate), scale — the part that carries meaning —
            # survives. Applied to staging AND target via the shared
            # createTableColumnTypes.
            scale = min(f.dataType.scale, 31)
            type_specs.append(f"{f.name} DECIMAL(31, {scale})")
    col_types = ", ".join(type_specs)

    # 1. Batch-internal keep-latest (ON DUPLICATE KEY applies row-ordered
    #    inserts; a set-based MERGE rejects duplicate source keys, so the
    #    window collapse is required, not cosmetic).
    deduped = upsert_keep_latest(None, batch, keys, order_col)

    # NULL natural keys are invalid input and are REJECTED, not absorbed:
    # `t.k = s.k` is never true for NULL, so such a row would take the
    # NOT MATCHED branch on every replay and silently accumulate
    # duplicates — the exact corruption the sink exists to prevent.
    from functools import reduce

    any_null_key = reduce(
        lambda a, b: a | b, [F.col(k).isNull() for k in keys]
    )
    if deduped.filter(any_null_key).limit(1).count() > 0:
        raise ValueError(
            f"jdbc_upsert: batch contains NULL in key column(s) {keys}; "
            "NULL natural keys cannot be merged idempotently"
        )

    # 2. Parallel staging load (executor-side row movement; one DB
    #    connection per partition — num_partitions caps the fan-in).
    staged = deduped.repartition(num_partitions) if num_partitions else deduped
    writer = (
        staged.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("batchsize", str(batch_size))
        .mode("overwrite")
    )
    if col_types:
        writer = writer.option("createTableColumnTypes", col_types)
    if driver:
        writer = writer.option("driver", driver)
    writer.save()

    try:
        # 3. First load bootstraps the target with the staged schema
        #    (append-mode JDBC write of an empty frame creates the table
        #    without moving rows); the merge then applies uniformly.
        if not _table_exists(spark, url, target_table, driver=driver):
            empty_writer = (
                deduped.limit(0)
                .write.format("jdbc")
                .option("url", url)
                .option("dbtable", target_table)
                .mode("append")
            )
            if col_types:
                empty_writer = empty_writer.option("createTableColumnTypes", col_types)
            if driver:
                empty_writer = empty_writer.option("driver", driver)
            empty_writer.save()
            # The mysql idiom NEEDS a duplicate-key violation to fire its
            # UPDATE branch; Spark's CREATE TABLE emits no constraints,
            # so without this index every upsert would blindly insert.
            # (ANSI MERGE matches on the ON clause and needs no index.)
            if dialect == "mysql":
                _execute_sql(
                    spark,
                    url,
                    build_unique_index_sql(target_table, keys),
                    driver=driver,
                )
        elif dialect == "mysql":
            # PRE-EXISTING target (DBA-provisioned, or created by an
            # earlier non-mysql run): the ON DUPLICATE KEY idiom is a
            # blind INSERT unless a unique index over exactly `keys`
            # exists — every replayed batch would silently accumulate
            # duplicate rows per key, the corruption this sink exists
            # to prevent. Probe information_schema and fail loudly if
            # the constraint is missing (round-12 review).
            _require_unique_index(spark, url, target_table, keys, driver=driver)
        merge = build_merge_sql(
            target_table, staging, keys, cols, order_col, dialect=dialect
        )
        _execute_sql(spark, url, merge, driver=driver)
    finally:
        try:
            _execute_sql(spark, url, f"DROP TABLE {staging}", driver=driver)
        except Exception:  # noqa: BLE001 - staging cleanup is best-effort
            pass


def jdbc_upsert_sink(
    url: str,
    target_table: str,
    keys: list[str],
    order_col: str,
    **kwargs,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` adapter: every streaming micro-batch becomes one
    idempotent staged MERGE (T5/T6 — keyed state lives in the database,
    redelivered epochs are absorbed by the order refinement)::

        (stream.writeStream
               .foreachBatch(jdbc_upsert_sink(url, "stock", ["sku"], "ts"))
               .start())
    """

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.isEmpty():
            jdbc_upsert(
                batch.sparkSession,
                batch,
                url,
                target_table,
                keys,
                order_col,
                staging_table=f"{target_table}_staging_{batch_id}",
                **kwargs,
            )

    return _sink
