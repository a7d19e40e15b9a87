package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** A directory of parquet files treated as a database — the Spark-first
  * re-expression of the reference's filesystem catalog
  * (reference: dbt/adapters/parquet/relation.py:1-124, util.py:9-46,
  * connections.py, impl.py:60-165).
  *
  * Layout contract (same as the reference):
  *   - `{database}/{table}.parquet`            — default ("") schema
  *   - `{database}/{schema}/{table}.parquet`   — named schema
  *
  * Unlike the reference (always one physical file), a relation here may
  * be either a single parquet file or a *directory* named
  * `{table}.parquet` containing part files — `spark.read.parquet`
  * treats both identically, so the path contract survives the move to
  * multi-part, multi-executor writes. That directory form is the
  * 100 TB scale path (the reference's README calls out partitioned
  * files as its own missing scale feature).
  *
  * Relations register as Spark temp views named `table` (default
  * schema) or `schema__table`, mirroring the reference's
  * view-per-parquet-file registration (relation.py:118-124).
  */
final class Catalog(val spark: SparkSession, val database: String) {

  // tolerate TIMESTAMP(NANOS) parquet columns (read as epoch-nanos
  // longs) — Spark's reader rejects them outright otherwise
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def root: Path = Paths.get(database)

  /** View name a relation registers under (single-part identifier). */
  def viewName(schema: String, table: String): String =
    if (schema.isEmpty) table else s"${schema}__$table"

  /** Physical path of a relation (reference: relation.py render_path). */
  def relationPath(schema: String, table: String): Path =
    if (schema.isEmpty) root.resolve(s"$table.parquet")
    else root.resolve(schema).resolve(s"$table.parquet")

  private def isRelation(p: Path): Boolean =
    p.getFileName.toString.endsWith(".parquet")

  /** All schemas: "" (default) plus every subdirectory
    * (reference: util.py list_schemas_from_fs).
    */
  def listSchemas(): Seq[String] = {
    val subs =
      if (!Files.isDirectory(root)) Seq.empty
      else {
        val s = Files.list(root)
        try s.filter(p => Files.isDirectory(p) && !isRelation(p))
          .map[String](_.getFileName.toString).sorted(Comparator.naturalOrder())
          .toArray.toSeq.map(_.toString)
        finally s.close()
      }
    "" +: subs
  }

  def schemaExists(schema: String): Boolean = listSchemas().contains(schema)

  /** All relations in a schema (reference: util.py list_relations_from_fs). */
  def listRelations(schema: String): Seq[String] = {
    val dir = if (schema.isEmpty) root else root.resolve(schema)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.filter(isRelation(_))
        .map[String](_.getFileName.toString.stripSuffix(".parquet"))
        .sorted(Comparator.naturalOrder()).toArray.toSeq.map(_.toString)
      finally s.close()
    }
  }

  /** reference: impl.py create_schema */
  def createSchema(schema: String): Unit =
    if (schema.nonEmpty) Files.createDirectories(root.resolve(schema))

  /** reference: impl.py drop_schema (recursive) */
  def dropSchema(schema: String): Unit =
    if (schema.nonEmpty) deleteRecursively(root.resolve(schema))

  /** reference: impl.py drop_relation */
  def dropRelation(schema: String, table: String): Unit = {
    deleteRecursively(relationPath(schema, table))
    spark.catalog.dropTempView(viewName(schema, table))
  }

  /** Move + re-register (reference: impl.py rename_relation). */
  def renameRelation(fromSchema: String, fromTable: String,
      toSchema: String, toTable: String): Unit = {
    val from = relationPath(fromSchema, fromTable)
    val to = relationPath(toSchema, toTable)
    if (from != to) {
      createSchema(toSchema)
      deleteRecursively(to)
      Files.move(from, to, StandardCopyOption.ATOMIC_MOVE)
      spark.catalog.dropTempView(viewName(fromSchema, fromTable))
      register(toSchema, toTable)
    }
  }

  /** Register one relation as a temp view
    * (reference: relation.py register_as_view_cmd).
    */
  def register(schema: String, table: String): DataFrame = {
    val df = spark.read.parquet(relationPath(schema, table).toString)
    df.createOrReplaceTempView(viewName(schema, table))
    df
  }

  /** Register every relation in every schema
    * (reference: connections.py open / impl.py _register_view_cmds).
    */
  def registerAll(): Unit =
    for (schema <- listSchemas(); table <- listRelations(schema))
      register(schema, table)

  /** Read one relation without registering. */
  def table(schema: String, table: String): DataFrame =
    spark.read.parquet(relationPath(schema, table).toString)

  /** Arbitrary SQL over the registered views
    * (reference: impl.py execute / the `duckdb` run-operation).
    */
  def sql(query: String): DataFrame = spark.sql(query)

  /** CTAS materialization (reference: macros/adapters.sql
    * parquet__create_table_as — `copy (sql) to '<path>'`).
    *
    * Writes to a hidden sibling temp dir, then swaps via filesystem
    * rename — readers never observe a half-written table. With
    * `singleFile=true` the result is one physical `.parquet` file
    * (byte-compatible with the reference's layout); otherwise it is a
    * `{table}.parquet/` directory of part files (the scale path —
    * writers stay fully parallel).
    */
  def createTableAs(schema: String, tableName: String, df: DataFrame,
      singleFile: Boolean = false): Unit = {
    createSchema(schema)
    val target = relationPath(schema, tableName)
    val tmp = target.resolveSibling(s".${tableName}.parquet.tmp")
    deleteRecursively(tmp)
    val writer = if (singleFile) df.coalesce(1) else df
    writer.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (singleFile) {
      val part = {
        val s = Files.list(tmp)
        try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow(() =>
            new IllegalStateException(s"no part file written for $tableName"))
        finally s.close()
      }
      deleteRecursively(target)
      Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(tmp)
    } else {
      deleteRecursively(target)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    }
    register(schema, tableName)
  }

  /** Views == tables for parquet (reference: macros/adapters.sql
    * parquet__create_view_as).
    */
  def createViewAs(schema: String, tableName: String, df: DataFrame): Unit =
    createTableAs(schema, tableName, df)

  /** Compact a relation to `numFiles` part files — the maintenance op
    * a 100 TB deployment runs after many small incremental writes (the
    * small-files problem). Same atomic tmp+rename swap as CTAS.
    */
  def compact(schema: String, tableName: String, numFiles: Int): Unit =
    createTableAs(schema, tableName,
      table(schema, tableName).repartition(numFiles))

  /** Materialize range-clustered on `clusterCols`: rows are range-
    * partitioned and sorted within partitions, so parquet row-group
    * min/max statistics become selective and scans with predicates on
    * the cluster columns skip most of the file — the poor-man's
    * Z-order, and the right default for append-only fact tables.
    */
  def createTableClusteredBy(schema: String, tableName: String,
      df: DataFrame, numFiles: Int, clusterCols: Seq[String]): Unit = {
    val cols = clusterCols.map(df.col)
    createTableAs(schema, tableName,
      df.repartitionByRange(numFiles, cols: _*)
        .sortWithinPartitions(cols: _*))
  }

  /** CSV seed ingestion (reference: impl.py load_dataframe +
    * macros/seed.sql): header + schema inference, materialized as
    * parquet, registered as a view.
    */
  def seedCsv(schema: String, tableName: String, csvPath: String): Unit = {
    val df = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(csvPath)
    createTableAs(schema, tableName, df)
  }

  /** Column introspection from the parquet footer
    * (reference: impl.py get_columns_in_relation).
    */
  def columnsOf(schema: String, table: String): Seq[StructField] =
    spark.read.parquet(relationPath(schema, table).toString).schema.fields.toSeq

  /** Catalog metadata table over every relation
    * (reference: macros/catalog.sql get_catalog): one row per column
    * with (database, schema, table, name, ordinal, type).
    */
  def catalogTable(): DataFrame = {
    import spark.implicits._
    val rows = for {
      schema <- listSchemas()
      tbl <- listRelations(schema)
      (f, i) <- columnsOf(schema, tbl).zipWithIndex
    } yield (database, schema, tbl, f.name, (i + 1).toLong, f.dataType.sql)
    rows.toDF("table_database", "table_schema", "table_name",
      "column_name", "ordinal_position", "column_type")
  }

  /** Row-level diff between two relations: (row_count_difference,
    * num_mismatched), the same contract as the reference's
    * columns-equal check (impl.py get_rows_different_sql) — here as
    * two exceptAll counts instead of generated SQL.
    */
  def rowsDifferent(a: DataFrame, b: DataFrame,
      columns: Seq[String] = Seq.empty): DataFrame = {
    val cols = (if (columns.nonEmpty) columns else a.columns.toSeq.sorted)
      .map(col)
    val pa = a.select(cols: _*)
    val pb = b.select(cols: _*)
    val missing = pa.exceptAll(pb).count() + pb.exceptAll(pa).count()
    val diff = pa.count() - pb.count()
    import spark.implicits._
    Seq((diff, missing)).toDF("row_count_difference", "num_mismatched")
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.delete(p)
    }
}
