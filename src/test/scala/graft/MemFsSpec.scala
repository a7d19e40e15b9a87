package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Catalog, MemFileSystem}

/** The catalog lifecycle over the `mem://` in-memory filesystem — the
  * reference's hermetic-FS test story (connections.py `mem://` via
  * fsspec) re-expressed through Hadoop's FileSystem abstraction: the
  * same Catalog code that runs over file://, hdfs:// and s3a:// runs
  * unchanged over an in-JVM store, proving no hidden POSIX assumption
  * survives anywhere in the engine's write paths (CTAS rename-aside
  * swaps, the FileOutputCommitter protocol, incremental delete+insert,
  * single-file coalesce, schema listing).
  */
class MemFsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.mem.impl", classOf[MemFileSystem].getName)
    s
  }

  private def freshCatalog(ns: String): Catalog = {
    MemFileSystem.clearNamespace(ns)
    new Catalog(spark, s"mem://$ns/db")
  }

  test("schema lifecycle over mem://") {
    val cat = freshCatalog("t_schemas")
    assert(cat.listSchemas() == Seq(""))
    cat.createSchema("staging")
    cat.createSchema("marts")
    assert(cat.listSchemas() == Seq("", "marts", "staging"))
    cat.dropSchema("staging")
    assert(cat.listSchemas() == Seq("", "marts"))
  }

  test("ctas + read-back + atomic overwrite never touch disk") {
    val cat = freshCatalog("t_ctas")
    import spark.implicits._
    cat.createTableAs("", "nums", Seq(1, 2, 3).toDF("n"))
    assert(cat.listRelations("") == Seq("nums"))
    assert(cat.sql("select sum(n) as s from nums").head().getLong(0) == 6L)
    // overwrite goes through the same rename-aside swap as on disk
    cat.createTableAs("", "nums", Seq(10, 20).toDF("n"))
    assert(cat.table("", "nums").count() == 2L)
    assert(cat.table("", "nums").agg(org.apache.spark.sql.functions
      .sum("n")).head().getLong(0) == 30L)
    // no committer debris: only the table dir's entries remain
    val stray = cat.fs.listStatus(new Path("mem://t_ctas/db"))
      .map(_.getPath.getName).filterNot(_ == "nums.parquet")
    assert(stray.isEmpty, s"unexpected entries next to the table: ${stray.toSeq}")
  }

  test("single-file mode yields one plain file in the store") {
    val cat = freshCatalog("t_single")
    import spark.implicits._
    cat.createTableAs("", "one", (1 to 100).toDF("n").repartition(4),
      singleFile = true)
    val st = cat.fs.getFileStatus(cat.relationPath("", "one"))
    assert(st.isFile, "singleFile should materialize a plain file")
    assert(cat.table("", "one").count() == 100L)
  }

  test("incremental delete+insert over mem://") {
    val cat = freshCatalog("t_incr")
    import spark.implicits._
    cat.createTableIncremental("", "inc",
      Seq((1, "a"), (2, "b")).toDF("id", "v"), Seq("id"))
    cat.createTableIncremental("", "inc",
      Seq((2, "B"), (3, "c")).toDF("id", "v"), Seq("id"))
    val rows = cat.table("", "inc").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("rename and drop relations over mem://") {
    val cat = freshCatalog("t_ren")
    import spark.implicits._
    cat.createTableAs("", "src", Seq(1).toDF("n"))
    cat.renameRelation("", "src", "", "dst")
    assert(cat.listRelations("") == Seq("dst"))
    assert(cat.table("", "dst").count() == 1L)
    cat.dropRelation("", "dst")
    assert(cat.listRelations("").isEmpty)
  }

  test("namespaces are independent roots") {
    val a = freshCatalog("t_ns_a")
    val b = freshCatalog("t_ns_b")
    import spark.implicits._
    a.createTableAs("", "t", Seq(1).toDF("n"))
    assert(b.listRelations("").isEmpty,
      "namespace b must not see namespace a's relations")
    MemFileSystem.clearNamespace("t_ns_a")
    assert(MemFileSystem.entryCount("t_ns_a") == 0)
  }
}
