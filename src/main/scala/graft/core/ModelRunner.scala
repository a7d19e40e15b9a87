package graft.core

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame

/** One SQL model: a SELECT with `{{ ref('name') }}` /
  * `{{ source('schema', 'table') }}` templating, materialized into the
  * catalog under (schema, name) — the dbt-core capability the
  * reference adapter plugs into (reference: README.md "Why",
  * macros/adapters.sql materializations).
  */
final case class Model(
    name: String,
    sql: String,
    schema: String = "",
    singleFile: Boolean = false,
    ephemeral: Boolean = false) {

  /** Names this model `ref()`s. */
  def refs: Seq[String] =
    ModelRunner.RefPattern.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** (schema, table) sources this model reads. */
  def sources: Seq[(String, String)] =
    ModelRunner.SourcePattern.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2))).toSeq.distinct
}

/** DAG-ordered, multi-threaded model executor over a [[Catalog]] —
  * ref()/source() resolution, topological waves, parallel
  * materialization (the behavior dbt-core provides around the
  * reference adapter; concurrency exercised by its
  * tests/functional/basic/test_concurrency.py).
  *
  * `sources` maps a source schema name to a catalog holding it (so
  * models can read an external read-only dataset while materializing
  * into a separate writable catalog).
  */
final class ModelRunner(
    target: Catalog,
    sourceResolver: (String, String) => DataFrame) {

  /** Run every model in dependency order; independent models in the
    * same wave run concurrently on `threads` threads (dbt's `threads`
    * profile setting). Returns materialized names in completion order.
    */
  def run(models: Seq[Model], threads: Int = 4): Seq[String] = {
    val dups = models.groupBy(_.name).filter(_._2.sizeIs > 1).keys.toSeq.sorted
    require(dups.isEmpty,
      s"duplicate model name(s) across schemas (ref() is by bare name, " +
        s"so names must be unique): ${dups.mkString(", ")}")
    val byName = models.map(m => m.name -> m).toMap
    models.foreach { m =>
      val missing = m.refs.filterNot(byName.contains)
      require(missing.isEmpty,
        s"model ${m.name} refs unknown model(s): ${missing.mkString(", ")}")
    }
    // topological waves
    var remaining = models
    var done = Set.empty[String]
    val order = Seq.newBuilder[String]
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      while (remaining.nonEmpty) {
        val (ready, blocked) =
          remaining.partition(_.refs.forall(done.contains))
        require(ready.nonEmpty,
          s"model cycle among: ${blocked.map(_.name).mkString(", ")}")
        val wave = Future.traverse(ready) { m =>
          Future { materialize(m, byName); m.name }
        }
        val finished = Await.result(wave, Duration.Inf)
        order ++= finished
        done ++= finished
        remaining = blocked
      }
    } finally pool.shutdown()
    order.result()
  }

  private def materialize(m: Model, byName: Map[String, Model]): Unit = {
    val rendered = render(m, byName)
    if (m.ephemeral)
      // dbt ephemeral: participates in the DAG but is never written —
      // it registers under the same view name refs resolve to, so
      // downstream models are oblivious to the materialization mode
      target.spark.sql(rendered)
        .createOrReplaceTempView(target.viewName(m.schema, m.name))
    else
      target.createTableAs(m.schema, m.name, target.spark.sql(rendered),
        singleFile = m.singleFile)
  }

  /** Resolve `{{ ref/source }}` to registered view names; sources are
    * registered on demand from the source resolver. A ref resolves to
    * the *referenced* model's schema (looked up in `byName`), not the
    * referring model's — models in different schemas ref each other.
    */
  private[core] def render(m: Model, byName: Map[String, Model]): String = {
    var out = m.sql
    out = ModelRunner.RefPattern.replaceAllIn(out, mm => {
      val refName = mm.group(1)
      val referenced = byName.getOrElse(refName,
        throw new IllegalArgumentException(
          s"model ${m.name} refs unknown model: $refName"))
      target.viewName(referenced.schema, refName)
    })
    out = ModelRunner.SourcePattern.replaceAllIn(out, mm => {
      val (schema, table) = (mm.group(1), mm.group(2))
      val view = "src__" + target.viewName(schema, table)
      sourceResolver(schema, table).createOrReplaceTempView(view)
      view
    })
    out
  }
}

object ModelRunner {
  // any non-quote chars: odd model/table names (spaces, dots, dashes)
  // resolve through Catalog.viewName's sanitized alias rather than
  // failing to match and surfacing as an opaque SQL parse error
  val RefPattern = """\{\{\s*ref\('([^']+)'\)\s*\}\}""".r
  val SourcePattern = """\{\{\s*source\('([^']*)',\s*'([^']+)'\)\s*\}\}""".r
}
