package graft.prof

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r15: decompose d4_dedup_simhash (the biggest non-gate sf0.1 bench
  * row) into cumulative DAG prefixes so the expensive stage is
  * attributable before any rewrite attempt.
  *
  * Arms (each executed to the full-plan action, 3-run median):
  *   reps    — exact-collapse groupBy(md5(nrm)) with min_by(text)
  *   simhash — reps → simhash64 (word explode + two-level agg)
  *   cands   — full candidate DAG (chunks, window+lead, flipped
  *             probe join, union, hamming filter, distinct)
  *   shing   — shingles(reps) alone (the verify stage's input, which
  *             executes 3x inside verifyJaccard)
  *   full    — the whole d4 gate as shipped
  *
  * Usage: SPARK_GRAFT_SF_DIR=... Test/runMain graft.prof.D4Prof [arms...]
  */
object D4Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.EngineDefaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def nrm(c: org.apache.spark.sql.Column) =
      lower(trim(regexp_replace(c, "\\s+", " ")))
    def reps = docs
      .groupBy(md5(nrm(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("text"), col("doc_id")).as("text"))
    def simhash = graft.queries.LlmSim.simhash64(
      reps.select(col("doc_id"), col("text")))
    def shing = reps.select(col("doc_id"),
        split(nrm(col("text")), " ").as("words"))
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(0, size(words) - 3),
               i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"""))
          .as("sh"))
      .distinct()
    def cands = {
      val sim = simhash.select(col("doc_id"), col("simhash"))
      val chunks = sim.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk"),
            shiftrightunsigned(col("simhash"), 16 * c)
              .bitwiseAND(0xFFFFL).as("cval"))
        }: _*)).as("ck"))
        .select(col("doc_id"), col("simhash"),
          col("ck.chunk").as("chunk"), col("ck.cval").as("cval"))
      val wb = Window.partitionBy(col("chunk"), col("cval"))
        .orderBy(col("doc_id"))
      val ranked = chunks
        .withColumn("rn", row_number().over(wb))
        .withColumn("nbrs", array((1 to 8).map(i =>
          lead(struct(col("doc_id"), col("simhash")), i).over(wb)): _*))
      val exactBucket = ranked
        .select(col("doc_id").as("a"), col("simhash").as("sim_a"),
          explode(col("nbrs")).as("nb"))
        .filter(col("nb").isNotNull)
        .select(col("a"), col("nb.doc_id").as("b"),
          col("sim_a"), col("nb.simhash").as("sim_b"))
      val headMembers = ranked.filter(col("rn") <= 8)
        .select(col("doc_id").as("b"), col("simhash").as("sim_b"),
          col("chunk"), col("cval"))
      val flipped = ranked.select(col("doc_id").as("a"),
          col("simhash").as("sim_a"), col("chunk"),
          explode(array((0 until 16).map(bit =>
            col("cval").bitwiseXOR(lit(1L << bit))): _*)).as("cval"))
        .join(headMembers, Seq("chunk", "cval"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"),
          col("sim_a"), col("sim_b"))
      exactBucket.unionByName(flipped)
        .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 12)
        .select(col("a"), col("b")).distinct()
    }
    def full = graft.SparkEntry.queries("d4_dedup_simhash")(spark, sfDir)

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "reps" -> (() => reps),
      "simhash" -> (() => simhash),
      "shing" -> (() => shing),
      "cands" -> (() => cands),
      "full" -> (() => full))
    val wanted = if (args.isEmpty) arms.map(_._1) else args.toSeq
    def run(df: DataFrame): Unit = df.queryExecution.toRdd.count()
    for (name <- wanted) {
      val mk = arms.toMap.getOrElse(name,
        sys.error(s"unknown arm: $name (have ${arms.map(_._1)})"))
      run(mk()) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(mk())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[d4prof] $name%-8s median ${ts(1)}%.3f s  (${ts.mkString(", ")})")
    }
    spark.stop()
  }
}
