package graft.core

import org.apache.spark.sql.SparkSession

/** Session defaults every graft entry point (Bench / Verify / Explain /
  * tests) applies on top of its own master/parallelism settings.
  *
  * The join policy encodes the library's scale stance: no query may
  * FORCE a broadcast of a corpus-proportional side (`broadcast()`
  * overrides the size check up to a hard 8 GB failure at the 100 TB
  * design point — see q3/q5/q41/q42/q43 and PlanSpec's hint audit),
  * but a size-CHECKED broadcast is the right plan whenever a build
  * side is genuinely small at the current scale. Spark's 10 MB default
  * threshold is calibrated for undersized executors; at the multi-GB
  * executor heaps this engine targets, a 64 MB build side broadcasts
  * comfortably (the reference engine hash-builds such sides
  * unconditionally). AQE re-checks at runtime with ACTUAL shuffle
  * sizes: joins the planner couldn't prove small still convert to
  * broadcast once the true size is known — and a side that outgrows
  * the threshold degrades to a sort-merge join, never a hard failure.
  *
  * Deliberately NOT set: `adaptive.maxShuffledHashJoinLocalMapThreshold`
  * (SMJ→shuffled-hash conversion). Measured at sf100, the conversion
  * composes badly with AQE partition coalescing: a coalesced partition
  * of a corpus-proportional build side needed a ~1 GB hash relation
  * and died on the per-task memory cap ("Can't acquire ... bytes to
  * build hash relation"). Queries that want a shuffled-hash join over
  * a heavy build declare it with an explicit hint, which pins the full
  * shuffle-partition fan-out instead of the coalesced one (see q43).
  */
object EngineDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    // testdata timestamps are naive (no isAdjustedToUTC); read them as
    // session-tz TIMESTAMP (UTC everywhere in graft), not TIMESTAMP_NTZ,
    // so streaming watermarks and the DuckDB oracle see identical values
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // hermetic-FS test target (reference connections.py `mem://`):
    // catalogs over mem://ns/db run fully in-JVM — see MemFileSystem
    .config("spark.hadoop.fs.mem.impl", classOf[MemFileSystem].getName)
    // shuffle/broadcast files are reference-tracked and reaped only on
    // driver GC; with a large heap a write-heavy suite can stack tens
    // of GB of dead shuffle files between natural GCs (observed at
    // sf100: ~31 GB). The periodic-GC floor bounds that lag.
    .config("spark.cleaner.periodicGC.interval", "2min")
}
