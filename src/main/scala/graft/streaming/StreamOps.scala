package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.queries.{Q, QueryModule}

/** Structured Streaming surface (SURVEY.md §2.4 stream_events):
  * parquet file source → event-time tumbling window + watermark →
  * memory sink. The driver's gate replays the batch-equivalent SQL in
  * DuckDB, so the streaming result must agree with the batch answer —
  * exactly the contract a Lambda-free pipeline needs (same code path
  * would run `writeStream` against a live directory at scale; here
  * `processAllAvailable` drains the one static file synchronously).
  */
object StreamOps extends QueryModule {

  def queries: Map[String, Q] = Map(
    "q39_stream_window" -> Q(
      (s, dir) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val raw = s.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
        val ev = schema("ts").dataType match {
          case LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ => raw
        }
        val agg = ev
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 6))).cast("double")
              .as("total_value"))
        val qname = "graft_q39_sink"
        s.streams.active.filter(_.name == qname).foreach(_.stop())
        val query = agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(qname)
          .start()
        try query.processAllAvailable() finally query.stop()
        s.table(qname)
          .select(
            date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("hour"),
            col("event_type"), col("n"), col("total_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
          event_type, count(*) AS n,
          cast(sum(cast(value as decimal(18,6))) as double) AS total_value
        FROM events
        GROUP BY hour, event_type
        ORDER BY hour, event_type"""))
  )
}
