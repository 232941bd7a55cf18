package graft.tools

import graft.sources.RowIngest
import graft.streaming.StreamingAssert
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Runnable demo of the streaming write path: order-status updates flow
  * in as a stream, flatten to triples, and the card-one state operator
  * emits each (entity, attr) value change exactly once.
  *
  *   sbt "runMain graft.tools.StreamDemo"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val rows = input.toDF().toDF("id", "status", "ts")
    val spec = RowIngest.specFor(rows, "ord", Seq("id"))
    val triples = StreamingAssert.streamTriplesWithTime(rows, spec, "ts")
    val resolved = StreamingAssert.resolveCardOne(
      triples.where(col("a") === "ord:status"))
    val q = resolved.writeStream.format("memory").queryName("demo")
      .outputMode("append").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((7L, "NEW", t("2024-01-01 00:00:01")))
    q.processAllAvailable()
    input.addData((7L, "PACKED", t("2024-01-01 00:00:05")),
      (8L, "NEW", t("2024-01-01 00:00:06")))
    q.processAllAvailable()
    input.addData((7L, "PACKED", t("2024-01-01 00:00:09"))) // no-op re-assert
    q.processAllAvailable()

    println("STREAM_RESULT=" + spark.sql(
      "SELECT value FROM demo ORDER BY atMicros, value")
      .collect().map(_.getString(0)).mkString(","))
    q.stop()
    spark.stop()
  }
}
