package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-experiments for the optimization round. Not part
  * of the driver contract; delete or ignore.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"SCRATCH $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val ev = Tables.events(spark, sfDir)
    time("scan_count")(println(ev.count()))
    time("scan_props_noop")(noop(ev.select(col("user_id"), col("props"))))
    time("scan_props_repart_noop")(noop(ev.select(col("user_id"), col("props")).repartition(32)))
    time("scan_parse_noop")(noop(ev.select(col("user_id"),
      get_json_object(col("props"), "$.k").cast("bigint").as("k"))))
    time("parse_post_repart_noop")(noop(ev.select(col("user_id"), col("props")).repartition(32)
      .select(col("user_id"), get_json_object(col("props"), "$.k").cast("bigint").as("k"))))
  }
}
