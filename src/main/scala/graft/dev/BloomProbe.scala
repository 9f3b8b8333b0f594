package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: probe which bloom-filter surfaces this Spark build exposes. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql(
        "SELECT might_contain((SELECT bloom_filter_agg(xxhash64(id)) FROM range(100)), xxhash64(5L)) AS hit").collect()
      println("[bloom] SQL功 might_contain/bloom_filter_agg: " + r.head.get(0))
    } catch { case e: Throwable => println("[bloom] SQL path failed: " + e.getMessage.take(200)) }
    try {
      val df = spark.range(1000).toDF("id")
      val bf = df.stat.bloomFilter("id", 1000, 0.01)
      println("[bloom] df.stat.bloomFilter works, mightContain(5)=" + bf.mightContain(5L) +
        " mightContain(99999)=" + bf.mightContain(99999L) + " bits=" + bf.bitSize())
    } catch { case e: Throwable => println("[bloom] stat path failed: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
