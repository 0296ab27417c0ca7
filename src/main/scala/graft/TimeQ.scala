package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: wall-clock one or more registry queries at a scale
  * factor under the bench's session shape (local[32], 32 shuffle
  * partitions, `toRdd.count` materialization — see Bench for why a
  * plain count() would let Catalyst prune the expressions under test).
  * Usage: runMain graft.TimeQ <name>[,<name>…] [sfDir] */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // compiled-class cache sized for the full registry (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val rows = df.queryExecution.toRdd.count()
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  $rows rows")
    }
    spark.stop()
  }
}
