package graft

/** Replicates the driver's t1 smoke: run the flagship entry on sf0.001 and
  * print the row count (driver checks rows > 0).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
