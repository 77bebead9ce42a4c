package graft

/** Local twin of the driver's t1 smoke: run SparkEntry.entry on sf0.001,
  * print the row count and the formatted physical plan (for eyeballing
  * broadcast/pushdown choices).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(10).foreach(r => println(s"[smoke] $r"))
    spark.stop()
  }
}
