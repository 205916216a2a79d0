package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named SparkEntry queries
  * (`runMain graft.Explain <sfDir> <name>[,<name>…]`) — the `.explain`
  * feedback loop for plan audits, without writing anything.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, namesCsv) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    namesCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      println(s"==== $name ====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
