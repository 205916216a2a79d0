package graft
import org.apache.spark.sql.SparkSession

/** Dev smoke: runs the driver's entry() contract exactly as the driver does. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
