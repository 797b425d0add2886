package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DecimalType

/** Dev tool: print every query whose OUTPUT schema contains a DecimalType
  * column (the driver's hasher canonicalizes decimals differently from the
  * DuckDB oracle — outputs must be DOUBLE/integer; NOTES.md round-9). */
object SchemaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]").appName("schemaprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.configure(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Set[String] = args.drop(1).toSet
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.contains))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val dec = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] => s"${f.name}:${f.dataType.simpleString}"
        }
        if (dec.nonEmpty) println(s"DECIMAL $name ${dec.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
