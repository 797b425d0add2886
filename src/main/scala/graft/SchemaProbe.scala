package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Dev tool: print every query whose OUTPUT schema contains a DecimalType
  * column (the driver's hasher canonicalizes decimals differently from the
  * DuckDB oracle — outputs must be DOUBLE/integer; NOTES.md round-9). */
object SchemaProbe {

  /** Paths of every DecimalType inside `dt`, nested types included —
    * the ONE walk shared with OutputSchemaSpec (the gate and this probe
    * must agree on what counts as an offender). */
  def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.toSeq.flatMap(f => decimalPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path.key") ++
        decimalPaths(m.valueType, s"$path.value")
    case _ => Seq.empty
  }

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
        val dec = df.schema.fields.toSeq
          .flatMap(f => decimalPaths(f.dataType, f.name))
        if (dec.nonEmpty) println(s"DECIMAL $name ${dec.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
