package graft
import org.apache.spark.sql.SparkSession

/** One-shot scale-smell sweep over EVERY query's physical plan: flags
  * operators that are fine at fixture scale but wrong at 100 TB —
  * cartesian products, non-broadcast nested-loop joins, and
  * single-partition exchanges — excluding the queries where the shape is
  * intended and argued (q31's broadcast NLJ probe, final result sorts).
  * Run ad hoc; PlanSpec pins the per-query invariants permanently. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    var flagged = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val smells = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> p.contains("BroadcastNestedLoopJoin"),
          // NOTE: PrefixSum's numParts-row offsets window and 1-row
          // global aggregates legitimately flag here — the smell is only
          // real when the exchanged frame is corpus-sized (triage table
          // in NOTES "Plan-smell sweep").
          "SinglePartition-exchange" ->
            p.contains("Exchange SinglePartition")
        ).collect { case (s, true) => s }
        if (smells.nonEmpty) { flagged += 1; println(s"[audit] $name: ${smells.mkString(", ")}") }
      } catch { case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage}") }
    }
    println(s"[audit] done, $flagged flagged")
    spark.stop()
  }
}
