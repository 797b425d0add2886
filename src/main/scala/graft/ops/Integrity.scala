package graft.ops

import org.apache.spark.sql.DataFrame

/** Referential-integrity checks (SURVEY §2.4 J2/J3) — the reference's
  * commented-out validation trigger (`DDL Final.sql:140-161`, a
  * `LEFT JOIN … WHERE key IS NULL`) and the deleted per-row existence probe
  * (`__pycache__/q.cpython-38.pyc`), restated as set-oriented joins.
  *
  * Scale: `left_anti`/`left_semi` joins broadcast when the parent dimension
  * is small, otherwise shuffle once on the key — no per-row round-trips.
  */
object Integrity {

  /** J2: rows of `child` whose FK has no match in `parent` — violations. */
  def orphans(child: DataFrame, parent: DataFrame, keys: Seq[String]): DataFrame =
    child.join(parent, keys, "left_anti")

  /** J3: rows of `child` whose FK exists in `parent` (EXISTS semantics). */
  def validRows(child: DataFrame, parent: DataFrame, keys: Seq[String]): DataFrame =
    child.join(parent, keys, "left_semi")
}
