package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Org-hierarchy flattening: enrich facts keyed by a leaf unit with the names
  * of their ancestors, given a `path` column `/root/lvl2/lvl3/leaf`.
  *
  * Reference utils.py:339-392 `add_organisation_units`: split path, pull the
  * level-2 and level-3 uids, join the dimension twice for names.
  *
  * Scale: the dimension (org units) is tiny relative to facts — both joins
  * are broadcast, so the whole flatten is map-side (zero shuffle on facts).
  */
object Hierarchy {

  /** @param facts     fact rows carrying `pathCol`
    * @param dim       id->name dimension, one row per unit at any level
    * @param pathCol   slash-separated ancestor path
    * @param levels    (1-based path segment position -> output column name)
    */
  def flatten(
      facts: DataFrame,
      dim: DataFrame,
      pathCol: String,
      idCol: String,
      nameCol: String,
      levels: Seq[(Int, String)]): DataFrame =
    levels.foldLeft(facts) { case (acc, (pos, outName)) =>
      acc
        .withColumn(s"__uid_$pos", split_part(col(pathCol), lit("/"), lit(pos)))
        .join(
          broadcast(dim.select(col(idCol).as(s"__id_$pos"), col(nameCol).as(outName))),
          col(s"__uid_$pos") === col(s"__id_$pos"),
          "left")
        .drop(s"__uid_$pos", s"__id_$pos")
    }
}
