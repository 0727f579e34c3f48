package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with a broadcast query set — exact, one
  * pass over the corpus, no shuffle for scoring (only the per-query top-k
  * aggregate shuffles, and that's k rows per query per partition after the
  * window's partial rank).
  *
  * Scale path: random-hyperplane LSH — corpus is bucketed by sign-bit
  * signatures into L tables; a query only scores its own buckets. The
  * hyperplanes are derived deterministically from (table, plane, dim) hashes
  * so the signature is a pure column expression: no model object, no fit step,
  * nothing to broadcast but the queries.
  */
object Similarity {

  /** Exact cosine top-k of `corpus` rows for each row of (small) `queries`. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = corpus
      .select(col(idCol).as("vec_id2"), col(vecCol).as("__v"))
      .join(q)
      .filter(col("vec_id2") =!= col("query_id"))
      .withColumn("sim", cosine_sim(col("__qv"), col("__v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id2").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id2").as("vec_id"), col("sim"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane, dim):
    * a fixed-seed hash mapped to {-1.0, +1.0}. Keeping planes implicit makes
    * the signature a stateless, codegen'd expression. */
  private def planeSign(table: Int, plane: Int, dimIdx: Column): Column =
    when(pmod(xxhash64(lit(table * 131071 + plane * 8191), dimIdx), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Sign-bit signature of a vector under `bits` hyperplanes for LSH table
    * `table`: bit b = sign(dot(vec, plane_b)). */
  def lshSignature(vec: Column, table: Int, bits: Int): Column =
    (0 until bits)
      .map { b =>
        val dot = aggregate(
          zip_with(
            vec,
            sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast("double") * planeSign(table, b, i)),
          lit(0.0),
          (acc, x) => acc + x)
        when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** LSH-bucketed ANN: candidates = corpus rows sharing any of the L table
    * signatures with the query, scored exactly, top-k per query. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 4,
      bits: Int = 12): DataFrame = {
    def bucketed(df: DataFrame, id: String, v: String): DataFrame =
      df.select(
        col(idCol).as(id),
        col(vecCol).as(v),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), lshSignature(col(vecCol), t, bits).as("sig"))): _*)).as("__b"))
        .select(col(id), col(v), col("__b.tbl").as("tbl"), col("__b.sig").as("sig"))

    val qb = broadcast(bucketed(queries, "query_id", "__qv"))
    val cb = bucketed(corpus, "vec_id2", "__v")
    val candidates = cb
      .join(qb, Seq("tbl", "sig"))
      .filter(col("vec_id2") =!= col("query_id"))
      .select(col("query_id"), col("vec_id2"), col("__qv"), col("__v"))
      .dropDuplicates("query_id", "vec_id2")
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id2").asc)
    candidates
      .withColumn("sim", cosine_sim(col("__qv"), col("__v")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id2").as("vec_id"), col("sim"), col("rnk"))
  }
}
