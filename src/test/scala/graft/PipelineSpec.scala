package graft

class PipelineSpec extends SparkSpec {

  test("integrationReport produces a validated wide report at sf0.001") {
    val out = Pipeline.integrationReport(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // wide report shape: keys + 4 indicator cols + tax rollup
    assert(out.columns.toSeq ==
      Seq("period", "region", "nation", "a_f", "n_f", "n_o", "r_f", "tax_total"))
    // region/nation are normalized (lowercased, accent-free)
    assert(rows.forall(r => r.getString(1) == r.getString(1).toLowerCase))
    // rule matrix kept only consistent rows: A_F <= 2 * R_F wherever both exist
    rows.foreach { r =>
      val aF = Option(r.get(3)).map(_.asInstanceOf[Double])
      val rF = Option(r.get(6)).map(_.asInstanceOf[Double])
      (aF, rF) match {
        case (Some(a), Some(rf)) => assert(a <= rf * 2, s"inconsistent row survived: $r")
        case _ => ()
      }
    }
  }
}
