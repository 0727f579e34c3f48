package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")

  test("attachBinary carries payload bytes plus a typed metadata struct") {
    val out = Multimodal.attachBinary(docs, "doc_id", "text").orderBy("doc_id").collect()
    val r = out(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    val meta = r.getStruct(2)
    assert(meta.getInt(0) == 11)
    assert(meta.getString(2) == "application/octet-stream")
  }

  test("decodeStub is deterministic and partition-parallel") {
    val withBin = Multimodal.attachBinary(docs, "doc_id", "text").repartition(3)
    val a = Multimodal.decodeStub(spark, withBin, "doc_id").collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(spark, withBin, "doc_id").collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a(0).byte_len == 11)
    assert(a(0).width >= 64 && a(0).height >= 64)
    assert(a(1).byte_len == 0)
  }
}
