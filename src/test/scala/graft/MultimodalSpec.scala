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

  test("sampleFrames chunks payloads into positional frames that reassemble") {
    val docs2 = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val withBin = Multimodal.attachBinary(docs2, "doc_id", "text")
    val frames = Multimodal.sampleFrames(withBin, "doc_id", frameBytes = 4)
      .orderBy("frame_pos")
      .collect()
    assert(frames.length == 3) // 4+4+2
    val joined = frames.map(r => new String(r.getAs[Array[Byte]]("frame"), "UTF-8")).mkString
    assert(joined == "abcdefghij")
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(frames.last.getStruct(3).getInt(0) == 2) // last frame length
  }

  test("sampleFrames stride keeps every Nth frame") {
    val docs2 = Seq((1L, "abcdefghijkl")).toDF("doc_id", "text") // 12 bytes, 6 frames of 2
    val withBin = Multimodal.attachBinary(docs2, "doc_id", "text")
    val frames = Multimodal.sampleFrames(withBin, "doc_id", frameBytes = 2, stride = 2)
      .orderBy("frame_pos").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
  }

  test("decodeStubBatched is row-identical to per-row decode at any batch size") {
    val many = (0 until 100).map(i => (i.toLong, s"payload-$i")).toDF("doc_id", "text")
    val withBin = Multimodal.attachBinary(many, "doc_id", "text").repartition(3)
    val rowWise = Multimodal.decodeStub(spark, withBin, "doc_id").collect().sortBy(_.doc_id)
    for (bs <- Seq(1, 7, 64, 1000)) {
      val batched = Multimodal.decodeStubBatched(spark, withBin, "doc_id", batchSize = bs)
        .collect().sortBy(_.doc_id)
      assert(batched.toSeq == rowWise.toSeq, s"batchSize=$bs changed the output")
    }
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
