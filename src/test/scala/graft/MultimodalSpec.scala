package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.asMedia(
    Seq((1L, "abcdefghij"), (2L, "zz")).toDF("id", "text"), "id", "text")

  test("asMedia produces binary payload + typed metadata struct") {
    val r = media.orderBy("media_id").collect()
    assert(r(0).getAs[Array[Byte]]("payload").toSeq == "abcdefghij".getBytes("UTF-8").toSeq)
    val meta = r(0).getStruct(2)
    assert(meta.getString(0) == "image" && meta.getInt(3) == 16000)
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("decodeFeatures: stub decoder emits stable per-payload features") {
    val f = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(f(0).getLong(1) == 10L) // n_bytes
    // 'a'..'j' = 97..106, mean 101.5
    assert(math.abs(f(0).getDouble(2) - 101.5) < 1e-12)
    val hist = f(0).getSeq[Float](3)
    assert(hist.length == 8 && math.abs(hist.sum - 1.0f) < 1e-6)
    assert(hist(3) == 1.0f) // all bytes in bin 96..127
    // determinism across partitionings
    val f2 = Multimodal.decodeFeatures(media.repartition(5)).orderBy("media_id").collect()
    assert(f.map(_.toString).toSeq == f2.map(_.toString).toSeq)
  }

  test("frameSample slices strided fixed-size frames; short payloads drop out") {
    val frames = Multimodal.frameSample(media, frameBytes = 4, stride = 3)
      .orderBy("media_id", "frame_idx").collect()
    // payload len 10: frames at offsets 0,3,6 -> 3 frames; len 2 -> none
    assert(frames.forall(_.getLong(0) == 1L))
    assert(frames.length == 3)
    assert(new String(frames(1).getAs[Array[Byte]]("frame")) == "defg")
  }

  test("resizeStub crops or zero-pads to the target size") {
    val out = media.select(col("media_id"),
        Multimodal.resizeStub(col("payload"), 4).as("r"))
      .orderBy("media_id").collect()
    assert(new String(out(0).getAs[Array[Byte]]("r")) == "abcd")
    val padded = out(1).getAs[Array[Byte]]("r")
    assert(padded.length == 4 && padded(2) == 0 && padded(3) == 0)
  }
}
