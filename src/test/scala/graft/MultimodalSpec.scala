package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Pins the multimodal plumbing: binary payload integrity, stub-decode
  * determinism, and frame-sampling byte accounting. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val m = Multimodal.media(spark, sfDir)

  test("payload bytes round-trip: binary payload decodes back to the text") {
    val bad = m.join(Tables.documents(spark, sfDir),
        col("media_id") === col("doc_id"))
      .filter(col("payload").cast("string") =!= col("text"))
      .count()
    assert(bad == 0)
  }

  test("metadata is derived without reading payloads and is self-consistent") {
    val bad = m.filter(col("meta.n_bytes") =!= length(col("payload"))).count()
    assert(bad == 0)
    val kinds = m.select(col("meta.kind")).distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode stub is deterministic and in declared range") {
    val d1 = m.select(col("media_id"), Multimodal.decodeStub(col("payload")).as("d"))
      .select(col("media_id"), col("d.width"), col("d.height"), col("d.channels"))
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    val d2 = m.select(col("media_id"), Multimodal.decodeStub(col("payload")).as("d"))
      .select(col("media_id"), col("d.width"), col("d.height"), col("d.channels"))
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall { case (_, w, h, c) =>
      w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && c == 3
    })
  }

  test("resize stub bounds the longest side, keeps aspect, never upscales") {
    val r = m.select(Multimodal.decodeStub(col("payload")).as("d"))
      .select(col("d"), Multimodal.resizeStub(col("d"), 256).as("r"))
      .select(col("d.width"), col("d.height"), col("r.width"), col("r.height"),
        col("r.channels"))
      .as[(Int, Int, Int, Int, Int)].collect()
    assert(r.nonEmpty)
    r.foreach { case (w, h, rw, rh, c) =>
      assert(rw <= 256 && rh <= 256 && rw >= 1 && rh >= 1 && c == 3)
      assert(rw <= w && rh <= h, "must never upscale")
      if (math.max(w, h) > 256) { // uniform scale, floored, min 1
        val s = 256.0 / math.max(w, h)
        assert(rw == math.max(math.floor(w * s).toInt, 1) &&
          rh == math.max(math.floor(h * s).toInt, 1),
          s"scaling contract broken: $w x $h -> $rw x $rh")
      } else assert(rw == w && rh == h)
    }
  }

  test("frame sampling reassembles to the exact payload length") {
    val frames = Multimodal.sampleFrames(m)
    val bad = frames.groupBy(col("media_id"))
      .agg(sum(length(col("frame_bytes"))).as("total"),
        first(col("meta.n_bytes")).as("expected"))
      .filter(col("total") =!= col("expected"))
      .count()
    assert(bad == 0)
    // frame numbering is dense 0..n-1
    val gaps = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n"), max(col("frame_no")).as("mx"), min(col("frame_no")).as("mn"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .count()
    assert(gaps == 0)
  }
}
