package graft

import graft.ops.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("decode stub is deterministic across runs and partitionings") {
    val a = Multimodal.decodeStub(spark, Sf).collect()
    val b = Multimodal.decodeStub(spark, Sf).collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
  }

  test("decoded schema carries typed metadata") {
    val df = Multimodal.decodeStub(spark, Sf)
    assert(df.columns.toSeq ==
      Seq("doc_id", "mime", "width", "height", "n_frames", "feat_mean"))
    val r = df.head()
    assert(r.getAs[Int]("width") >= 64 && r.getAs[Double]("feat_mean") >= 0.0)
  }

  test("frame sampling emits stride-aligned offsets") {
    val r = Multimodal.frameSample(spark, Sf, stride = 4)
      .head(20)
    r.foreach { row =>
      val n = row.getAs[Int]("n_frames")
      val frames = row.getSeq[Int](row.fieldIndex("sampled_frames"))
      assert(frames.forall(f => f % 4 == 0 && f < n + 4))
      assert(frames.nonEmpty)
    }
  }

  test("metadata-only query prunes the binary column from the scan") {
    val plan = Multimodal.binaryMeta(spark, Sf).queryExecution.executedPlan.toString
    // binaryMeta derives everything from text bytes; the scan must not
    // read any column beyond doc_id/mime inputs/text
    assert(!plan.contains("n_chars"), "scan reads unused columns")
  }
}
