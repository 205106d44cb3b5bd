package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Asset
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private def asset(bytes: Array[Byte], nFrames: Int): Asset =
    Asset(7L, "web", "mp4", 64, 64, nFrames, bytes)

  test("frame split with step 1 reassembles the payload exactly") {
    val payload = (0 until 1003).map(i => (i * 37 % 251).toByte).toArray
    for (n <- Seq(1, 2, 3, 7, 8)) {
      val frames = Multimodal.sampleFrames(asset(payload, n), step = 1)
      assert(frames.map(_._1) == (0 until n))
      assert(frames.flatMap(_._2.toSeq) == payload.toSeq)
    }
  }

  test("sampled frames are the even-indexed frames of the full split") {
    val payload = (0 until 500).map(_.toByte).toArray
    val full = Multimodal.sampleFrames(asset(payload, 7), step = 1).toMap
    val sampled = Multimodal.sampleFrames(asset(payload, 7), step = 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4, 6))
    sampled.foreach { case (i, b) => assert(b.toSeq == full(i).toSeq) }
  }

  test("decode stub is deterministic and counts every byte") {
    val payload = Array[Byte](0, 63, 64, 127, -128, -1) // buckets 0,0,1,1,2,3
    val f = Multimodal.fakeDecode(asset(payload, 1))
    assert(f == Multimodal.fakeDecode(asset(payload, 1)))
    assert(f.n_bytes == 6)
    assert((f.h0, f.h1, f.h2, f.h3) == (2L, 2L, 1L, 1L))
    assert(f.byte_mean == (0 + 63 + 64 + 127 + 128 + 255) / 6.0)
  }

  test("resize keeps every other byte and halves dimensions") {
    val payload = Array[Byte](10, 11, 12, 13, 14)
    val (w, h, out) = Multimodal.fakeResize(asset(payload, 1))
    assert((w, h) == (32, 32))
    assert(out.toSeq == Seq[Byte](10, 12, 14))
  }
}
