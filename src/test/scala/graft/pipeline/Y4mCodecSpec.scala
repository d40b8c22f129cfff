package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import Multimodal.Y4mCodec
import Y4mCodec.{Frame, Video}

/** The real-format video codec in isolation (no Spark): YUV4MPEG2 header
  * tag grammar, FRAME-marker demux, raster roundtrip, and loud rejection
  * of malformed/unsupported streams.
  */
class Y4mCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int): Frame = {
    def plane(p: Int): Array[Byte] =
      Array.tabulate(w * h)(i => ((i * 7 + seed * 31 + p * 11 + 3) % 251).toByte)
    Frame(plane(0), plane(1), plane(2))
  }

  test("encode→decode roundtrips header fields and every plane byte") {
    val src = Video(6, 4, 30, 1, Vector(frame(6, 4, 0), frame(6, 4, 1)))
    val back = Y4mCodec.decode(Y4mCodec.encode(src))
    assert(back.width == 6 && back.height == 4)
    assert(back.fpsNum == 30 && back.fpsDen == 1)
    assert(back.frames.length == 2)
    back.frames.zip(src.frames).foreach { case (b, s) =>
      assert(b.y.toSeq == s.y.toSeq && b.u.toSeq == s.u.toSeq &&
        b.v.toSeq == s.v.toSeq)
    }
  }

  test("the encoded stream starts with a spec-valid header line") {
    val bytes = Y4mCodec.encode(Video(8, 8, 25, 1, Vector(frame(8, 8, 0))))
    val header = new String(bytes.takeWhile(_ != '\n'),
      java.nio.charset.StandardCharsets.US_ASCII)
    assert(header == "YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C444")
    // and the first frame marker follows immediately
    val rest = new String(bytes.drop(header.length + 1).take(6),
      java.nio.charset.StandardCharsets.US_ASCII)
    assert(rest == "FRAME\n")
  }

  test("decode tolerates FRAME parameter suffixes and X extension tags") {
    val f = frame(2, 2, 0)
    val bytes =
      "YUV4MPEG2 W2 H2 F25:1 C444 XYSCSS=444\nFRAME Ipres\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        f.y ++ f.u ++ f.v
    val v = Y4mCodec.decode(bytes)
    assert(v.width == 2 && v.frames.length == 1)
    assert(v.frames.head.v.toSeq == f.v.toSeq)
  }

  test("decode rejects a non-Y4M payload") {
    intercept[IllegalArgumentException] {
      Y4mCodec.decode("RIFF....WEBP".getBytes ++ Array.fill[Byte](16)(0))
    }
  }

  test("decode rejects unknown header tags") {
    intercept[IllegalArgumentException] {
      Y4mCodec.decode(("YUV4MPEG2 W2 H2 F25:1 C444 Q9\nFRAME\n" +
        "x" * 12).getBytes)
    }
  }

  test("C420: decodes subsampled plane geometry and roundtrips the tag") {
    // 4×2 C420: Y = 8 bytes, U = V = 2 bytes → 12-byte raster
    val y = Array.tabulate[Byte](8)(i => (i + 1).toByte)
    val u = Array[Byte](10, 20); val v = Array[Byte](30, 40)
    val bytes = "YUV4MPEG2 W4 H2 F25:1 C420\nFRAME\n".getBytes ++ y ++ u ++ v
    val d = Y4mCodec.decode(bytes)
    assert(d.cs == "420" && d.frames.length == 1)
    assert(d.frames.head.y.toSeq == y.toSeq)
    assert(d.frames.head.u.toSeq == u.toSeq && d.frames.head.v.toSeq == v.toSeq)
    // encode→decode roundtrips the subsampled planes and the tag verbatim
    val back = Y4mCodec.decode(Y4mCodec.encode(d))
    assert(back.cs == "420" && back.frames.head.u.toSeq == u.toSeq)
    // variant tags share the geometry and survive the roundtrip
    val mp2 = Y4mCodec.decode(
      "YUV4MPEG2 W4 H2 F25:1 C420mpeg2\nFRAME\n".getBytes ++ y ++ u ++ v)
    assert(mp2.cs == "420mpeg2" && mp2.frames.head.v.toSeq == v.toSeq)
  }

  test("C420 is the spec default when no C tag is present") {
    val raster = Array.tabulate[Byte](12)(i => i.toByte)
    val d = Y4mCodec.decode(
      "YUV4MPEG2 W4 H2 F25:1\nFRAME\n".getBytes ++ raster)
    assert(d.cs == "420jpeg")
    assert(d.frames.head.y.length == 8 && d.frames.head.u.length == 2)
  }

  test("C420 rejects odd dimensions and truncated subsampled rasters") {
    val e = intercept[IllegalArgumentException] {
      Y4mCodec.decode(("YUV4MPEG2 W3 H2 F25:1 C420\nFRAME\n" +
        "x" * 9).getBytes)
    }
    assert(e.getMessage.contains("even"))
    val t = intercept[IllegalArgumentException] {
      Y4mCodec.decode(("YUV4MPEG2 W4 H2 F25:1 C420\nFRAME\n" +
        "x" * 10).getBytes) // needs 12 raster bytes
    }
    assert(t.getMessage.contains("shorter"))
  }

  test("upsample420: replication geometry and exact mean preservation") {
    // 4×4 target from a 2×2 chroma plane
    val p = Array[Byte](1, 2, 3, 4)
    val up = Y4mCodec.upsample420(p, 4, 4)
    assert(up.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2,
      3, 3, 4, 4, 3, 3, 4, 4))
    assert(up.map(_.toInt).sum == 4 * p.map(_.toInt).sum,
      "replication must preserve the plane mean exactly")
    intercept[IllegalArgumentException] {
      Y4mCodec.upsample420(Array[Byte](1, 2, 3), 4, 4)
    }
  }

  test("decode rejects a truncated frame raster") {
    val e = intercept[IllegalArgumentException] {
      Y4mCodec.decode(("YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" +
        "x" * 10).getBytes) // needs 48 raster bytes
    }
    assert(e.getMessage.contains("shorter"))
  }

  test("decode rejects a missing FRAME marker between rasters") {
    val f = frame(2, 2, 0)
    val bytes =
      "YUV4MPEG2 W2 H2 F25:1 C444\nFRAME\n".getBytes ++
        f.y ++ f.u ++ f.v ++ f.y // trailing bytes with no FRAME\n
    intercept[IllegalArgumentException] { Y4mCodec.decode(bytes) }
  }

  test("zero-frame stream decodes to an empty clip") {
    val v = Y4mCodec.decode("YUV4MPEG2 W2 H2 F25:1 C444\n".getBytes)
    assert(v.frames.isEmpty && v.width == 2)
  }

  test("luma SAD detects a constructed hard cut and stays quiet on a freeze") {
    def solid(v: Int): Frame = {
      val p = Array.fill(64)(v.toByte); Frame(p, p.clone(), p.clone())
    }
    // freeze → hard cut → freeze: exactly one transition clears the gate
    val vid = Y4mCodec.decode(Y4mCodec.encode(
      Video(8, 8, 25, 1, Vector(solid('a'), solid('a'), solid('z'), solid('z')))))
    val sads = Multimodal.lumaSads(vid)
    assert(sads.map(_._1) == Vector(1, 2, 3))
    assert(sads.map(_._2) == Vector(0L, 64L * ('z' - 'a'), 0L))
    val cuts = sads.filter(_._2 >= Multimodal.SceneCutSad)
    assert(cuts == Vector((2, 64L * ('z' - 'a'))),
      "exactly the constructed boundary must be called a cut")
  }

  test("aHash: strictly-above-mean bits, constant frame hashes to zero") {
    // constant raster: no pixel is STRICTLY above the mean → both halves 0
    val flat = Array.fill(64)(100.toByte)
    assert(Multimodal.aHashHalves(flat) == (0L, 0L))
    // one bright pixel at raster index 5: only that bit (low half) sets —
    // every other pixel sits below the lifted mean
    val spike = Array.fill(64)(10.toByte); spike(5) = 255.toByte
    assert(Multimodal.aHashHalves(spike) == (0L, 1L << 5))
    // and at index 40: the high half carries bit 40 − 32
    val spikeHi = Array.fill(64)(10.toByte); spikeHi(40) = 255.toByte
    assert(Multimodal.aHashHalves(spikeHi) == (1L << 8, 0L))
    // exactly-at-mean must NOT set (strict comparison): half 0s, half 200s
    val bimodal = Array.tabulate(64)(i => if (i < 32) 0.toByte else 200.toByte)
    val (hi, lo) = Multimodal.aHashHalves(bimodal)
    assert(lo == 0L && hi == -1L >>> 32,
      "200 > mean(100) sets exactly the upper half's 32 bits")
  }
}
