package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import Multimodal.PpmCodec
import PpmCodec.Image

/** The real-format codec in isolation (no Spark): P6 grammar, raster
  * roundtrip, comment tolerance, and exact nearest-neighbor semantics.
  */
class PpmCodecSpec extends AnyFunSuite {

  private def img(w: Int, h: Int): Image =
    Image(w, h, 255, Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 251).toByte))

  test("encode→decode roundtrips header and raster byte-for-byte") {
    val src = img(5, 3)
    val back = PpmCodec.decode(PpmCodec.encode(src))
    assert(back.width == 5 && back.height == 3 && back.maxVal == 255)
    assert(back.pixels.toSeq == src.pixels.toSeq)
  }

  test("decode accepts header comments and mixed whitespace") {
    val raster = Array.tabulate(2 * 2 * 3)(i => i.toByte)
    val bytes = "P6\n# a netpbm comment\n 2\t2 # trailing\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ raster
    val im = PpmCodec.decode(bytes)
    assert(im.width == 2 && im.height == 2)
    assert(im.pixels.toSeq == raster.toSeq)
  }

  test("decode rejects non-P6 payloads") {
    intercept[IllegalArgumentException] {
      PpmCodec.decode("P3\n1 1\n255\n".getBytes ++ Array[Byte](1, 2, 3))
    }
  }

  test("nearest-neighbor picks the floor-mapped source pixel per channel") {
    val src = img(4, 2)
    val out = PpmCodec.resizeNearest(src, 2, 1)
    assert(out.width == 2 && out.height == 1)
    // dst (x,y) ← src (x*4/2, y*2/1) = (2x, 0)
    for (x <- 0 until 2; c <- 0 until 3)
      assert(out.pixels((x * 3) + c) == src.pixels(((0 * 4 + 2 * x) * 3) + c))
  }

  test("identity resize is a copy") {
    val src = img(3, 3)
    assert(PpmCodec.resizeNearest(src, 3, 3).pixels.toSeq == src.pixels.toSeq)
  }
}
