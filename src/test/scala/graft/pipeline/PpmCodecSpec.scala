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

  private def hostile(header: String): Array[Byte] =
    header.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ Array.fill[Byte](16)(0)

  test("decode rejects a hostile 65536x65536 header (Int raster overflow)") {
    // 65536*65536*3 overflows Int to a small/negative value; the Long-math
    // bounds check must reject it rather than attempt a copy.
    intercept[IllegalArgumentException] {
      PpmCodec.decode(hostile("P6\n65536 65536\n255\n"))
    }
  }

  test("decode rejects dimensions above MaxDim") {
    intercept[IllegalArgumentException] {
      PpmCodec.decode(hostile(s"P6\n${PpmCodec.MaxDim + 1} 1\n255\n"))
    }
  }

  test("decode rejects Int-wrapping header digit strings") {
    // 4294967297 = 2^32 + 1 wraps an Int accumulator to 1 and would decode
    // as a 1-pixel-wide image; the Long accumulator must reject it instead.
    intercept[IllegalArgumentException] {
      PpmCodec.decode(hostile("P6\n4294967297 1\n255\n"))
    }
  }

  test("decode rejects 2-byte-sample maxval (>255) rather than misdecode") {
    intercept[IllegalArgumentException] {
      PpmCodec.decode(hostile("P6\n1 1\n65535\n"))
    }
  }

  test("decode rejects zero dimensions") {
    intercept[IllegalArgumentException] {
      PpmCodec.decode(hostile("P6\n0 5\n255\n"))
    }
  }
}
