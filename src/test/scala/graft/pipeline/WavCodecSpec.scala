package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import Multimodal.WavCodec
import WavCodec.Audio

/** The real-format audio codec in isolation (no Spark): RIFF chunk-walk
  * grammar, 16-bit LE PCM roundtrip, unknown-chunk skipping with the
  * odd-size pad byte, and loud rejection of malformed/unsupported files.
  */
class WavCodecSpec extends AnyFunSuite {

  private def audio(n: Int, seed: Int = 1): Audio =
    Audio(8000, Array.tabulate(n)(i => ((i * 257 + seed * 31) % 30011 - 15005).toShort))

  test("encode→decode roundtrips the header and every sample") {
    val src = audio(100)
    val back = WavCodec.decode(WavCodec.encode(src))
    assert(back.sampleRate == 8000)
    assert(back.samples.toSeq == src.samples.toSeq)
  }

  test("the encoded file is a spec-valid RIFF/WAVE with correct sizes") {
    val bytes = WavCodec.encode(audio(10))
    def tag(i: Int) = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def le32(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
      ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
    assert(tag(0) == "RIFF" && tag(8) == "WAVE")
    assert(le32(4) == bytes.length - 8, "RIFF chunk size covers the file")
    assert(tag(12) == "fmt " && le32(16) == 16)
    assert(tag(36) == "data" && le32(40) == 20)
  }

  test("decode skips unknown chunks, including the odd-size pad byte") {
    val src = audio(4)
    val plain = WavCodec.encode(src)
    // splice a 3-byte LIST chunk (odd size → 1 pad byte) between fmt and data
    val listChunk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = plain.take(36) ++ listChunk ++ plain.drop(36)
    // fix the RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val back = WavCodec.decode(spliced)
    assert(back.samples.toSeq == src.samples.toSeq)
  }

  test("decode rejects a non-RIFF payload") {
    intercept[IllegalArgumentException] {
      WavCodec.decode("OggS....".getBytes ++ Array.fill[Byte](16)(0))
    }
  }

  test("decode rejects a RIFF that is not WAVE") {
    val bytes = WavCodec.encode(audio(2))
    bytes(8) = 'A'
    intercept[IllegalArgumentException] { WavCodec.decode(bytes) }
  }

  test("decode rejects compressed (non-PCM) audio formats") {
    val bytes = WavCodec.encode(audio(2))
    bytes(20) = 85 // fake MP3 format tag in fmt chunk
    val e = intercept[IllegalArgumentException] { WavCodec.decode(bytes) }
    assert(e.getMessage.contains("PCM"))
  }

  test("decode rejects a chunk running past the end of the file") {
    val bytes = WavCodec.encode(audio(8))
    val truncated = bytes.take(bytes.length - 6)
    intercept[IllegalArgumentException] { WavCodec.decode(truncated) }
  }

  test("decode rejects a file with no data chunk") {
    val bytes = WavCodec.encode(audio(0)).take(36) // header + fmt only
    val e = intercept[IllegalArgumentException] { WavCodec.decode(bytes) }
    assert(e.getMessage.contains("data"))
  }
}
