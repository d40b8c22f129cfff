package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Multimodal.Y4mCodec
import Y4mCodec.{Frame, Video}

/** Property-based invariants of the pure (no-Spark) kernels: the Y4M
  * codec's lossless roundtrip across BOTH plane geometries, replication
  * upsampling's exact statistics, and the SQ8 pack/dot arithmetic —
  * randomized inputs where the example-based specs pin single cases.
  */
class CodecPropertySpec extends AnyFunSuite {

  /** Seeded forAll: deterministic samples per property (the offline cache
    * has no scalatest-scalacheck bridge — the [[graft.fads.FadsPropertySpec]]
    * convention).
    */
  private def forAll[A](gen: Gen[A], n: Int = 60)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(60), Seed(i.toLong)))
    }

  private val byteGen: Gen[Byte] = Gen.choose(-128, 127).map(_.toByte)

  private case class Clip(w: Int, h: Int, cs: String, frames: Vector[Frame])

  private val clipGen: Gen[Clip] = for {
    wHalf <- Gen.choose(1, 8)
    hHalf <- Gen.choose(1, 8)
    cs <- Gen.oneOf("444", "420", "420jpeg", "420mpeg2", "420paldv")
    w = 2 * wHalf; h = 2 * hHalf // even dims valid for every colorspace
    cpl = if (cs == "444") w * h else (w / 2) * (h / 2)
    nf <- Gen.choose(0, 4)
    frames <- Gen.listOfN(nf, for {
      y <- Gen.listOfN(w * h, byteGen)
      u <- Gen.listOfN(cpl, byteGen)
      v <- Gen.listOfN(cpl, byteGen)
    } yield Frame(y.toArray, u.toArray, v.toArray))
  } yield Clip(w, h, cs, frames.toVector)

  test("property: Y4M encode→decode is lossless for 444 AND the 420 family") {
    forAll(clipGen) { c =>
      val src = Video(c.w, c.h, 25, 1, c.frames, c.cs)
      val back = Y4mCodec.decode(Y4mCodec.encode(src))
      assert(back.width == c.w && back.height == c.h && back.cs == c.cs)
      assert(back.frames.length == c.frames.length)
      back.frames.zip(c.frames).foreach { case (b, s) =>
        assert(b.y.toSeq == s.y.toSeq)
        assert(b.u.toSeq == s.u.toSeq)
        assert(b.v.toSeq == s.v.toSeq)
      }
    }
  }

  test("property: upsample420 preserves sums ×4 and only replicates stored bytes") {
    val gen = for {
      wHalf <- Gen.choose(1, 12)
      hHalf <- Gen.choose(1, 12)
      p <- Gen.listOfN(wHalf * hHalf, byteGen)
    } yield (2 * wHalf, 2 * hHalf, p.toArray)
    forAll(gen) { case (w, h, p) =>
      val up = Y4mCodec.upsample420(p, w, h)
      assert(up.length == w * h)
      // exact statistics: each stored byte appears exactly 4 times
      assert(up.map(b => (b & 0xff).toLong).sum ==
        4L * p.map(b => (b & 0xff).toLong).sum)
      assert(up.toSet == p.toSet)
      // geometry: (r, c) reads the stored (r/2, c/2) sample
      for (r <- 0 until h; cc <- 0 until w)
        assert(up(r * w + cc) == p((r / 2) * (w / 2) + (cc / 2)))
    }
  }

  test("property: SQ8 pack stays in byte range and dot is exact integer algebra") {
    import graft.functions.{Sq8Dot, Sq8Pack}
    val vecGen = for {
      n <- Gen.choose(1, 96)
      xs <- Gen.listOfN(n, Gen.choose(-1000000, 1000000).map(_ / 1000000.0))
    } yield xs.toArray
    def pack(x: Array[Double]): (Array[Byte], Double) = {
      val s = 127.0 / math.max(1e-12, x.map(math.abs).max)
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(x)
      (Sq8Pack.pack(ad, s), s)
    }
    forAll(vecGen) { x =>
      val (qb, s) = pack(x)
      // s = 127/max|x| puts every quantized value inside ±127: the
      // byte cast never wraps, and the extreme value maps to ±127
      assert(qb.forall(b => b >= -127 && b <= 127))
      qb.zip(x).foreach { case (b, v) =>
        assert(b.toDouble == math.floor(v * s + 0.5), s"pack($v, $s)")
      }
      // dot: exact integer fold, symmetric, PSD on the diagonal
      assert(Sq8Dot.dot(qb, qb) ==
        qb.map(b => b.toLong * b).sum)
      assert(Sq8Dot.dot(qb, qb) >= 0L)
    }
    // pairs share one dimension — SQ8 dims are fixed corpus-wide, and
    // Sq8Dot fails loud on a mismatch rather than truncating (ADVICE r13)
    val pairGen = for {
      n <- Gen.choose(1, 96)
      xs <- Gen.listOfN(n, Gen.choose(-1000000, 1000000).map(_ / 1000000.0))
      ys <- Gen.listOfN(n, Gen.choose(-1000000, 1000000).map(_ / 1000000.0))
    } yield (xs.toArray, ys.toArray)
    forAll(pairGen) { case (a, b) =>
      val (qa, _) = pack(a); val (qc, _) = pack(b)
      assert(Sq8Dot.dot(qa, qc) == Sq8Dot.dot(qc, qa),
        "integer dot must be symmetric")
      assert(Sq8Dot.dot(qa, qc) ==
        qa.indices.map(i => qa(i).toLong * qc(i).toLong).sum)
    }
    // a dimension mismatch is a corrupt row / wrong column: loud failure
    val e = intercept[IllegalArgumentException] {
      Sq8Dot.dot(Array[Byte](1, 2, 3), Array[Byte](1, 2))
    }
    assert(e.getMessage.contains("length mismatch"))
  }
}
