package graft.fads

import org.scalatest.funsuite.AnyFunSuite
import Fads._

/** Unit + property tests for the pure FADS core (SURVEY.md §5.2), no Spark. */
class FadsCoreSpec extends AnyFunSuite {

  private def in(qids: Array[Double], pid: Long, seq: Long, arrival: Long = 0L): In =
    In(qids, pid, s"p$seq", arrival, seq)

  test("Cluster.of computes per-QID bounding box") {
    val c = Cluster.of(
      Seq(in(Array(1.0, 10.0), 1, 0), in(Array(3.0, -2.0), 2, 1), in(Array(2.0, 4.0), 3, 2)),
      createdAtMs = 0, seq = 0)
    assert(c.lo.toSeq == Seq(1.0, -2.0))
    assert(c.hi.toSeq == Seq(3.0, 10.0))
  }

  test("fits is strict containment (boundary rejected — SURVEY §2.4 Q5)") {
    val c = Cluster(Array(0.0, 0.0), Array(10.0, 10.0), 0, 0)
    assert(c.fits(Array(5.0, 5.0)))
    assert(!c.fits(Array(0.0, 5.0)))   // on lo boundary
    assert(!c.fits(Array(5.0, 10.0)))  // on hi boundary
    assert(!c.fits(Array(-1.0, 5.0)))
  }

  test("infoLoss averages normalized widths; zero global range contributes 0 (Q8)") {
    val c = Cluster(Array(2.0, 5.0), Array(4.0, 5.0), 0, 0)
    val gLo = Array(0.0, 5.0)
    val gHi = Array(10.0, 5.0) // second QID: zero-width global range
    assert(math.abs(c.infoLoss(gLo, gHi) - ((2.0 / 10.0) + 0.0) / 2) < 1e-12)
  }

  test("distance: correct formula vs reference precedence bug (Q2)") {
    val cfgOk = Config(k = 2, bufferConstraint = 5, reuseTtlMs = 1000, nQid = 1)
    val st = new State(1)
    st.gLo(0) = 0.0; st.gHi(0) = 10.0
    val a = in(Array(2.0), 1, 0); val b = in(Array(7.0), 2, 1)
    assert(math.abs(new Engine(cfgOk).distance(st, a, b) - 0.5) < 1e-12)
    val cfgBug = cfgOk.copy(quirks = Quirks(referenceDistance = true))
    // reference: |2-7|/10 - 0 = 0.5 here too; shift gLo to expose the bug
    st.gLo(0) = 1.0
    assert(math.abs(new Engine(cfgBug).distance(st, a, b) - (0.5 - 1.0)) < 1e-12)
    assert(math.abs(new Engine(cfgOk).distance(st, a, b) - (5.0 / 9.0)) < 1e-12)
  }

  private val cfg = Config(k = 3, bufferConstraint = 5, reuseTtlMs = 1000, nQid = 1,
    quirks = Quirks(uniquePid = false))

  private def runAll(cfg: Config, rows: Seq[In]): Seq[Out] =
    new Engine(cfg).runAll(rows.iterator, (t: In) => t.arrivalMs).toSeq

  test("cardinality: every tuple released exactly once after drain") {
    val rows = (0 until 50).map(i => in(Array(i.toDouble % 17), pid = i, seq = i, arrival = i))
    val out = runAll(cfg, rows)
    assert(out.size == rows.size)
    assert(out.map(_.payload.asInstanceOf[String]).toSet == rows.map(_.payload).toSet)
  }

  test("containment: each released tuple's QIDs lie within its emitted interval") {
    val rows = (0 until 200).map { i =>
      in(Array((i * 37 % 101).toDouble), pid = i, seq = i, arrival = i)
    }
    val byPayload = rows.map(r => r.payload -> r).toMap
    runAll(cfg, rows).foreach { o =>
      val orig = byPayload(o.payload.asInstanceOf[String])
      assert(orig.qids(0) >= o.lo(0) - 1e-9 && orig.qids(0) <= o.hi(0) + 1e-9,
        s"${orig.qids(0)} not in [${o.lo(0)}, ${o.hi(0)}] (suppressed=${o.suppressed})")
    }
  }

  test("k-anonymity: a fresh-cluster release emits k rows sharing one interval") {
    // identical QIDs -> zero-loss cluster beats anything; first release after
    // buffer overflows must emit k=3 rows with the same (degenerate) interval
    val rows = (0 until 7).map(i => in(Array(5.0), pid = i, seq = i, arrival = i))
    val out = runAll(cfg.copy(bufferConstraint = 5), rows)
    val first3 = out.take(3)
    assert(first3.map(o => (o.lo(0), o.hi(0))).distinct.size == 1)
    assert(!first3.exists(_.suppressed))
  }

  test("suppression uses global bounds when no k-group and no reusable cluster") {
    // k=3 but only 2 tuples ever -> both drained via suppress
    val rows = Seq(in(Array(1.0), 1, 0, 0), in(Array(9.0), 2, 1, 1))
    val out = runAll(cfg, rows)
    assert(out.size == 2)
    assert(out.forall(_.suppressed))
    assert(out.forall(o => o.lo(0) == 1.0 && o.hi(0) == 9.0))
  }

  test("global bounds only widen (monotonicity)") {
    val st = new State(1)
    val e = new Engine(cfg)
    var prevLo = Double.PositiveInfinity
    var prevHi = Double.NegativeInfinity
    (0 until 100).foreach { i =>
      e.step(st, in(Array((i * 13 % 29).toDouble - 5), pid = i, seq = i, arrival = i), i)
      assert(st.gLo(0) <= prevLo && st.gHi(0) >= prevHi)
      prevLo = st.gLo(0); prevHi = st.gHi(0)
    }
  }

  test("cluster reuse: later tuple inside an old cluster box is released alone") {
    // Form a cluster over {1,2,3} (k=3, same arrival burst), then send a
    // tuple at 2.5 which fits strictly inside [1,3]; with the buffer still
    // below k-1 at drain time it must reuse the old cluster, not suppress.
    val burst = Seq(
      in(Array(1.0), 1, 0, 0), in(Array(2.0), 2, 1, 1), in(Array(3.0), 3, 2, 2),
      in(Array(100.0), 4, 3, 3), in(Array(101.0), 5, 4, 4), in(Array(102.0), 6, 5, 5))
    val cfg2 = cfg.copy(bufferConstraint = 2, reuseTtlMs = 1000000)
    val late = Seq(in(Array(2.5), 7, 6, 6))
    val out = runAll(cfg2, burst ++ late)
    val lateOut = out.find(_.payload == "p6").get
    assert(!lateOut.suppressed)
    assert(lateOut.lo(0) == 1.0 && lateOut.hi(0) == 3.0)
  }

  test("cluster TTL expiry removes reuse candidates (Q: processing-time TTL)") {
    val burst = Seq(
      in(Array(1.0), 1, 0, 0), in(Array(2.0), 2, 1, 1), in(Array(3.0), 3, 2, 2))
    val cfg2 = cfg.copy(bufferConstraint = 2, reuseTtlMs = 10)
    val e = new Engine(cfg2)
    val st = new State(1)
    burst.foreach(t => e.step(st, t, t.arrivalMs))
    assert(st.clusters.nonEmpty) // the {1,2,3} cluster formed and is reusable
    // advance the clock far beyond TTL; a fitting tuple must now suppress
    val out = e.step(st, in(Array(2.5), 9, 9, 5000), 5000)
    val drained = e.drain(st, 5001)
    assert((out ++ drained).filter(_.payload == "p9").forall(_.suppressed))
  }

  test("unique-PID constraint (paper mode) blocks same-person clusters") {
    // 6 tuples, all pid=1 except the pivot flow; with uniquePid on, no
    // k-cluster can form -> everything suppressed or reused
    val rows = (0 until 6).map(i => in(Array(i.toDouble), pid = 1, seq = i, arrival = i))
    val paper = cfg.copy(quirks = Quirks(uniquePid = true))
    val out = runAll(paper, rows)
    assert(out.size == 6)
    assert(out.forall(_.suppressed)) // no distinct pids -> no clusters ever
  }

  test("buffer overflow trigger is a count (Q1): size bufferConstraint+1 forces release") {
    val e = new Engine(cfg.copy(bufferConstraint = 3))
    val st = new State(1)
    val emitted = (0 until 4).flatMap(i =>
      e.step(st, in(Array(i.toDouble), pid = i, seq = i, arrival = i), i))
    assert(emitted.nonEmpty)           // 4th insert exceeded the 3-tuple cap
    assert(st.buffer.size <= 3)
  }

  test("deterministic: same input twice gives identical output") {
    val rows = (0 until 300).map { i =>
      in(Array((i * 7919 % 997).toDouble, (i * 104729 % 31).toDouble),
        pid = i % 40, seq = i, arrival = i / 3)
    }
    val c = Config(k = 5, bufferConstraint = 20, reuseTtlMs = 50, nQid = 2)
    val a = runAll(c, rows).map(o => (o.payload, o.lo.toSeq, o.hi.toSeq, o.suppressed))
    val b = runAll(c, rows).map(o => (o.payload, o.lo.toSeq, o.hi.toSeq, o.suppressed))
    assert(a == b)
  }
}
