package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the vector dot product — the hot kernel of
  * every cosine-similarity operator in graft.pipeline.Similarity.
  *
  * Preference order per the build brief: built-in composition
  * (`aggregate(zip_with(...))`) works but runs interpreted lambda steps per
  * element; this expression is whole-stage-codegen'd into a tight primitive
  * loop (no per-element allocation), ~an order of magnitude faster on 64-dim
  * arrays, while computing the IDENTICAL left-to-right IEEE sum — so results
  * stay bit-for-bit equal to the higher-order-function form and to the
  * DuckDB oracle.
  *
  * Array elements must be non-null doubles (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<double> (AbstractDataType is private[sql], so no
  // ExpectsInputTypes here; graft call sites always cast to double arrays)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Native Catalyst expression for the polynomial string hash — the kernel of
  * every text fingerprint / shingle / MinHash / SimHash operator
  * (graft.pipeline.TextAnalysis.polyHashExpr's HOF form runs one interpreted
  * lambda step per character). Computes h = fold(chars, 0, (a,c) =>
  * (a*31 + c) mod 1e9+7) over UTF-16 code units — identical to the
  * `aggregate(transform(split(s,''), ascii), ...)` form and to DuckDB's
  * `list_reduce(list_prepend(0, list_transform(string_split(s,''), ord)))`
  * for ASCII/BMP text (the corpus here), as one codegen'd loop.
  */
case class PolyHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % 1000000007L; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_polyhash"
}

object PolyHash {
  /** Called from generated code. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31 + s.charAt(i)) % 1000000007L; i += 1 }
    h
  }
}

/** Native expression fusing whitespace tokenization + per-token polynomial
  * hash into ONE pass over the string: `graft_token_hashes(s)` ==
  * `transform(split(s, ' '), w -> graft_polyhash(w))` bit-for-bit
  * (empty segments — leading/trailing/consecutive spaces, empty string —
  * hash to 0 exactly like the split form). The split+transform composition
  * materializes a string array and runs an interpreted lambda per token;
  * this emits the hash array directly, no intermediate strings. It is the
  * front of every MinHash/shingle pipeline (graft.pipeline.Dedup).
  */
case class TokenHashes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TokenHashes.hash(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenHashes.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_token_hashes"
}

object TokenHashes {
  /** Called from generated code. One pass: accumulate h=(h*31+c) mod 1e9+7,
    * emit at each space and at end-of-string (split-with-limit=-1 parity:
    * "" yields [0], trailing space yields a trailing 0).
    */
  def hash(s: String): ArrayData = {
    var n = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') n += 1; i += 1 }
    val out = new Array[Long](n)
    var h = 0L
    var k = 0
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') { out(k) = h; k += 1; h = 0L }
      else h = (h * 31 + c) % 1000000007L
      i += 1
    }
    out(k) = h
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native expression emitting the polynomial fingerprint of EVERY length-L
  * character gram of a string in one pass: `graft_gram_fps(s, L)[i]` is the
  * hash of `substring(s, i+1, L)` under h = fold(chars, 0, (a,c) =>
  * (a*31 + c) mod [[GramFps.P57]]). This is the kernel of exact
  * repeated-substring dedup (graft.pipeline.SubstringDedup): the
  * composition-of-built-ins form (`explode` positions → `substring` →
  * hash/shuffle the raw gram) allocates one 20-char string per corpus
  * position and shuffles string keys — measured 746 s at a ×100 corpus;
  * this emits 8-byte integer keys with zero per-gram allocations.
  *
  * [[GramFps.P57]] is prime and < 2^57, so the fold never leaves a signed
  * 64-bit long ((P−1)·31 + c < 2^62) and DuckDB replays the IDENTICAL
  * arithmetic in plain BIGINT (`(a*31 + ord(ch)) % P`) — fingerprints are
  * bit-equal cross-engine for ASCII/BMP text, and on the ~1/2^57-rare
  * collision BOTH engines agree on the collided value, so hash gates
  * stay deterministic. Returns an empty array when length(s) < L.
  */
case class GramFps(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(s: Any, l: Any): Any =
    GramFps.fps(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      l.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, l) =>
      s"graft.functions.GramFps.fps($s.toString(), $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_gram_fps"
}

object GramFps {
  /** Largest prime below 2^57: keeps (P−1)·31 + char inside a signed long
    * in BOTH engines (DuckDB BIGINT has no unsigned headroom), while the
    * 2^57 key space keeps expected fingerprint collisions ≪ 1 even at
    * ~10^8 distinct grams.
    */
  val P57 = 144115188075855859L

  /** Called from generated code. Direct O(L) fold per start position —
    * each step keeps h < P < 2^57 so h·31 + c < 2^62 never overflows a
    * long; a rolling-hash variant would need a general 61-bit modular
    * multiply (drop-term · 31^(L−1)) whose overflow gymnastics buy
    * nothing here: the fold is ~L simple long ops per position, and the
    * operator's cost is dominated by the downstream shuffle either way.
    */
  def fps(s: String, l: Int): ArrayData = {
    val n = s.length - l + 1
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    var p = 0
    while (p < n) {
      var h = 0L
      var i = p
      val end = p + l
      while (i < end) { h = (h * 31 + s.charAt(i)) % P57; i += 1 }
      out(p) = h
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Native expression packing a double vector into SQ8 bytes:
  * `graft_sq8_pack(emb, s)[i]` = (byte) floor(emb[i]·s + 0.5) — the
  * FAISS QT_8bit storage form ([[graft.pipeline.Similarity.sq8TopK]]'s
  * quantization as BYTES instead of a double array). With
  * s = 127/max|emb|, every value lands in [−127, 127] by construction,
  * so the cast never truncates; the result is the 1-byte-per-dim
  * representation the persisted SQ8 IVF index stores (8× smaller than
  * the float64 arrays the plain lists hold). Quantized values are exact
  * small integers, so DuckDB replays the identical arithmetic from the
  * float column (`floor(x*s + 0.5)`) — byte packing is storage, not
  * semantics.
  */
case class Sq8Pack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Pack.pack(a.asInstanceOf[ArrayData], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, s) =>
      s"graft.functions.Sq8Pack.pack($a, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sq8_pack"
}

object Sq8Pack {
  /** Called from generated code. */
  def pack(x: ArrayData, s: Double): Array[Byte] = {
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(x.getDouble(i) * s + 0.5).toByte
      i += 1
    }
    out
  }
}

/** Native expression for the integer dot product of two SQ8-packed
  * vectors: `graft_sq8_dot(a, b)` = Σ a[i]·b[i] over signed bytes — the
  * scoring kernel of the SQ8-stored IVF probe. Every product is an exact
  * small integer (≤ 127²·dims ≪ 2^63), so the sum is order-free and
  * bit-equal to DuckDB's replay over the re-quantized float column.
  */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Dot.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Sq8Dot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sq8_dot"
}

object Sq8Dot {
  /** Called from generated code. Dimension is fixed corpus-wide, so a
    * length mismatch can only mean a corrupt row or the wrong column —
    * fail loud (the family's arity/manifest convention) instead of
    * silently truncating to a plausible-looking score (ADVICE r13).
    */
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"graft_sq8_dot: packed-vector length mismatch (${a.length} vs " +
        s"${b.length}) — SQ8 dims are fixed corpus-wide")
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}

object VectorExpressions {

  /** Idempotently register graft's native expressions on a session, making
    * them available to `selectExpr`/`spark.sql` as ordinary functions.
    */
  /** Registry builders receive whatever argument list the SQL call supplied;
    * indexing exprs(n) unchecked turns a wrong-arity call into an opaque
    * IndexOutOfBoundsException (ADVICE r5). Validate and name the signature.
    */
  private[functions] def arity(name: String, sig: String, n: Int)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (exprs.length != n)
      // the signature rides in functionName (the template has no signature
      // slot); docroot must stay a real docs root or the rendered message
      // points at a mangled URL (code review r6)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name` (expected signature: $sig)",
          "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** (name, signature, arity, builder) — the single source of truth for
    * both registration paths: the runtime [[register]] every `Tables.load`
    * call applies, and the [[GraftExtensions]] injection a deployment
    * configures once via `spark.sql.extensions`. The bloom pair surfaces
    * Spark's own codegen'd bloom-filter expressions (shipped for runtime
    * row-level filtering but absent from the public registry) so SQL
    * plans can build explicit semi-join pre-filters — a Bloom sketch has
    * no false negatives, so bloom-prefilter + exact confirm == exact
    * semi join.
    */
  private[functions] val builders: Seq[(String, String, Int,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    ("graft_dot", "graft_dot(vec1 array<float>, vec2 array<float>)", 2,
      es => DotProduct(es(0), es(1))),
    ("graft_polyhash", "graft_polyhash(token string)", 1,
      es => PolyHash(es.head)),
    ("graft_token_hashes", "graft_token_hashes(text string)", 1,
      es => TokenHashes(es.head)),
    ("graft_gram_fps", "graft_gram_fps(text string, len int)", 2,
      es => GramFps(es(0), es(1))),
    ("graft_sq8_pack", "graft_sq8_pack(vec array<double>, scale double)", 2,
      es => Sq8Pack(es(0), es(1))),
    ("graft_sq8_dot", "graft_sq8_dot(a binary, b binary)", 2,
      es => Sq8Dot(es(0), es(1))),
    ("graft_bloom_agg",
      "graft_bloom_agg(key bigint, estimatedNumItems bigint, numBits bigint)", 3,
      es => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1), es(2)).toAggregateExpression()),
    ("graft_might_contain",
      "graft_might_contain(bloomFilter binary, key bigint)", 2,
      es => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es(0), es(1))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, sig, n, build) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, exprs => { arity(name, sig, n)(exprs); build(exprs) },
        "scala_udf")
    }
}

/** The library's `SparkSessionExtensions` hook — how a deployment ships
  * graft's native expressions WITHOUT calling [[VectorExpressions.register]]
  * per session: set `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`) and
  * every session created from that builder/conf resolves the `graft_*`
  * functions through Catalyst's injected-function registry. Same builder
  * table, same arity validation, same expressions.
  */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
      ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VectorExpressions.builders.foreach { case (name, sig, n, build) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[GraftExtensions].getName, name),
        exprs => {
          VectorExpressions.arity(name, sig, n)(exprs); build(exprs)
        }))
    }
}
