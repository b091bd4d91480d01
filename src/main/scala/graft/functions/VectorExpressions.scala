package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the vector / content-hash kernels
  * that dominate the dedup + similarity operators. The generic
  * higher-order-function route (`aggregate(zip_with(...))`) evaluates
  * an interpreted lambda per element — O(pairs × dims) interpreter
  * dispatch; these run the same math as one tight fused loop (VectorDot
  * is whole-stage-codegen'd), which is the difference between seconds
  * and minutes at 10⁶+ candidate pairs.
  */
object VectorExpressions {

  /** Idempotent per-session registration; queries call this so the
    * functions resolve regardless of which session the driver built.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // register-if-absent: createOrReplace on every query entry logs a
    // spurious "replaced a previously registered function" WARN per run
    def once(name: String, b: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, b, "built-in")
    once("vector_dot", es => VectorDot(es(0), es(1)))
    once("simhash64", es => SimHash64(es.head))
    once("minhash_sig", es => MinHashSig(es(0), es(1)))
    once("word_shingles", es => WordShingles(es(0), es(1)))
    once("winnow64", es => Winnow64(es(0), es(1), es(2)))
    once("vector_argmin_l2", es => VectorArgminL2(es(0), es(1), es(2)))
    once("vector_project", es => VectorProject(es(0), es(1)))
    once("vector_matmul", es => VectorMatmul(es(0), es(1)))
    // Spark's own codegen'd bloom-membership predicate (the one its
    // runtime row-level filters inject), surfaced for explicit use:
    // (serialized-filter binary, long) => boolean. The filter bytes
    // are the org.apache.spark.util.sketch.BloomFilter wire format,
    // which both stat.bloomFilter and BloomFilterAggregate produce.
    once("bloom_might_contain", es =>
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(es(0), es(1)))
    // the matching BUILD side — Spark's own distributed bloom-build
    // aggregate (the one InjectRuntimeFilter plants in its runtime
    // filter subqueries): (xxhash64 bigint, capacity) => binary.
    // Surfacing it in the registry lets a query carry the sketch as a
    // scalar subquery instead of a plan literal (Dedup.bloomSemiJoin);
    // the analyzer wraps the raw AggregateFunction in an
    // AggregateExpression like any registered aggregate.
    once("bloom_filter_agg", es =>
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(es(0), es(1)))
    // count-min point lookup over a plan-carried sketch (see
    // CmsEstimateCount): (serialized CMS binary, bigint key) => bigint
    once("cms_estimate", es => CmsEstimateCount(es(0), es(1)))
  }
}

/** Dense matrix-vector product of an array<float> vector against a
  * row-major FLATTENED k×dim matrix (array<double>): out[r] =
  * Σ_j mat[r·dim+j]·v[j], each row accumulating ascending-j from 0.0.
  * Similarity.pca's projection kernel: the component matrix enters
  * the plan as a broadcast literal (k·dim doubles), so the projection
  * is row-local inside whole-stage codegen — no join, no shuffle, no
  * k·dim interpreted HOF lambda dispatches per row. k derives from
  * the matrix length, which must divide evenly by the vector's dim.
  */
case class VectorMatmul(vec: Expression, mat: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = mat
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** Same memory-reinterpretation guard as VectorProject. */
  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, mat.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_matmul expects (array<float>, array<double>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, m: Any): Any =
    VectorMatmul.eval(v.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m) =>
      s"${ev.value} = graft.functions.VectorMatmul$$.MODULE$$.eval($v, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, mat = newRight)
}

object VectorMatmul {
  def eval(v: ArrayData, m: ArrayData): ArrayData = {
    val dim = v.numElements()
    val k = m.numElements() / dim
    require(m.numElements() == k * dim,
      s"flat matrix ${m.numElements()} not a multiple of dim $dim")
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      var j = 0
      val off = r * dim
      while (j < dim) {
        acc += m.getDouble(off + j) * v.getFloat(j).toDouble
        j += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Seeded ±1 random projection of an array<float> vector to dOut
  * dimensions (Similarity.randomProjection's kernel). Bit-exact with
  * the HOF form `transform(sequence(0, dOut-1), k ->
  * aggregate(zip_with(v, sequence(0, size(v)-1), (x, j) -> x * s(k,j)),
  * 0.0, +))`: per output dim the fold runs ascending-j from 0.0 and
  * s(k,j) = 1 - 2·bit10(h(k)·h(j)), h(m) = (m+1)·2654435761 mod
  * 1048573 + 1 — the same overflow-safe integer arithmetic the DuckDB
  * oracle replays. One fused loop per row instead of dOut·dim
  * interpreted lambda dispatches.
  */
case class VectorProject(vec: Expression, dOutExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = dOutExpr
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** Analysis-time guard: getFloat over an array<double>/array<int>
    * column would silently reinterpret memory — reject anything but
    * (array<float>, foldable int) BEFORE execution.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, dOutExpr.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) if dOutExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "vector_project output dimension must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_project expects (array<float>, int literal), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, d: Any): Any =
    VectorProject.eval(v.asInstanceOf[ArrayData], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, d) =>
      s"${ev.value} = graft.functions.VectorProject$$.MODULE$$.eval($v, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, dOutExpr = newRight)
}

object VectorProject {
  def eval(v: ArrayData, dOut: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Double](dOut)
    var k = 0
    while (k < dOut) {
      val h = ((k + 1) * 2654435761L) % 1048573L + 1L
      var acc = 0.0
      var j = 0
      while (j < dim) {
        val g = ((j + 1) * 2654435761L) % 1048573L + 1L
        val s = 1L - 2L * (((h * g) >> 10) & 1L)
        acc += v.getFloat(j).toDouble * s
        j += 1
      }
      out(k) = acc
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused L2 argmin of one array<double> vector against k flattened
  * centroids: returns array<double> [bestDistSq, bestId]. Bit-exact
  * with `array_min(transform(cents, c -> [aggregate(zip_with(v, c,
  * (a,b) -> (a-b)*(a-b)), 0.0, +), id]))`: per centroid the squared
  * diffs accumulate in ascending-dim order from 0.0, and ties break to
  * the earlier (smaller) id — the arithmetic Similarity.kmeans's
  * DuckDB oracle replays. One JVM call per row instead of
  * k·dim interpreted lambda evaluations.
  */
case class VectorArgminL2(vec: Expression, cents: Expression,
    ids: Expression) extends TernaryExpression {
  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = ids
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** Same memory-reinterpretation guard as VectorProject: all three
    * inputs must really be array<double>.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(vec, cents, ids).map(_.dataType) match {
      case Seq(ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case ts => TypeCheckResult.TypeCheckFailure(
        s"vector_argmin_l2 expects 3x array<double>, got " +
          ts.map(_.simpleString).mkString("(", ", ", ")"))
    }

  override def nullSafeEval(v: Any, c: Any, i: Any): Any =
    VectorArgminL2.eval(v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], i.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c, i) =>
      s"${ev.value} = graft.functions.VectorArgminL2$$.MODULE$$.eval($v, $c, $i);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(vec = f, cents = s, ids = t)
}

object VectorArgminL2 {
  def eval(v: ArrayData, cents: ArrayData, ids: ArrayData): ArrayData = {
    val dim = v.numElements()
    val k = ids.numElements()
    require(cents.numElements() == k * dim,
      s"flat centroids ${cents.numElements()} != $k x $dim")
    var bestDist = Double.MaxValue
    var bestId = Double.MaxValue
    var c = 0
    while (c < k) {
      var acc = 0.0
      var d = 0
      val off = c * dim
      while (d < dim) {
        val diff = v.getDouble(d) - cents.getDouble(off + d)
        acc += diff * diff
        d += 1
      }
      val id = ids.getDouble(c)
      if (acc < bestDist || (acc == bestDist && id < bestId)) {
        bestDist = acc; bestId = id
      }
      c += 1
    }
    new GenericArrayData(Array(bestDist, bestId))
  }
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): polynomial rolling hash over character k-grams of the
  * normalized text, then the minimum hash of each window of w
  * consecutive k-gram hashes (rightmost on ties), deduplicated. Any
  * two documents sharing a sufficiently long substring share a
  * fingerprint — position-robust near-dup detection, O(n) per doc.
  * Returns sorted array<long>.
  */
case class Winnow64(child: Expression, kExpr: Expression, wExpr: Expression)
    extends TernaryExpression {
  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = wExpr
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(tIn: Any, kIn: Any, wIn: Any): Any = {
    val text = tIn.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val k = kIn.asInstanceOf[Int]
    val w = wIn.asInstanceOf[Int]
    new GenericArrayData(Winnow64.fingerprints(text, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = graft.functions.Winnow64$$.MODULE$$.eval($t, $k, $w);")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(child = f, kExpr = s, wExpr = t)
}

object Winnow64 {
  private val B = 1000003L // polynomial base

  /** Reference implementation, also called from codegen. */
  def fingerprints(text: String, k: Int, w: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.empty[Long]
    // rolling k-gram hashes
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val hashes = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    hashes(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * pow) * B + text.charAt(i)
      hashes(i - k + 1) = h
      i += 1
    }
    // ordering is UNSIGNED throughout (both window minima and the
    // returned sort), so min_fp is consistent between short and long
    // documents with the same content
    if (hashes.length <= w) {
      var minIdx = 0
      var j = 1
      while (j < hashes.length) {
        if (java.lang.Long.compareUnsigned(hashes(j), hashes(minIdx)) <= 0)
          minIdx = j
        j += 1
      }
      return Array(hashes(minIdx))
    }
    // winnow: min of each window of w hashes, rightmost on ties
    val selected = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })
    i = 0
    while (i + w <= hashes.length) {
      var minIdx = i
      var j = i + 1
      while (j < i + w) {
        if (java.lang.Long.compareUnsigned(hashes(j), hashes(minIdx)) <= 0)
          minIdx = j
        j += 1
      }
      selected.add(hashes(minIdx))
      i += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def eval(t: UTF8String, k: Int, w: Int): ArrayData =
    new GenericArrayData(
      fingerprints(t.trim().toLowerCase.toString, k, w))
}

/** Distinct k-word shingles of lowercased, whitespace-split text in one
  * pass (split + sliding join + hash-set dedupe). Equivalent to
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(split(lower(trim(text)), '\s+'), i+1, k))))` but ~30× faster:
  * the HOF chain interprets a lambda per shingle (~1 ms/doc), this is
  * one JVM call.
  */
case class WordShingles(child: Expression, kExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = kExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any, kIn: Any): Any = {
    // UTF8String.trim/toLowerCase, NOT java.lang.String's: SQL trim is
    // space-only (Java trim also strips \n\t) and SQL lower is
    // locale-independent (Java toLowerCase is default-locale — tr-TR
    // dotless-ı would diverge from the DuckDB oracle). split(, -1)
    // keeps leading/trailing empty tokens like Spark's split().
    val text = input.asInstanceOf[UTF8String].trim().toLowerCase.toString
    val k = kIn.asInstanceOf[Int]
    val toks = text.split("\\s+", -1)
    if (toks.length < k) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      val sb = new java.lang.StringBuilder()
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var n = 0
      while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.eval($t, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, kExpr = newRight)
}

object WordShingles {
  /** Codegen entry point (static call from generated Java). */
  def eval(t: UTF8String, k: Int): ArrayData =
    WordShingles(null, null).nullSafeEval(t, k).asInstanceOf[ArrayData]
}

/** Fused dot product over two array<float> columns, accumulated in
  * double. Codegen: one loop, no per-element lambda dispatch.
  *
  * Null semantics match the HOF form `aggregate(zip_with(a, b, *), 0d,
  * +)` exactly (required by the VectorDotRewrite rule): mismatched
  * lengths or a null element yield NULL, not a truncated partial sum
  * (zip_with pads with null and null poisons the fold).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Same memory-reinterpretation guard as VectorProject. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects (array<float>, array<float>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of an array<string> token column: per-token XXH64,
  * bit-vote, sign-pack. One call per row (vs 64 × tokens interpreted
  * lambda evaluations).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val s = arr.getUTF8String(t)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64$$.MODULE$$.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Codegen entry point (static call from generated Java). */
  def hash(arr: ArrayData): Long =
    SimHash64(null).nullSafeEval(arr).asInstanceOf[Long]
}

/** MinHash signature of an array<string> shingle column: H seeded
  * XXH64 mins in one pass over the shingles. Returns array<long>
  * of length H.
  */
case class MinHashSig(child: Expression, numHashes: Expression)
    extends BinaryExpression {
  override def left: Expression = child
  override def right: Expression = numHashes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def foldable: Boolean = false

  override def nullSafeEval(input: Any, hIn: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val h = hIn.asInstanceOf[Int]
    val sig = Array.fill[Long](h)(Long.MaxValue)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val s = arr.getUTF8String(t)
      if (s != null) {
        var i = 0
        while (i < h) {
          val hv = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes, i.toLong)
          if (hv < sig(i)) sig(i) = hv
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, h) =>
      s"${ev.value} = graft.functions.MinHashSig$$.MODULE$$.sig($a, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, numHashes = newRight)
}

object MinHashSig {
  /** Codegen entry point (static call from generated Java). */
  def sig(arr: ArrayData, h: Int): ArrayData =
    MinHashSig(null, null).nullSafeEval(arr, h).asInstanceOf[ArrayData]
}

/** Count-min point lookup over a FOLDABLE serialized sketch: the
  * probe-evaluation complement of `bloom_might_contain`, and built the
  * same way — the sketch rides the plan as a literal / scalar-subquery
  * value (kilobytes: width ⌈e/ε⌉ × depth ⌈ln(1/δ)⌉ longs), is
  * deserialized ONCE per expression instance on first eval, and the
  * per-row lookup is a depth-row counter min executed inside
  * whole-stage codegen on the executors. This is what keeps a CMS
  * verify pass distributed: N probe rows each evaluate locally against
  * the broadcast sketch bytes instead of being collected to a
  * driver-side loop (the round-8 weak flag on `agg_cms_pointq`).
  *
  * The foldable requirement is load-bearing: a per-row sketch column
  * would deserialize per ROW — reject it at analysis, like Spark's own
  * BloomFilterMightContain does for its filter side.
  */
case class CmsEstimateCount(sketchBytes: Expression, key: Expression)
    extends BinaryExpression {
  override def left: Expression = sketchBytes
  override def right: Expression = key
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (sketchBytes.dataType, key.dataType) match {
      case (BinaryType, LongType) if sketchBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "cms_estimate expects a FOLDABLE sketch (literal or scalar " +
          "subquery) — a per-row sketch would deserialize per row")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  // one deserialization per expression instance (per task after
  // serialization to executors), never per row
  @transient private lazy val sketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      sketchBytes.eval().asInstanceOf[Array[Byte]])

  /** Shared eval/codegen entry point. */
  def estimate(k: Long): Long = sketch.estimateCount(k)

  override def nullSafeEval(s: Any, k: Any): Any =
    estimate(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS instance so generated code shares the lazily
    // deserialized sketch with the interpreted path
    val ref = ctx.addReferenceObj("cmsExpr", this,
      classOf[CmsEstimateCount].getName)
    nullSafeCodeGen(ctx, ev, (_, k) => s"${ev.value} = $ref.estimate($k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketchBytes = newLeft, key = newRight)
}
