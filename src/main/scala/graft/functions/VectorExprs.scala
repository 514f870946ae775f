package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector kernels. The `zip_with`/`aggregate` higher-order
  * functions are interpreted per element (lambda dispatch + boxing per
  * value), which dominates wall-clock on O(n²) similarity workloads;
  * these expressions run a tight primitive loop inside whole-stage
  * codegen instead (~50× on the embedding-dedup benchmark).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two array<double>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorExprs.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** MinHash signature over an array of 32-bit-folded hashes:
  * sig[i] = min over x of (a_i * x + b_i) mod p — all perms in one pass
  * over the array (vs 64 interpreted `transform`+`array_min` passes). */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<bigint>, got ${t.catalogString}")
  }

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    VectorExprs.minhash(input.asInstanceOf[ArrayData], aArr, bArr, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.minhash($c, $aRef, $bRef, ${prime}L)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Distinct word k-gram shingles of a string, in one native pass
  * (split + window join + first-occurrence dedup) — replaces an
  * interpreted transform(sequence)+concat_ws+array_distinct chain that
  * dominated dedup wall-clock. Fewer than k words → empty array. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorExprs.shingles(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.shingles($c, $k)")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** All character bigrams of a string (WITH duplicates — the caller
  * counts), in one native pass over the code points — replaces an
  * interpreted transform(sequence(1, length−1), i → substring(text,
  * i, 2)) chain whose per-row array materialization + lambda calls
  * made the char-entropy scan mildly super-linear at the sf1 probe.
  * Astral-plane safe: a bigram is two CODE POINTS, matching SQL
  * substr semantics on the test corpora (pure ASCII). Under 2 code
  * points → empty array. */
case class CharBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_bigrams needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorExprs.charBigrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.charBigrams($c)")

  override protected def withNewChildInternal(c: Expression): CharBigrams = copy(child = c)
}

/** Random-hyperplane LSH signature: bit i of the output is set iff
  * dot(v, plane_i) > 0. One pass over the vector per plane, all planes
  * in one tiny generated call — replaces nBits separate literal-array
  * DotProducts + a when/add chain, whose generated code dominated
  * cold-start (Janino compile) on the ANN queries. */
case class LshSignature(child: Expression, planes: Array[Double], nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_signature needs array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorExprs.lshSig(input.asInstanceOf[ArrayData], planes, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.lshSig($c, $ref, $nBits)")
  }

  override protected def withNewChildInternal(c: Expression): LshSignature = copy(child = c)
}

/** Index of the unit-normalized centroid with the largest dot product
  * against the input vector (== nearest by cosine; == nearest by L2 on
  * the unit sphere). The k × dim centroid matrix rides along as a
  * reference object, so cluster assignment is a map-only codegen'd
  * projection — no join, no shuffle. Ties break to the lowest index. */
case class NearestCentroid(child: Expression, cents: Array[Double], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroid needs array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorExprs.nearestCentroid(input.asInstanceOf[ArrayData], cents, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.nearestCentroid($c, $ref, $k)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroid = copy(child = c)
}

/** Indices of the `n` unit-normalized centroids with the largest dot
  * products against the input vector, best first (== n nearest by
  * cosine). Same reference-object layout as NearestCentroid, so
  * multi-probe IVF cell selection is a map-only codegen'd projection —
  * no crossJoin against the centroid frame, no per-id window sort.
  * Ties break to the lowest index; n is clamped to k. */
case class NearestCentroidsN(child: Expression, cents: Array[Double], k: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroids_n needs array<double>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorExprs.nearestCentroidsN(input.asInstanceOf[ArrayData], cents, k, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.nearestCentroidsN($c, $ref, $k, $n)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidsN = copy(child = c)
}

/** Argmax cell for an INTEGER-quantized vector against integer
  * micro-unit centroids: per cell an exact Long dot over the row-major
  * flattening, score = dot.toDouble / norm(cell), first max wins (ties
  * to the lowest cell index). Bit-identical to the interpreted
  * `aggregate(zip_with(...)) / norm` + `array_position(array_max)`
  * formulation it replaces on the portable IVF paths (the integer dot
  * is exact either way and the division is the same IEEE op), but runs
  * as one tight primitive loop inside whole-stage codegen instead of
  * nCells interpreted lambda folds per row. */
case class NearestCellLong(child: Expression, cents: Array[Long], norms: Array[Double])
    extends UnaryExpression {
  require(norms.nonEmpty && cents.length % norms.length == 0,
    s"row-major centroid flattening (${cents.length}) must split evenly over ${norms.length} cells")
  // a zero-norm centroid scores 0/0 = NaN: the Scala argmax's
  // `score > bestScore` never selects NaN while a SQL oracle's
  // ORDER BY score DESC sorts NaN first — a silent parity break.
  // Degenerate centroids must fail loudly at model-construction time.
  require(norms.forall(_ > 0.0),
    s"nearest_cell_long: all ${norms.length} centroid norms must be > 0 " +
      "(a zero-norm centroid makes the argmax NaN-ambiguous vs the SQL oracle)")
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_cell_long needs array<bigint>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorExprs.nearestCellLong(input.asInstanceOf[ArrayData], cents, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cellCents", cents, "long[]")
    val nRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorExprs.nearestCellLong($c, $cRef, $nRef)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCellLong = copy(child = c)
}

/** |A ∩ B| for two SORTED long arrays — one merge pass, no per-row hash
  * set (vs the interpreted ArrayIntersect + size), for set-overlap
  * verification over hashed token sets. Inputs must be sorted; sets
  * (distinct elements) give exact intersection cardinality. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<bigint>, got ${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorExprs.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

object VectorExprs {
  import org.apache.spark.unsafe.types.UTF8String

  def shingles(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + k <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }
  def charBigrams(text: UTF8String): ArrayData = {
    val s = text.toString
    if (s.length < 2) return org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(new Array[AnyRef](0))
    val cps = new java.util.ArrayList[Integer]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps.add(cp)
      i += Character.charCount(cp)
    }
    val n = cps.size
    val out = new Array[AnyRef](math.max(0, n - 1))
    var j = 0
    while (j + 1 < n) {
      val sb = new java.lang.StringBuilder(4)
      sb.appendCodePoint(cps.get(j)).appendCodePoint(cps.get(j + 1))
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def char_bigrams(c: Column): Column =
    ColumnBridge.column(CharBigrams(ColumnBridge.expression(c)))

  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray()
    val y = b.toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  def minhash(h: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val xs = h.toLongArray()
    val out = new Array[Long](as.length)
    var i = 0
    while (i < as.length) {
      var mn = Long.MaxValue
      val a = as(i); val b = bs(i)
      var j = 0
      while (j < xs.length) {
        val v = (a * xs(j) + b) % p
        if (v < mn) mn = v
        j += 1
      }
      out(i) = mn
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** planes is the row-major flattening of nBits × dim hyperplanes. */
  def lshSig(v: ArrayData, planes: Array[Double], nBits: Int): Long = {
    val x = v.toDoubleArray()
    val dim = x.length
    var out = 0L
    var i = 0
    while (i < nBits) {
      val off = i * dim
      var s = 0.0
      var j = 0
      while (j < dim) { s += x(j) * planes(off + j); j += 1 }
      if (s > 0.0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** cents is the row-major flattening of k × dim centroids. */
  def nearestCentroid(v: ArrayData, cents: Array[Double], k: Int): Int = {
    val x = v.toDoubleArray()
    val dim = x.length
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var j = 0
      while (j < dim) { s += x(j) * cents(off + j); j += 1 }
      if (s > bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  /** Top-n centroid indices by dot product, best first; partial
    * selection over the k dots (n is small — probe counts, not k). */
  def nearestCentroidsN(v: ArrayData, cents: Array[Double], k: Int, n: Int): ArrayData = {
    val x = v.toDoubleArray()
    val dim = x.length
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var j = 0
      while (j < dim) { s += x(j) * cents(off + j); j += 1 }
      dots(c) = s
      c += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var slot = 0
    while (slot < m) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && dots(i) > bestS) { bestS = dots(i); best = i }
        i += 1
      }
      taken(best) = true
      out(slot) = best
      slot += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      if (x(i) < y(j)) i += 1
      else if (x(i) > y(j)) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  def nearestCellLong(v: ArrayData, cents: Array[Long], norms: Array[Double]): Int = {
    val x = v.toLongArray()
    val k = norms.length
    val dim = cents.length / k
    val n = math.min(x.length, dim)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dt = 0L
      val off = c * dim
      var j = 0
      while (j < n) { dt += cents(off + j) * x(j); j += 1 }
      val score = dt.toDouble / norms(c)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhash_sig(c: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), as, bs, prime))

  def word_shingles(c: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), k))

  def lsh_signature(c: Column, planes: Array[Double], nBits: Int): Column =
    ColumnBridge.column(LshSignature(ColumnBridge.expression(c), planes, nBits))

  def nearest_centroid(c: Column, cents: Array[Double], k: Int): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(c), cents, k))

  def nearest_centroids_n(c: Column, cents: Array[Double], k: Int, n: Int): Column =
    ColumnBridge.column(NearestCentroidsN(ColumnBridge.expression(c), cents, k, n))

  def nearest_cell_long(c: Column, cents: Array[Long], norms: Array[Double]): Column =
    ColumnBridge.column(NearestCellLong(ColumnBridge.expression(c), cents, norms))

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
