package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership test against a pre-built Bloom filter riding along as a
  * reference object — the probe is a map-only codegen'd projection, no
  * join. False positives only (never negatives), so it PRUNES but never
  * loses rows. */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain needs bigint, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    bf.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

/** Bloom-filter join pruning: the 100 TB semi-join pattern when the
  * build side's KEY SET fits a sketch but a broadcast hash join of the
  * full build rows would not (or when the probe side would otherwise
  * shuffle in full).
  *
  * Two phases: (1) build a Bloom filter over the build keys (one
  * aggregate on the SMALL side); (2) map-only pre-filter of the probe
  * side — at scale this runs inside the probe scan and cuts the rows
  * entering the exchange by ~the selectivity; (3) an exact semi-join
  * over the survivors removes the false positives, so the result is
  * EXACTLY the plain semi-join. This is the same trade Spark's runtime
  * row-level filtering makes, exposed as an explicit operator.
  */
object BloomPrune {

  def bloomOf(build: DataFrame, buildKey: String,
              expectedKeys: Long, fpp: Double): BloomFilter =
    build.stat.bloomFilter(col(buildKey), expectedKeys, fpp)

  def mightContain(keyCol: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(keyCol), bf))

  /** Exact left-semi join with Bloom pre-pruning of the probe side.
    *
    * Integral keys only: a silent cast of e.g. a string key to long
    * would null every probe and return an EMPTY result — fail loudly
    * instead. (Widening int→long is lossless and matches the sketch's
    * long insertion path.) */
  def semiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    require(integral(pt) && integral(bt),
      s"BloomPrune.semiJoin needs integral keys, got $probeKey: ${pt.catalogString}, " +
        s"$buildKey: ${bt.catalogString}")
    val bf = bloomOf(build, buildKey, expectedKeys, fpp)
    probe
      .filter(mightContain(col(probeKey).cast("long"), bf))
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
