package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a pre-built Bloom filter — the
  * "runtime filter" pattern for big joins: build a filter over the
  * (already-reduced) build side's join keys, push it into the probe
  * side's scan, and shuffle only rows that MIGHT match. False positives
  * are removed by the exact join that follows, so results are exact;
  * what the filter buys at 100 TB is that the probe side's shuffle
  * carries ~|matching| + fpp·|fact| rows instead of |fact|.
  *
  * The filter object is deserialized once per executor instance
  * (@transient lazy) from the bytes baked into the expression; the
  * per-row probe is a codegen'd call on that cached object, so the scan
  * filter stays inside whole-stage codegen — no UDF, no per-row
  * deserialization.
  */
case class BloomKeyMightContain(child: Expression, bloomBits: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT key, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBits))

  /** Public so generated code can call through the expression reference
    * (the expression — not the BloomFilter — rides the codegen reference
    * array; only `bloomBits` must be java-serializable). */
  def might(v: Long): Boolean = bf.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = might(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomKeyMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.might($v);")
  }

  // Array[Byte] equals/hashCode are identity-based, which would make two
  // structurally identical probes semantically unequal — canonicalization,
  // semanticEquals, and exchange/subexpression reuse would never unify
  // them. Compare the bits by content instead (perf-only; correctness was
  // never affected).
  override def equals(other: Any): Boolean = other match {
    case b: BloomKeyMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBits, b.bloomBits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBits)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomOps {

  /** Distributed build of a Bloom filter over a BIGINT key column
    * (treeAggregate under the hood — partitions build partial filters,
    * the driver merges; the corpus never moves). Size the expected-item
    * count from table stats at real scale; fpp trades probe-side
    * shuffle volume against filter size. */
  def build(df: DataFrame, keyCol: String, expectedItems: Long, fpp: Double): BloomFilter =
    // empty build side: stat.bloomFilter returns a filter with null bit
    // state whose serialization NPEs — substitute a minimal filter that
    // matches nothing (the correct semantics: no keys ⇒ no candidates)
    if (df.isEmpty) BloomFilter.create(1L, fpp)
    else df.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Register `bloom_might_contain(key)` with the filter's bits captured
    * in the builder closure (the registry path is how a parameterized
    * catalyst Expression reaches the Column API — cf. PlaneSignature). */
  def register(spark: SparkSession, bf: BloomFilter): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bits = bos.toByteArray
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => BloomKeyMightContain(exprs.head, bits), "built-in")
  }
}
