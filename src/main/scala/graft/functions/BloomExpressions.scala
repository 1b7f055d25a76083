package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Broadcast Bloom-filter primitives — the scale path for benchmark
  * decontamination (dc02) and any "is this key in the small set" prefilter.
  *
  * Why a Bloom filter and not the broadcast shingle join dc01 uses: dc01's
  * broadcast of the full benchmark shingle set is the right plan while that
  * set fits an executor (MBs). A full eval-suite union at pretraining scale
  * is GBs of strings — too large to broadcast as a hash relation, but its
  * Bloom filter is a fixed few MBs regardless. The 100 TB shape is therefore:
  * build the filter ON the benchmark side with a mergeable aggregate (map-side
  * partials, one tiny reduce), broadcast the blob to every corpus partition,
  * drop ~all non-overlapping corpus shingles map-side inside codegen, and
  * only the bloom survivors — bounded by true overlap plus the configured
  * false-positive mass, not by corpus size — reach a (now tiny) exact-confirm
  * join. False positives therefore cost work, never correctness, and the
  * final output stays bit-identical to the exact formulation — which is what
  * keeps dc02 hash-checkable against a bloom-free DuckDB oracle.
  *
  * Both sides run on `xxhash64(shingle)`: a 64-bit-hash collision between two
  * different shingles can only ever ADD a bloom survivor, and the confirm
  * join compares the strings themselves, so collisions are absorbed the same
  * way false positives are.
  *
  * Blob layout: byte 0 = k (probe count), bytes 1.. = the bit array, little-
  * endian within each 64-bit word (bit p lives in byte 1+(p>>3) at mask
  * 1<<(p&7)). Probes are classic double hashing — pos_i = h1 + i·h2 over a
  * power-of-two bit count, h2 an odd finalizer mix of h1.
  */
object BloomExpressions {

  /** Aggregate: build a Bloom filter over a LongType hash column.
    * `numBits` must be a power of two ≥ 64.
    */
  def bloomBuild(hash: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomBuildAgg(ColumnBridge.expression(hash), numBits, numHashes)
        .toAggregateExpression())

  /** Probe: does `hash` hit every probe bit of `bloom` (a blob built by
    * [[bloomBuild]])? Codegen'd; false ⇒ definitely not in the build set.
    */
  def bloomMightContain(bloom: Column, hash: Column): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hash)))

  /** Bits sized for ~20 bits/element (fp ≈ 2e-4 at k=7), clamped to
    * [2^16, 2^27] (8 KB – 16 MB blobs) and rounded up to a power of two.
    */
  def sizeBits(expectedItems: Long): Int = {
    val want = math.min(math.max(20L * math.max(expectedItems, 1L), 1L << 16), 1L << 27)
    java.lang.Long.highestOneBit(want - 1).toInt << 1
  }

  val DefaultNumHashes = 7
}

/** Shared bit arithmetic for build (word layout) and probe (byte layout);
  * the little-endian word serialization in [[BloomBuildAgg.eval]] is what
  * makes the two layouts address the same bits.
  */
object BloomHash {
  /** 64-bit finalizer mix (splitmix64-style avalanche) for the second hash. */
  def mix(z0: Long): Long = {
    var z = z0 ^ (z0 >>> 33)
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def set(words: Array[Long], numBits: Int, k: Int, h: Long): Unit = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val p = ((h + i * h2) & (numBits - 1)).toInt
      words(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  def mightContain(blob: Array[Byte], h: Long): Boolean = {
    val k = blob(0).toInt
    val numBits = (blob.length - 1) << 3
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val p = ((h + i * h2) & (numBits - 1)).toInt
      if ((blob(1 + (p >>> 3)) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Mergeable Bloom-filter build over 64-bit hashes: map-side partial filters
  * OR together in the reduce, so the aggregate moves one fixed-size blob per
  * partition regardless of input row count — the property that lets the
  * benchmark side of a decontamination pass stay a broadcast even when the
  * benchmark text itself could not.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 32, s"numHashes out of range: $numHashes")

  override def prettyName: String = "graft_bloom_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_build requires bigint (a 64-bit hash), got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomHash.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = java.nio.ByteBuffer.allocate(1 + buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(numHashes.toByte)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length >>> 3)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen'd Bloom probe: one static-call bit test inside whole-stage codegen,
  * so the corpus-side prefilter adds no virtual dispatch or row-object
  * allocation to the scan→filter pipeline.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain requires (binary, bigint), got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(blob: Any, h: Any): Any =
    BloomHash.mightContain(blob.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.BloomHash.mightContain($b, $h);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
