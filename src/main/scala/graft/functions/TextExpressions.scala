package graft.functions

import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text kernels for the corpus operators (same rationale as
  * [[VectorExpressions]]: Spark's higher-order functions run their lambdas
  * interpreted, which made stopword counting and rolling-hash fingerprinting
  * the slowest map-side stages in round 1 — tx01 25.8 s, tx04 5.0 s at sf0.1).
  *
  * Semantics note: `ArrayCountInSet` counts *occurrences* (duplicates
  * included), exactly like `size(filter(words, w -> contains(set, w)))` —
  * `size(array_intersect(...))` would dedup and change results.
  */
object TextExpressions {

  /** Occurrence count of array elements that belong to a static string set. */
  def countInSet(words: Column, items: Seq[String]): Column =
    ColumnBridge.column(ArrayCountInSet(ColumnBridge.expression(words), items))

  /** Polynomial rolling hash over a string's UTF-16 code units:
    * fold(acc = (acc * mult + char) % mod), acc0 = 0.
    */
  def polyHash(text: Column, mult: Long = 31L, mod: Long = 1000000007L): Column =
    ColumnBridge.column(StringPolyHash(ColumnBridge.expression(text), mult, mod))

  /** Elements NOT in the static set, order and duplicates preserved —
    * replaces `filter(words, w -> !array_contains(set, w))` (stopword drop).
    */
  def filterNotInSet(words: Column, items: Seq[String]): Column =
    ColumnBridge.column(ArrayFilterNotInSet(ColumnBridge.expression(words), items))

  /** 3-word shingles straight from the text — replaces the interpreted
    * `transform(sequence(1, greatest(n-2, 1)), i -> concat_ws(' ', slice(words, i, 3)))`
    * used by every shingle-based operator. Identical output, including the
    * degenerate n ≤ 2 case (one shingle = all words joined) and kept empty
    * strings from repeated separators (Spark split semantics, limit -1).
    */
  def wordShingles(text: Column): Column =
    ColumnBridge.column(StringWordShingles(ColumnBridge.expression(text)))

  /** n-word shingles (width-parametric form of [[wordShingles]]). */
  def wordShingles(text: Column, width: Int): Column =
    ColumnBridge.column(StringWordShingles(ColumnBridge.expression(text), width))

  /** Character bigrams — replaces lm01's interpreted
    * `transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))`
    * (the per-char lambda was the entry's whole cost: 3.4 s at sf0.1).
    * One UTF-8 boundary walk per row; n−1 bigrams for n ≥ 2 chars, else
    * empty — which also fixes the HOF form's latent 1-char-doc bug
    * (`sequence(1, 0)` counts DOWN, the bp01 gotcha, emitting two bogus
    * rows where the oracle's `generate_series(1, 0)` emits none).
    */
  def charBigrams(text: Column): Column =
    ColumnBridge.column(StringCharBigrams(ColumnBridge.expression(text)))
}

case class StringCharBigrams(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_char_bigrams requires string, got ${dt.catalogString}")
  }

  /** Public for the generated code path. One pass to mark UTF-8 char starts,
    * then each bigram is a byte-range slice — O(bytes), no per-char substring
    * rescan (substring(i, 2) in a loop is O(n²) in string length).
    */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // char start offsets (ASCII corpus → one per byte; walk handles any UTF-8)
    val starts = new Array[Int](nb + 1)
    var i = 0
    var n = 0
    while (i < nb) {
      starts(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(n) = nb
    val count = math.max(n - 1, 0)
    val out = new Array[Any](count)
    var c = 0
    while (c < count) {
      out(c) = UTF8String.fromBytes(bytes, starts(c), starts(c + 2) - starts(c))
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bigramKernel", this, classOf[StringCharBigrams].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class StringWordShingles(child: Expression, width: Int = 3)
    extends UnaryExpression {

  require(width >= 1, s"shingle width must be >= 1, got $width")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_word_shingles requires string, got ${dt.catalogString}")
  }

  private val space = UTF8String.fromString(" ")

  /** Public for the generated code path: one compiled call per row, all
    * work in UTF8String space (the space separator is a single byte, which
    * never collides with UTF-8 continuation bytes). A doc shorter than
    * `width` words emits ONE truncated shingle (the qf02 oracle's
    * greatest(n − width + 1, 1) edge).
    */
  def compute(s: UTF8String): ArrayData = {
    val words = s.split(space, -1)
    val n = words.length
    val count = math.max(n - (width - 1), 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + width, n)
      out(i) =
        if (end - i == 3) UTF8String.concatWs(space, words(i), words(i + 1), words(i + 2))
        else if (end - i == 2) UTF8String.concatWs(space, words(i), words(i + 1))
        else if (end - i == 1) words(i)
        else UTF8String.concatWs(space, java.util.Arrays.copyOfRange(words, i, end): _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("shingleKernel", this, classOf[StringWordShingles].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ArrayFilterNotInSet(child: Expression, items: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_filter_not_in_set requires array<string>, got ${dt.catalogString}")
  }

  @transient private lazy val set: JHashSet[UTF8String] = {
    val s = new JHashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      // null elements drop, matching the HOF's null-predicate semantics
      if (!arr.isNullAt(i)) {
        val v = arr.getUTF8String(i)
        if (!set.contains(v)) out += v
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("filterNotInSet", set, classOf[JHashSet[UTF8String]].getName)
      val (n, i, m, out, v) = (ctx.freshName("n"), ctx.freshName("i"),
        ctx.freshName("m"), ctx.freshName("out"), ctx.freshName("v"))
      s"""
         |int $n = $a.numElements();
         |java.util.ArrayList $out = new java.util.ArrayList($n);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $v = $a.getUTF8String($i);
         |    if (!$setRef.contains($v)) $out.add($v);
         |  }
         |}
         |Object[] $m = $out.toArray();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($m);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class ArrayCountInSet(child: Expression, items: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_count_in_set requires array<string>, got ${dt.catalogString}")
  }

  // The membership set is built once per task (serialized with the
  // expression, referenced from generated code) — never per row.
  @transient private lazy val set: JHashSet[UTF8String] = {
    val s = new JHashSet[UTF8String](items.size * 2)
    items.foreach(i => s.add(UTF8String.fromString(i)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("countInSet", set, classOf[JHashSet[UTF8String]].getName)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $a.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `(…((0 * m + c₀) % p * m + c₁) % p …)` over the string's UTF-16 code
  * units — bit-identical to the HOF formulation it replaces
  * (`aggregate(transform(split(text, '')), 0L, (acc, c) -> (acc*m + ascii(c)) % p)`)
  * for any BMP text, and to DuckDB's `list_reduce` fold for ASCII text.
  */
case class StringPolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash requires string, got ${dt.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * mult + s.charAt(i).toLong) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $a.toString();
         |int $n = $s.length();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * ${mult}L + (long) $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
