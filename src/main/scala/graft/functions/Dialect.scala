package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** ClickHouse-dialect function aliases for the ad-hoc SQL path (SURVEY.md
  * §7.3): thin builders delegating to built-in Catalyst expressions, injected
  * into the session FunctionRegistry — zero custom evaluation code, so every
  * alias stays codegen'd and optimizer-visible.
  *
  * Covers the dialect names used across the reference workload
  * (sample_queries.sql, app.py, app_interactive.py): toDate, toHour, toYYYYMM,
  * toStartOfMonth/Minute, toMonday, today, uniq, countIf, sumIf, groupArray,
  * arrayStringConcat, dateDiff (incl. the month-boundary-crossing semantics of
  * ClickHouse dateDiff('month') — SURVEY §2.8/§7.4).
  */
object Dialect {

  private def monthIndex(e: Expression): Expression =
    Add(Multiply(Year(e), Literal(12)), Month(e))

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "toDate" -> (args => Cast(args.head, DateType)),
    "toHour" -> (args => Hour(args.head)),
    "toYYYYMM" -> (args => Add(Multiply(Year(args.head), Literal(100)), Month(args.head))),
    "toStartOfMonth" -> (args => Cast(TruncTimestamp(Literal("month"), args.head), DateType)),
    "toMonday" -> (args => Cast(TruncTimestamp(Literal("week"), args.head), DateType)),
    "toStartOfMinute" -> (args => TruncTimestamp(Literal("minute"), args.head)),
    "today" -> (_ => Cast(CurrentTimestamp(), DateType)),
    "uniq" -> (args => HyperLogLogPlusPlus(args.head).toAggregateExpression()),
    "uniqExact" -> (args => Count(args.head).toAggregateExpression(isDistinct = true)),
    "median" -> (args => Median(args.head).toAggregateExpression()),
    "quantileExact" -> (args =>
      Percentile(args(1), args.head, Literal(1L)).toAggregateExpression()),
    "avgIf" -> (args =>
      Average(If(args(1), args.head, Literal(null, NullType))).toAggregateExpression()),
    "minIf" -> (args =>
      Min(If(args(1), args.head, Literal(null, NullType))).toAggregateExpression()),
    "maxIf" -> (args =>
      Max(If(args(1), args.head, Literal(null, NullType))).toAggregateExpression()),
    // toStartOfInterval(ts, INTERVAL n unit) — floor-bucket by the interval
    // length in seconds (day-time intervals only, matching the workload's
    // 30-minute sessions — sample_queries.sql:431)
    "toStartOfInterval" -> { args =>
      val secs: Long = args(1) match {
        // Spark 4 parses day-time INTERVAL literals as ANSI intervals (micros)
        case Literal(micros: Long, _: DayTimeIntervalType) => micros / 1000000L
        case Literal(ci: org.apache.spark.unsafe.types.CalendarInterval, _) =>
          require(ci.months == 0, "toStartOfInterval: month intervals unsupported")
          ci.days * 86400L + ci.microseconds / 1000000L
        case other =>
          throw new IllegalArgumentException(s"toStartOfInterval expects an INTERVAL literal, got $other")
      }
      require(secs > 0, "toStartOfInterval: zero-length interval")
      // bucket start = ts - pmod(ts, secs): Pmod is non-negative, so this
      // floors for pre-epoch (negative-seconds) timestamps too — ClickHouse
      // floor semantics. The r1 IntegralDivide truncated toward zero and
      // rounded pre-epoch timestamps up into the wrong bucket.
      val tsSecs = Cast(args.head, LongType)
      SecondsToTimestamp(Subtract(tsSecs, Pmod(tsSecs, Literal(secs))))
    },
    // formatReadableSize(bytes) → '1.23 MiB' (sample_queries.sql:504–505).
    // Pure built-in composition (CaseWhen + FormatNumber) so it stays
    // codegen'd; format_number never sees a value ≥ 1024 post-division, so
    // its thousands separator can't appear.
    "formatReadableSize" -> { args =>
      val b = args.head
      val units = Seq("PiB" -> (1L << 50), "TiB" -> (1L << 40), "GiB" -> (1L << 30),
        "MiB" -> (1L << 20), "KiB" -> (1L << 10))
      val branches = units.map { case (unit, scale) =>
        (GreaterThanOrEqual(Cast(b, DoubleType), Literal(scale.toDouble)),
          Concat(Seq(
            FormatNumber(Divide(Cast(b, DoubleType), Literal(scale.toDouble)), Literal(2)),
            Literal(s" $unit"))))
      }
      CaseWhen(branches,
        Concat(Seq(Cast(Cast(b, LongType), StringType), Literal(" B"))))
    },
    "countIf" -> (args =>
      Count(If(args.head, Literal(1), Literal(null, IntegerType))).toAggregateExpression()),
    "sumIf" -> (args =>
      Coalesce(Seq(
        Sum(If(args(1), args.head, Literal(null, NullType))).toAggregateExpression(),
        Literal(0)))),
    "groupArray" -> (args => CollectList(args.head).toAggregateExpression()),
    // argMax(arg, val) / argMin(arg, val) — ClickHouse argument order matches
    // Spark's max_by/min_by directly
    "argMax" -> (args => MaxBy(args.head, args(1)).toAggregateExpression()),
    "argMin" -> (args => MinBy(args.head, args(1)).toAggregateExpression()),
    // arrayJoin(arr) — ClickHouse's in-SELECT explode
    "arrayJoin" -> (args => Explode(args.head)),
    // quantile(level)(x) has function-parameter syntax ClickHouse-side; the
    // SQL path takes quantile(level, x) like quantileExact — interpolated
    // percentile, the deterministic member of the quantile family
    "quantile" -> (args =>
      Percentile(args(1), args.head, Literal(1L)).toAggregateExpression()),
    // State/Merge re-aggregation (AggregatingMergeTree read path,
    // sample_queries.sql:79–84): over graft's MV sinks the persisted partial
    // state IS the per-group sum/count, so merging = summing the partials.
    "sumMerge" -> (args => Sum(args.head).toAggregateExpression()),
    "countMerge" -> (args => Sum(args.head).toAggregateExpression()),
    // ClickHouse arg order is (array, separator); ConcatWs wants sep first.
    "arrayStringConcat" -> (args => ConcatWs(Seq(args(1), args.head))),
    // Registered under a prefixed name: Spark's parser special-cases
    // `dateDiff(unit, a, b)` with unquoted units before function lookup, and
    // overriding the builtin `datediff` would break every DataFrame-side
    // datediff in the session. [[translate]] rewrites the ClickHouse spelling.
    "graft_dateDiff" -> { args =>
      val unit = args.head match {
        case Literal(u, StringType) => String.valueOf(u).toLowerCase
        case other => throw new IllegalArgumentException(s"dateDiff unit must be a literal, got $other")
      }
      val (start, end) = (args(1), args(2))
      unit match {
        case "day" => DateDiff(Cast(end, DateType), Cast(start, DateType))
        // ClickHouse counts month-boundary crossings, not 30-day spans —
        // floor(months_between) would differ on partial months (SURVEY §2.8).
        case "month" => Subtract(monthIndex(end), monthIndex(start))
        case "year" => Subtract(Year(end), Year(start))
        case "week" => Cast(
          Divide(Cast(DateDiff(Cast(TruncTimestamp(Literal("week"), end), DateType),
            Cast(TruncTimestamp(Literal("week"), start), DateType)), DoubleType), Literal(7.0)),
          IntegerType)
        case u => throw new IllegalArgumentException(s"dateDiff: unsupported unit '$u'")
      }
    },
  )

  /** Rewrite ClickHouse spellings that collide with Spark parser builtins:
    * `dateDiff('unit', …)` → `graft_dateDiff('unit', …)`, zero-arg `count()`
    * → `count(*)`.
    *
    * String literals are masked with placeholders before the regex pass and
    * restored after ('' escapes included), so `SELECT 'count()'` survives
    * verbatim — the r2 whole-text regex corrupted quoted spans.
    */
  def translate(sql: String): String = {
    val mark = "\u0001" // a control char never present in SQL text
    val lits = scala.collection.mutable.ArrayBuffer.empty[String]
    val masked = "'(?:[^']|'')*'".r.replaceAllIn(sql, m => {
      lits += m.matched
      s"$mark${lits.size - 1}$mark"
    })
    val rewritten = masked
      // a masked literal follows the paren ⇔ the unit was a quoted string,
      // same condition as the pre-masking pattern `dateDiff(\s*'`
      .replaceAll(s"(?i)\\bdateDiff\\s*\\(\\s*$mark", s"graft_dateDiff($mark")
      .replaceAll("(?i)\\bcount\\s*\\(\\s*\\)", "count(*)")
    s"$mark(\\d+)$mark".r.replaceAllIn(rewritten,
      m => java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))
  }

  /** Idempotently register all aliases on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
