package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-column min/max/null statistics of one snapshot batch, carried
  * in the manifest row (the Iceberg manifest-metrics idea): `min`/
  * `max` are the batch's extrema rendered to a CANONICAL string —
  * numerics (and booleans/dates/timestamps, via an integer encoding)
  * as decimal text, strings verbatim — and are both null when the
  * batch is all-null for the column. `kind` dispatches the prune-time
  * comparison: "num" parses back to BigDecimal, "str" compares with
  * Spark's own binary UTF-8 ordering (what `min`/`max` aggregated
  * under — Java String order differs on surrogate-range chars and
  * would mis-prune).
  */
case class ColStat(dtype: String, kind: String, min: String, max: String,
    hasNull: Boolean)

/** Batch-level stats plumbing for [[Snapshots]]: the encode side
  * (one-job count+min/max aggregation at commit) and the prune side
  * (an INCLUSIVE metrics evaluator over a predicate tree — answers
  * "may any row of this batch match?", never falsely no, so pruning
  * is always sound; anything it can't see — unsupported types,
  * non-literal comparands, exotic operators — degrades to "may
  * match", never to a wrong skip).
  */
object SnapshotStats {

  /** Resolve a user predicate against the store schema WITHOUT any
    * data: analyze `filter(pred)` over a one-null-row local relation
    * (driver-only — nothing executes), take the Filter condition, and
    * constant-fold it so type-coercion casts around literals collapse
    * back to literals (`doc_id >= 112` over a BIGINT column analyzes
    * to `doc_id >= cast(112 as bigint)`; folding gives the evaluator
    * the comparable `Literal(112L)`). This is what makes
    * [[mayMatch]]'s pattern matches fire: Column trees are
    * UNRESOLVED (`UnresolvedFunction(">=")`) until analysis.
    */
  def resolve(spark: org.apache.spark.sql.SparkSession, schema: StructType,
      pred: org.apache.spark.sql.Column): Expression = {
    val dummy = spark.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row.fromSeq(Seq.fill(schema.length)(null))),
      schema)
    val cond = dummy.filter(pred).queryExecution.analyzed
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
      .getOrElse(
        org.apache.spark.sql.graftbridge.ExprBridge.expression(pred))
    cond.transformUp {
      case e if e.foldable && !e.isInstanceOf[Literal] =>
        Literal(e.eval(null), e.dataType)
    }
  }

  /** Canonical orderable encoding of a stats column, or None when the
    * type carries no sound min/max contract here (binary, arrays,
    * structs, maps). The returned column stays in its NATIVE ordered
    * domain (numerics as-is; booleans/dates/timestamps via an integer
    * encoding) — [[computeStats]] aggregates min/max over THIS and
    * renders the aggregate to string only afterwards. Casting to
    * string before aggregating would make the extrema lexicographic
    * (min of {9, 10} would be the string "10"), silently inverting
    * the envelope across digit-count and sign boundaries.
    */
  private def encode(c: String, dt: DataType): Option[(Column, String)] =
    dt match {
      case StringType => Some((col(c), "str"))
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | _: DecimalType =>
        Some((col(c), "num"))
      case BooleanType => Some((col(c).cast("int"), "num"))
      case DateType => Some((unix_date(col(c)), "num"))
      case TimestampType => Some((unix_micros(col(c)), "num"))
      case _ => None
    }

  /** Count + per-column stats of `df` in ONE aggregation job. Columns
    * absent from the schema or of unsupported type simply get no
    * stats entry (they stay unprunable, never wrong).
    */
  def computeStats(df: DataFrame, statsCols: Seq[String])
      : (Long, Map[String, ColStat]) = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val enc = statsCols.distinct.flatMap { c =>
      fields.get(c).flatMap(dt =>
        encode(c, dt).map { case (e, kind) => (c, dt, e, kind) })
    }
    val aggs = count(lit(1)).as("_n") +: enc.zipWithIndex.flatMap {
      case ((c, _, e, _), i) => Seq(
        min(e).cast("string").as(s"_mn$i"),
        max(e).cast("string").as(s"_mx$i"),
        max(when(col(c).isNull, 1).otherwise(0)).as(s"_nl$i"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = enc.zipWithIndex.map { case ((c, dt, _, kind), i) =>
      val base = 1 + i * 3
      c -> ColStat(dt.simpleString, kind,
        if (r.isNullAt(base)) null else r.getString(base),
        if (r.isNullAt(base + 1)) null else r.getString(base + 1),
        !r.isNullAt(base + 2) && r.getInt(base + 2) == 1) // null on 0 rows
    }.toMap
    (r.getLong(0), stats)
  }

  // ---- prune-time evaluation ------------------------------------

  /** Widenings that preserve comparison order against our BigDecimal
    * domain, so a coercion cast wrapped around the ATTRIBUTE side can
    * be seen through (int column vs long literal coerces the column).
    */
  private val IntegralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def orderSafeWiden(from: DataType, to: DataType): Boolean =
    (IntegralTypes.contains(from) &&
      (IntegralTypes.contains(to) || to.isInstanceOf[DecimalType])) ||
      (from == FloatType && to == DoubleType)

  private def nameOf(e: Expression): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.name)
    case a: AttributeReference => Some(a.name)
    case c: Cast if c.child.resolved &&
        orderSafeWiden(c.child.dataType, c.dataType) =>
      nameOf(c.child)
    case _ => None
  }

  private def parseNum(s: String): Option[BigDecimal] =
    try Some(BigDecimal(s)) catch { case _: NumberFormatException => None }

  /** The literal's value in the shared numeric domain (the same
    * integer encodings [[encode]] used: days for dates, micros for
    * timestamps), or None when it isn't numeric-comparable.
    */
  private def litNum(l: Literal): Option[BigDecimal] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      Option(l.value).map(v => BigDecimal(v.toString))
    case FloatType => Option(l.value).map(_.asInstanceOf[Float])
      .filter(f => !f.isNaN && !f.isInfinite).map(f => BigDecimal(f.toDouble))
    case DoubleType => Option(l.value).map(_.asInstanceOf[Double])
      .filter(d => !d.isNaN && !d.isInfinite).map(BigDecimal(_))
    case _: DecimalType =>
      Option(l.value).map(_.asInstanceOf[Decimal].toBigDecimal)
    case DateType => Option(l.value).map(v =>
      BigDecimal(v.asInstanceOf[Int]))
    case TimestampType => Option(l.value).map(v =>
      BigDecimal(v.asInstanceOf[Long]))
    case BooleanType => Option(l.value).map(v =>
      if (v.asInstanceOf[Boolean]) BigDecimal(1) else BigDecimal(0))
    case _ => None
  }

  /** May any row satisfy `<col> <op> <lit>` given the column's batch
    * stats? Null rows never satisfy a comparison (three-valued
    * logic), so an all-null batch (min == null) can't match, and
    * otherwise only the non-null [min, max] envelope matters.
    */
  private def cmpMayMatch(op: String, st: ColStat, l: Literal): Boolean = {
    if (st.min == null) return false
    if (l.value == null) return false // x <op> NULL is never TRUE
    if (st.kind == "num") {
      (parseNum(st.min), parseNum(st.max), litNum(l)) match {
        case (Some(mn), Some(mx), Some(v)) => op match {
          case "=" => mn <= v && v <= mx
          case "<" => mn < v
          case "<=" => mn <= v
          case ">" => mx > v
          case ">=" => mx >= v
          case "!=" => !(mn == v && mx == v)
          case _ => true
        }
        case _ => true // NaN/Infinity extrema or cross-type literal
      }
    } else l.dataType match {
      case StringType if l.value != null =>
        val v = l.value.asInstanceOf[UTF8String]
        val mn = UTF8String.fromString(st.min)
        val mx = UTF8String.fromString(st.max)
        op match {
          case "=" => mn.compareTo(v) <= 0 && v.compareTo(mx) <= 0
          case "<" => mn.compareTo(v) < 0
          case "<=" => mn.compareTo(v) <= 0
          case ">" => mx.compareTo(v) > 0
          case ">=" => mx.compareTo(v) >= 0
          case "!=" => !(mn.compareTo(v) == 0 && mx.compareTo(v) == 0)
          case _ => true
        }
      case _ => true
    }
  }

  /** May any row satisfy `startswith(<col>, <prefix>)`? The Iceberg
    * metrics trick: char-truncation to the prefix length is monotone
    * under binary UTF-8 order (UTF-8 preserves codepoint order), so a
    * row starting with `p` forces `trunc(min,|p|) <= p <=
    * trunc(max,|p|)`; outside that window the batch provably can't
    * match. Non-string stats (a coerced column) degrade to true.
    */
  private def prefixMayMatch(st: ColStat, l: Literal): Boolean = {
    if (st.min == null) return false
    if (l.value == null) return false
    if (st.kind != "str") return true
    val v = l.value.asInstanceOf[UTF8String]
    val k = v.numChars()
    val mn = UTF8String.fromString(st.min)
    val mx = UTF8String.fromString(st.max)
    val mnT = mn.substring(0, math.min(k, mn.numChars()))
    val mxT = mx.substring(0, math.min(k, mx.numChars()))
    mnT.compareTo(v) <= 0 && v.compareTo(mxT) <= 0
  }

  private def leaf(op: String, flipped: String, a: Expression, b: Expression,
      stats: Map[String, ColStat]): Boolean = (a, b) match {
    case (attr, l: Literal) =>
      nameOf(attr).flatMap(statOf(stats, _))
        .forall(st => cmpMayMatch(op, st, l))
    case (l: Literal, attr) =>
      nameOf(attr).flatMap(statOf(stats, _))
        .forall(st => cmpMayMatch(flipped, st, l))
    case _ => true
  }

  private def statOf(stats: Map[String, ColStat],
      name: String): Option[ColStat] =
    stats.get(name).orElse(
      stats.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v })

  /** Inclusive evaluation of `pred` against one batch's stats: false
    * ONLY when provably no row of the batch can satisfy it. Unknown
    * operators, non-literal comparands, and stat-less columns all
    * answer true (probe the batch) — pruning can skip work, never
    * rows.
    */
  def mayMatch(pred: Expression, stats: Map[String, ColStat]): Boolean =
    pred match {
      case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
      case Or(l, r) => mayMatch(l, stats) || mayMatch(r, stats)
      case EqualTo(a, b) => leaf("=", "=", a, b, stats)
      case EqualNullSafe(a, b: Literal) if b.value == null =>
        nameOf(a).flatMap(statOf(stats, _)).forall(_.hasNull)
      case EqualNullSafe(a, b) => leaf("=", "=", a, b, stats)
      case LessThan(a, b) => leaf("<", ">", a, b, stats)
      case LessThanOrEqual(a, b) => leaf("<=", ">=", a, b, stats)
      case GreaterThan(a, b) => leaf(">", "<", a, b, stats)
      case GreaterThanOrEqual(a, b) => leaf(">=", "<=", a, b, stats)
      case In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        nameOf(a).flatMap(statOf(stats, _)) match {
          case Some(st) => list.exists(l =>
            cmpMayMatch("=", st, l.asInstanceOf[Literal]))
          case None => true
        }
      case IsNull(a) =>
        nameOf(a).flatMap(statOf(stats, _)).forall(_.hasNull)
      case IsNotNull(a) =>
        nameOf(a).flatMap(statOf(stats, _)).forall(_.min != null)
      case StartsWith(a, l: Literal) if l.dataType == StringType =>
        nameOf(a).flatMap(statOf(stats, _)).forall(st =>
          prefixMayMatch(st, l))
      case Not(EqualTo(a, b)) => leaf("!=", "!=", a, b, stats)
      case Not(IsNull(a)) =>
        nameOf(a).flatMap(statOf(stats, _)).forall(_.min != null)
      case Not(IsNotNull(a)) =>
        nameOf(a).flatMap(statOf(stats, _)).forall(_.hasNull)
      case _ => true
    }
}
