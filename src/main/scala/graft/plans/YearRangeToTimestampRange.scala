package graft.plans

import java.time.{LocalDate, ZoneId}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite `year(ts) <cmp> <int literal>` predicates into
  * equivalent raw-timestamp range predicates.
  *
  * Motivation (SURVEY.md §4.1): the reference filters
  * `YEAR(timestamp) >= 2018 AND YEAR(timestamp) <= 2022`
  * (`(Clone) Pinterest Data Cleaning and Queries.py:139-140`). A function
  * over the column defeats parquet row-group min/max statistics and
  * partition pruning; the equivalent `ts >= '2018-01-01' AND
  * ts < '2023-01-01'` pushes to the scan and skips data. Queries written
  * through this engine already use range form; this rule repairs the
  * pattern wherever user SQL still contains it.
  *
  * Semantics: `year(e)` is evaluated in the session time zone, so literal
  * boundaries are built in that zone. NULL behavior is preserved
  * (`year(e)` is NULL iff `e` is NULL; both forms then filter the row).
  * Rewrites: >=, >, <=, <, = over Year(e) with an integer literal on
  * either side, for timestamp and date columns.
  */
object YearRangeToTimestampRange extends Rule[LogicalPlan] {

  /** Midnight of `d` as a literal of the column's own type. TimestampType
    * boundaries are zone-dependent (year()/date casts use the session time
    * zone); TIMESTAMP_NTZ is zoneless, so its midnight is the UTC-offset
    * local datetime. DateType stays a date literal.
    */
  private def boundaryOf(d: LocalDate, dt: DataType): Literal = dt match {
    case TimestampType =>
      val zone = ZoneId.of(SQLConf.get.sessionLocalTimeZone)
      Literal(d.atStartOfDay(zone).toInstant.toEpochMilli * 1000L,
        TimestampType)
    case TimestampNTZType =>
      Literal(d.atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC)
        * 1000000L, TimestampNTZType)
    case _ => Literal(d.toEpochDay.toInt, DateType)
  }

  private def boundary(yearV: Int, c: Expression): Literal =
    boundaryOf(LocalDate.of(yearV, 1, 1), c.dataType)

  private def dayBoundary(epochDay: Int, c: Expression): Literal =
    boundaryOf(LocalDate.ofEpochDay(epochDay.toLong), c.dataType)

  private object YearOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Year(c) if c.dataType == TimestampType ||
        c.dataType == TimestampNTZType || c.dataType == DateType => Some(c)
      case _ => None
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) if v > 0 && v < 9999 => Some(v)
      case _ => None
    }
  }

  /** `cast(ts AS date)` — what Spark's own optimizer turns `year(ts)`
    * comparisons into; still unpushable, the actual repair target.
    */
  private object DateCastOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == DateType &&
        (c.child.dataType == TimestampType ||
         c.child.dataType == TimestampNTZType) => Some(c.child)
      case _ => None
    }
  }

  private object DateLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(days: Int, DateType) => Some(days)
      case _ => None
    }
  }

  private def rewrite(e: Expression): Expression = e.transformUp {
    // cast(ts as date) <cmp> dateLiteral  →  raw ts range
    case GreaterThanOrEqual(DateCastOf(c), DateLit(d)) =>
      GreaterThanOrEqual(c, dayBoundary(d, c))
    case GreaterThan(DateCastOf(c), DateLit(d)) =>
      GreaterThanOrEqual(c, dayBoundary(d + 1, c))
    case LessThanOrEqual(DateCastOf(c), DateLit(d)) =>
      LessThan(c, dayBoundary(d + 1, c))
    case LessThan(DateCastOf(c), DateLit(d)) =>
      LessThan(c, dayBoundary(d, c))
    case EqualTo(DateCastOf(c), DateLit(d)) =>
      And(GreaterThanOrEqual(c, dayBoundary(d, c)),
        LessThan(c, dayBoundary(d + 1, c)))
    case GreaterThanOrEqual(DateLit(d), DateCastOf(c)) =>
      LessThan(c, dayBoundary(d + 1, c))
    case GreaterThan(DateLit(d), DateCastOf(c)) =>
      LessThan(c, dayBoundary(d, c))
    case LessThanOrEqual(DateLit(d), DateCastOf(c)) =>
      GreaterThanOrEqual(c, dayBoundary(d, c))
    case LessThan(DateLit(d), DateCastOf(c)) =>
      GreaterThanOrEqual(c, dayBoundary(d + 1, c))
    case EqualTo(DateLit(d), DateCastOf(c)) =>
      And(GreaterThanOrEqual(c, dayBoundary(d, c)),
        LessThan(c, dayBoundary(d + 1, c)))
    case GreaterThanOrEqual(YearOf(c), IntLit(v)) =>
      GreaterThanOrEqual(c, boundary(v, c))
    case GreaterThan(YearOf(c), IntLit(v)) =>
      GreaterThanOrEqual(c, boundary(v + 1, c))
    case LessThanOrEqual(YearOf(c), IntLit(v)) =>
      LessThan(c, boundary(v + 1, c))
    case LessThan(YearOf(c), IntLit(v)) =>
      LessThan(c, boundary(v, c))
    case EqualTo(YearOf(c), IntLit(v)) =>
      And(GreaterThanOrEqual(c, boundary(v, c)),
        LessThan(c, boundary(v + 1, c)))
    // flipped operand order
    case GreaterThanOrEqual(IntLit(v), YearOf(c)) =>
      LessThan(c, boundary(v + 1, c))
    case GreaterThan(IntLit(v), YearOf(c)) =>
      LessThan(c, boundary(v, c))
    case LessThanOrEqual(IntLit(v), YearOf(c)) =>
      GreaterThanOrEqual(c, boundary(v, c))
    case LessThan(IntLit(v), YearOf(c)) =>
      GreaterThanOrEqual(c, boundary(v + 1, c))
    case EqualTo(IntLit(v), YearOf(c)) =>
      And(GreaterThanOrEqual(c, boundary(v, c)),
        LessThan(c, boundary(v + 1, c)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      // run to a local fixpoint: year(ts) first lowers to
      // cast(ts as date) cmp dateLit (Year itself wraps a date cast), and
      // a second pass lowers that to the raw timestamp range. transformUp
      // never revisits its own replacements, so iterate here.
      var prev = cond
      var cur = rewrite(prev)
      var i = 0
      while (!(cur fastEquals prev) && i < 4) { prev = cur; cur = rewrite(cur); i += 1 }
      if (cur fastEquals cond) f else Filter(cur, child)
  }
}

/** Session extension wiring:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => YearRangeToTimestampRange)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftFunctions.all.foreach(e.injectFunction)
  }
}
