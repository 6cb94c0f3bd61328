package graft.core

import java.time.temporal.{ChronoUnit, WeekFields}
import java.time.{DayOfWeek, Instant, LocalDate, ZoneOffset, ZonedDateTime}

/** Bar period ADT — Spark re-expression of
  * `/root/reference/src/Runtime/Period.cs:5-33` (units Seconds, Minutes,
  * Hours, Days, Weeks(anchor), Months).
  */
sealed trait Period {
  def label: String

  /** Window length for Spark's `window()` where fixed-length applies.
    * Months/weeks are calendar-based (see [[Periods.floorUtc]]) — the
    * reference floors them client-side too
    * (`/root/reference/src/Runtime/Periods.cs:16-27`).
    */
  def fixedSeconds: Option[Long]
}

object Period {
  final case class Seconds(n: Int) extends Period {
    val label = s"${n}s"; val fixedSeconds = Some(n.toLong)
  }
  final case class Minutes(n: Int) extends Period {
    val label = s"${n}m"; val fixedSeconds = Some(n * 60L)
  }
  final case class Hours(n: Int) extends Period {
    val label = s"${n}h"; val fixedSeconds = Some(n * 3600L)
  }
  final case class Days(n: Int) extends Period {
    val label = s"${n}d"; val fixedSeconds = Some(n * 86400L)
  }
  final case class Weeks(n: Int, anchor: DayOfWeek = DayOfWeek.MONDAY)
      extends Period {
    val label = s"${n}wk"; val fixedSeconds = Some(n * 7 * 86400L)
  }
  final case class Months(n: Int) extends Period {
    val label = s"${n}mo"; val fixedSeconds = None
  }

  /** Parse a timeframe token ("5m", "1h", "1wk", "1mo") — the reference
    * normalizes the same token set
    * (`src/Query/Builders/Common/TimeframeUtils.cs`).
    */
  def parse(tok: String): Period = tok match {
    case s if s.endsWith("mo") => Months(s.dropRight(2).toInt)
    case s if s.endsWith("wk") => Weeks(s.dropRight(2).toInt)
    case s if s.endsWith("s")  => Seconds(s.dropRight(1).toInt)
    case s if s.endsWith("m")  => Minutes(s.dropRight(1).toInt)
    case s if s.endsWith("h")  => Hours(s.dropRight(1).toInt)
    case s if s.endsWith("d")  => Days(s.dropRight(1).toInt)
    case other                 => throw new IllegalArgumentException(s"bad period: $other")
  }
}

/** Pure UTC bucket-floor math — port of the reference's
  * `/root/reference/src/Runtime/Periods.cs:7-38` (epoch-seconds modulo
  * for fixed periods; calendar floor for weeks with anchor and months).
  * Property-tested in `graft.PeriodsSpec`.
  */
object Periods {

  def floorUtc(ts: Instant, p: Period): Instant = p match {
    case Period.Seconds(n) => floorFixed(ts, n.toLong)
    case Period.Minutes(n) => floorFixed(ts, n * 60L)
    case Period.Hours(n)   => floorFixed(ts, n * 3600L)
    case Period.Days(n)    => floorFixed(ts, n * 86400L)
    case Period.Weeks(n, anchor) =>
      // floor to the most recent `anchor` day-of-week at 00:00 UTC, then
      // (for n>1) align to an epoch-anchored multiple of n weeks.
      val d = ts.atZone(ZoneOffset.UTC).toLocalDate
      val back = ((d.getDayOfWeek.getValue - anchor.getValue) % 7 + 7) % 7
      val weekStart = d.minusDays(back.toLong)
      val anchored =
        if (n <= 1) weekStart
        else {
          val epochWeek = ChronoUnit.WEEKS.between(
            LocalDate.of(1970, 1, 5).minusDays(
              ((DayOfWeek.MONDAY.getValue - anchor.getValue) % 7 + 7) % 7
            ), // first `anchor` on/before 1970-01-05 (Mon)
            weekStart
          )
          weekStart.minusWeeks(((epochWeek % n) + n) % n)
        }
      anchored.atStartOfDay(ZoneOffset.UTC).toInstant
    case Period.Months(n) =>
      val z = ts.atZone(ZoneOffset.UTC)
      val monthsSinceEpoch = (z.getYear - 1970) * 12 + (z.getMonthValue - 1)
      val floored = monthsSinceEpoch - (((monthsSinceEpoch % n) + n) % n)
      ZonedDateTime
        .of(1970 + floored / 12, floored % 12 + 1, 1, 0, 0, 0, 0, ZoneOffset.UTC)
        .toInstant
  }

  def add(ts: Instant, p: Period): Instant = p match {
    case Period.Months(n) => ts.atZone(ZoneOffset.UTC).plusMonths(n.toLong).toInstant
    case other            => ts.plusSeconds(other.fixedSeconds.get)
  }

  private def floorFixed(ts: Instant, seconds: Long): Instant = {
    val s = ts.getEpochSecond
    val floored = s - (((s % seconds) + seconds) % seconds)
    Instant.ofEpochSecond(floored)
  }
}
