package graft

import graft.core.{Period, Periods}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import java.time.{DayOfWeek, Instant, ZoneOffset}

/** Property tests for the `Periods.FloorUtc` port
  * (`/root/reference/src/Runtime/Periods.cs:7-38`): flooring is
  * idempotent, lower-bounding, within one period, and aligned.
  */
object PeriodsSpec extends Properties("Periods") {

  private val tsGen: Gen[Instant] =
    Gen.choose(0L, 4102444800L).map(Instant.ofEpochSecond) // 1970..2100

  private val fixedPeriodGen: Gen[Period] = Gen.oneOf(
    Gen.choose(1, 60).map(Period.Seconds),
    Gen.choose(1, 60).map(Period.Minutes),
    Gen.choose(1, 24).map(Period.Hours),
    Gen.choose(1, 7).map(Period.Days)
  )

  property("fixedFloor") = Prop.forAll(tsGen, fixedPeriodGen) { (ts, p) =>
    val f = Periods.floorUtc(ts, p)
    val sec = p.fixedSeconds.get
    (Periods.floorUtc(f, p) == f) :| "idempotent" &&
    (!f.isAfter(ts)) :| "lower bound" &&
    (ts.getEpochSecond - f.getEpochSecond < sec) :| "within period" &&
    (f.getEpochSecond % sec == 0) :| "aligned"
  }

  property("weekFloorOnAnchor") =
    Prop.forAll(tsGen, Gen.oneOf(DayOfWeek.values.toSeq)) { (ts, anchor) =>
      val f = Periods.floorUtc(ts, Period.Weeks(1, anchor))
      val z = f.atZone(ZoneOffset.UTC)
      (z.getDayOfWeek == anchor) :| "anchor day" &&
      (z.getHour == 0 && z.getMinute == 0 && z.getSecond == 0) :| "midnight" &&
      (!f.isAfter(ts)) :| "lower bound" &&
      (ts.getEpochSecond - f.getEpochSecond < 7 * 86400) :| "within week"
    }

  property("monthFloor") = Prop.forAll(tsGen, Gen.choose(1, 6)) { (ts, n) =>
    val f = Periods.floorUtc(ts, Period.Months(n))
    val z = f.atZone(ZoneOffset.UTC)
    (z.getDayOfMonth == 1 && z.getHour == 0) :| "first of month" &&
    (!f.isAfter(ts)) :| "lower bound" &&
    (((z.getYear - 1970) * 12 + z.getMonthValue - 1) % n == 0) :| "epoch aligned"
  }

  property("addPastTs") = Prop.forAll(tsGen, fixedPeriodGen) { (ts, p) =>
    Periods.add(Periods.floorUtc(ts, p), p).isAfter(ts)
  }

  property("parseTokens") = Prop {
    Period.parse("5m") == Period.Minutes(5) &&
    Period.parse("1h") == Period.Hours(1) &&
    Period.parse("1wk") == Period.Weeks(1) &&
    Period.parse("1mo") == Period.Months(1) &&
    Period.parse("10s") == Period.Seconds(10) &&
    Period.parse("2d") == Period.Days(2)
  }
}
