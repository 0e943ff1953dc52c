package graft.functions

/** F3 — injectable clock. The reference computes `datetime.now()`-based
  * cutoffs inside each task (e.g. the permits feed's rolling 4-month
  * window, get_edm_building_permits.py:130-132; rezoning's
  * end_date="now", get_edm_rezoning_data.py:52-66), which makes runs
  * irreproducible. The engine takes the clock as a value: production
  * passes [[Clock.system]], tests and backfills pin a date, and every
  * derived cutoff is a plain string the optimizer can fold into
  * partition/predicate pushdown.
  */
final case class Clock(today: java.time.LocalDate) {
  /** ISO date `n` months back — the permits cutoff shape. */
  def monthsAgo(n: Int): String = today.minusMonths(n.toLong).toString
  /** ISO date of "now" — the rezoning end_date shape. */
  def todayStr: String = today.toString
}

object Clock {
  /** "Today" in UTC — pinned, because the engine's Spark sessions run
    * with `spark.sql.session.timeZone=UTC` and a host-default-TZ date
    * would disagree with every session-computed date for up to a day.
    */
  def system: Clock = Clock(java.time.LocalDate.now(java.time.ZoneOffset.UTC))
  def fixed(isoDate: String): Clock = Clock(java.time.LocalDate.parse(isoDate))
}
