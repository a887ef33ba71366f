package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables.t

/** Time-series resampling operators (SURVEY §2.B ts_* rows): the
  * gap-fill / downsample pair every metrics warehouse runs between raw
  * events and dashboards.
  */
object TimeSeries {

  /** Daily purchase-value series per user with calendar gap-fill and
    * LINEAR INTERPOLATION across missing days. Exact arithmetic end to
    * end: daily sums in integer cents, and the interpolation step
    * `prev + sign·(|next−prev|·run) div span` is integer division that
    * truncates toward zero identically in both engines (the sign is
    * factored out so negative-slope segments can't hit a
    * floor-vs-trunc divergence). Scale shape: the calendar is built
    * per user from its own [min,max] span (`sequence` + explode — no
    * driver-side date loop), the join back is on the same
    * (user, day) key, and the prev/next scan is one window per
    * direction over each user's partition. Nothing global: a 100 TB
    * events table gap-fills user-by-user across executors. */
  def tsGapFillInterpolate(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(col("user_id") < 12 && col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum((Num.money(col("value")) * 100).cast("long")).as("cents"))
    val cal = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val back = Window.partitionBy("user_id").orderBy("day")
    val fwd = back.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("cents").isNotNull, col("day"))
    val j = cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pc", last("cents", ignoreNulls = true).over(back))
      .withColumn("pd", last(obsDay, ignoreNulls = true).over(back))
      .withColumn("nc", first("cents", ignoreNulls = true).over(fwd))
      .withColumn("nd", first(obsDay, ignoreNulls = true).over(fwd))
    val interp = col("pc") + signum(col("nc") - col("pc")).cast("long") *
      call_function("div",
        abs(col("nc") - col("pc")) * datediff(col("day"), col("pd")),
        datediff(col("nd"), col("pd")))
    j.select(
        col("user_id"), col("day"),
        col("cents").isNull.as("is_interpolated"),
        (coalesce(col("cents"), interp).cast("double") / 100).as("value_filled"))
      .orderBy("user_id", "day")
  }

  /** Hourly OHLC bars (open/high/low/close + volume) per event type —
    * the classic downsample. Open/close are `min_by`/`max_by` with a
    * (ts, event_id) STRUCT ordering key: exact lexicographic
    * tie-breaking inside ONE hash aggregate — no window sort, no
    * second shuffle; high/low/count ride the same aggregate. All
    * values move as integer cents until the final render. At 100 TB
    * this is a single map-side-combining aggregation on
    * (type, hour) — the minimal possible plan for resampling. */
  def tsResampleOhlc(s: SparkSession, dir: String): DataFrame = {
    def dollars(c: Column): Column = c.cast("double") / 100
    val ord = struct(col("ts"), col("event_id"))
    t(s, dir, "events")
      .filter(col("ts") < lit("2024-01-04").cast("timestamp"))
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("ts"), col("event_id"),
        (Num.money(col("value")) * 100).cast("long").as("cents"))
      .groupBy("event_type", "hour")
      .agg(
        count(lit(1)).as("n_events"),
        dollars(min_by(col("cents"), ord)).as("open"),
        dollars(max("cents")).as("high"),
        dollars(min("cents")).as("low"),
        dollars(max_by(col("cents"), ord)).as("close"))
      .orderBy("event_type", "hour")
  }
}
