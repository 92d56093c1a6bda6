package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QUtil._

/** Time-series / events surface: as-of join (B17), tumbling/sliding/session
  * window aggregation in their deterministic batch forms (B39–B41; the same
  * expressions run under `readStream` — see streaming specs), sessionization
  * via lag (B25).
  *
  * `events.ts` arrives as nanos-long, TIMESTAMP, or TIMESTAMP_NTZ depending
  * on the fixture generation; Tables.events (via TsNorm) exposes a uniform
  * micros TIMESTAMP either way.
  * All outputs avoid raw timestamp columns (epoch micros BIGINT or DATE) so
  * the DuckDB compare is precision-exact.
  *
  * Scale: every aggregation keys on (user_id|window) — at 100 TB these
  * shuffle once on the group key; the as-of join is a single window pass,
  * not a per-row range probe.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // B17 as-of join: for each purchase, the latest signup of the same user
    // at-or-before ts. One shuffle on user_id + one ordered window pass —
    // O(n log n) per key, no range-join explosion.
    "q_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_signup",
          max(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          coalesce(unix_micros(col("last_signup")), lit(-1L)).as("signup_us"))
        .orderBy(col("event_id"))
    },

    // B17 as-of join with tolerance: the signup only matches if it happened
    // within 30 days before the purchase (staleness bound — the common
    // trading/feature-store variant). Same single window pass.
    "q_asof_tolerance" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tolUs = 30L * 86400L * 1000000L
      ev.withColumn("last_signup",
          max(when(col("event_type") === "signup", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("signup_us",
          when(unix_micros(col("ts")) - unix_micros(col("last_signup")) <= tolUs,
            unix_micros(col("last_signup"))).otherwise(lit(-1L)))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          coalesce(col("signup_us"), lit(-1L)).as("signup_us"))
        .orderBy(col("event_id"))
    },

    // B39 tumbling window (batch form of groupBy(window(ts, "1 day"))).
    "q_events_tumbling" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value"), 2).as("total_value"))
        .select(to_date(col("w.start")).as("day"), col("event_type"), col("n"), col("total_value"))
        .orderBy(col("day"), col("event_type"))
    },

    // B40 sliding window: 2-day window sliding by 1 day — each event lands
    // in 2 windows (window() explodes; oracle mirrors with a 2-way union).
    "q_events_sliding" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
        .agg(count(lit(1)).as("n"), moneySum(col("value"), 2).as("total_value"))
        .select(to_date(col("w.start")).as("win_start"), col("n"), col("total_value"))
        .orderBy(col("win_start"))
    },

    // B41 session window: per-user sessions with a 4-hour inactivity gap
    // (batch form of groupBy(session_window(ts, "4 hours"))).
    "q_events_session" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("w"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value"), 2).as("session_value"))
        .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // Funnel: per-user signup → later purchase conversion (the standard
    // product-analytics composition over the as-of machinery).
    "q_events_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val firstSignup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_signup"))
      val converted = ev.filter(col("event_type") === "purchase")
        .join(firstSignup, "user_id")
        .filter(col("ts") >= col("first_signup"))
        .select(col("user_id")).distinct()
      firstSignup.select(count(lit(1)).as("n_signed_up"))
        .crossJoin(converted.select(count(lit(1)).as("n_converted")))
        .withColumn("conversion",
          QUtil.round6Exact(col("n_converted") / col("n_signed_up").cast("double")))
    },

    // Cohort retention: users who signed up on day X and were active again
    // the next day — the other standard product-analytics composition.
    "q_events_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(to_date(min(col("ts"))).as("day0"))
      val activity = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      cohort.join(activity, Seq("user_id"), "left")
        .withColumn("next_day", (datediff(col("day"), col("day0")) === 1).cast("int"))
        .groupBy(col("day0"))
        .agg(countDistinct(col("user_id")).as("n_cohort"),
          countDistinct(when(col("next_day") === 1, col("user_id"))).as("n_day1"))
        .withColumn("retention",
          QUtil.round6Exact(col("n_day1") / col("n_cohort").cast("double")))
        .orderBy(col("day0"))
    },

    // B25 strict-sequence pattern match (MATCH_RECOGNIZE semantics without
    // the syntax): three CONSECUTIVE events of one user forming
    // view → click → purchase, found with two leads over the per-user
    // time order — one window pass, no self-join (the naive 3-way
    // self-join is quadratic in events-per-user; the lead chain is
    // linear and stays in one shuffle).
    "q_events_pattern" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("t1", lead(col("event_type"), 1).over(w))
        .withColumn("t2", lead(col("event_type"), 2).over(w))
        .filter(col("event_type") === "view" && col("t1") === "click" &&
          col("t2") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"),
          min(col("event_id")).as("first_match_event"))
        .orderBy(col("user_id"))
    },

    // B25 sessionization via lag: inter-event gap seconds per user.
    "q_events_gaps" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          coalesce((unix_micros(col("ts")) - col("prev_us")) / lit(1000000L), lit(-1.0))
            .cast("double").as("gap_sec"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // B17-family gap-fill resample: per-user daily spine (sequence explode
    // between the user's first and last active day), LEFT join of the
    // daily aggregate, forward-fill via last(ignoreNulls) — the standard
    // time-series completion. All windows are (user)-partitioned (bounded
    // by a user's span, never global), sums ride integer cents, and the
    // spine explode is |users|×|days| rows — linear, no cross join.
    "q_events_resample" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .filter(col("user_id") < 10)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100)).cast("long").as("cents"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("cents"), ignoreNulls = true).over(w).as("filled_cents"),
          col("cents").isNull.as("is_filled"))
        .orderBy(col("user_id"), col("day"))
    },

    // B68 volume-anomaly detection: Tukey fences (1.5×IQR) over daily
    // per-type event volume, with the quartiles as EXACT discrete order
    // statistics (the q_text_length_clip convention: cumulative counts
    // over the value histogram + integer ceil ranks — no interpolation, no
    // float percentile, engine-exact by construction). The fence compare
    // runs in doubled-integer space (2·cents vs 2·q1 − 3·IQR) so the ×1.5
    // never touches a double. The histogram window is per-type over
    // DISTINCT daily totals (≤ |days| rows — never the event corpus); the
    // fence table is |event_type| rows, broadcast. Output is one audit row
    // per type: quartiles, day/anomaly counts, md5 of the anomalous-day
    // list (md5('') when clean — sf0.01 is clean, sf0.1 plants 3 hits).
    "q_events_anomaly" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100)).cast("long").as("cents"))
      val h = daily.groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = h.withColumn("cum", sum(col("c")).over(w))
      val tot = h.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
      val q = cum.join(tot, "event_type")
        .groupBy(col("event_type"))
        .agg(min(when(col("cum") >= expr("(n + 3) DIV 4"), col("cents"))).as("q1"),
          min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("cents"))).as("q3"))
      daily.join(broadcast(q), "event_type")
        .withColumn("anom",
          col("cents") * 2 < col("q1") * 2 - (col("q3") - col("q1")) * 3 ||
            col("cents") * 2 > col("q3") * 2 + (col("q3") - col("q1")) * 3)
        .groupBy(col("event_type"), col("q1"), col("q3"))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("anom"), 1L).otherwise(0L)).as("n_anomalous"),
          md5(array_join(array_sort(
            collect_list(when(col("anom"), col("day").cast("string")))), ","))
            .as("anom_md5"))
        .orderBy(col("event_type"))
    },

    // TIMESTAMP_NTZ as a first-class engine type: operate on the tz-less
    // parquet column DIRECTLY — no TsNorm, no loader. Wall-clock field
    // extraction (to_date/hour) has identical semantics on Spark's
    // TIMESTAMP_NTZ and DuckDB's naive TIMESTAMP, so no session-timezone
    // coupling exists at all on this path. The match arm only adapts if a
    // future fixture regeneration reverts to an instant encoding (then the
    // UTC session makes the NTZ reinterpretation exact).
    "q_events_ntz" -> { (s, d) =>
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val raw = Tables.load(s, d, "events")
      val ev = raw.schema("ts").dataType match {
        case TimestampNTZType => raw // the native path — current fixture
        case LongType => raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
        case _ => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      }
      ev.groupBy(to_date(col("ts")).as("day"), hour(col("ts")).cast("long").as("hr"))
        .agg(count(lit(1)).as("n"), QUtil.moneySum(col("value"), 2).as("total_value"))
        .orderBy(col("day"), col("hr"))
    })

  val oracle: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |SELECT event_id, user_id, epoch_us(tsu) AS ts_us,
        |  coalesce(epoch_us(last_signup), -1) AS signup_us
        |FROM (
        |  SELECT event_id, user_id, event_type, tsu,
        |    max(CASE WHEN event_type = 'signup' THEN tsu END)
        |      OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
        |  FROM ev) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_asof_tolerance" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS tsu
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |SELECT event_id, user_id, epoch_us(tsu) AS ts_us,
        |  CASE WHEN last_signup IS NOT NULL
        |         AND epoch_us(tsu) - epoch_us(last_signup) <= 2592000000000
        |       THEN epoch_us(last_signup) ELSE -1 END AS signup_us
        |FROM (
        |  SELECT event_id, user_id, event_type, tsu,
        |    max(CASE WHEN event_type = 'signup' THEN tsu END)
        |      OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
        |  FROM ev) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "q_events_tumbling" ->
      s"""SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         |  event_type, count(*) AS n, ${moneySumSql("value", 2)} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    // DuckDB's tz-less TIMESTAMP is exactly Spark's TIMESTAMP_NTZ: both
    // sides extract wall-clock fields with no timezone in the loop.
    "q_events_ntz" ->
      s"""SELECT CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS BIGINT) AS hr,
         |  count(*) AS n, ${moneySumSql("value", 2)} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY day, hr""".stripMargin,

    "q_events_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(round(value * 100)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT event_type, cents, count(*) AS c FROM daily GROUP BY 1, 2),
        |cum AS (SELECT event_type, cents, c,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
        |tot AS (SELECT event_type, sum(c)::BIGINT AS n FROM h GROUP BY event_type),
        |q AS (SELECT cum.event_type,
        |  min(CASE WHEN cum >= (n + 3) // 4 THEN cents END) AS q1,
        |  min(CASE WHEN cum >= (3 * n + 3) // 4 THEN cents END) AS q3
        |  FROM cum JOIN tot ON tot.event_type = cum.event_type
        |  GROUP BY cum.event_type),
        |f AS (SELECT d.event_type, d.day, d.cents, q.q1, q.q3,
        |  (d.cents * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3
        |   OR d.cents * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3) AS anom
        |  FROM daily d JOIN q ON q.event_type = d.event_type)
        |SELECT event_type, q1, q3, count(*) AS n_days,
        |  CAST(count(*) FILTER (WHERE anom) AS BIGINT) AS n_anomalous,
        |  md5(coalesce(string_agg(CASE WHEN anom THEN day::VARCHAR END, ','
        |    ORDER BY day::VARCHAR), '')) AS anom_md5
        |FROM f GROUP BY event_type, q1, q3 ORDER BY event_type""".stripMargin,

    "q_events_sliding" ->
      s"""WITH exploded AS (
         |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS win_start, value FROM events
         |  UNION ALL
         |  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) - 1 AS win_start, value FROM events)
         |SELECT win_start, count(*) AS n, ${moneySumSql("value", 2)} AS total_value
         |FROM exploded GROUP BY win_start ORDER BY win_start""".stripMargin,

    "q_events_session" ->
      s"""WITH marked AS (
         |  SELECT user_id, value, CAST(ts AS TIMESTAMP) AS tsu,
         |    CASE WHEN CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP))
         |        OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 4 HOUR
         |      THEN 1 ELSE 0 END AS new_sess
         |  FROM events),
         |sessions AS (
         |  SELECT user_id, value, tsu,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsu
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM marked)
         |SELECT user_id, epoch_us(min(tsu)) AS session_start_us,
         |  count(*) AS n_events, ${moneySumSql("value", 2)} AS session_value
         |FROM sessions GROUP BY user_id, sess_id
         |ORDER BY user_id, session_start_us""".stripMargin,

    "q_events_funnel" ->
      """WITH fs AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (
        |  SELECT DISTINCT e.user_id
        |  FROM events e JOIN fs ON fs.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= fs.first_signup)
        |SELECT (SELECT count(*) FROM fs) AS n_signed_up,
        |  (SELECT count(*) FROM conv) AS n_converted,
        |  floor((SELECT count(*) FROM conv)
        |    / CAST((SELECT count(*) FROM fs) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS conversion""".stripMargin,

    "q_events_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS DATE) AS day0
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        |  FROM events)
        |SELECT day0,
        |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_cohort,
        |  CAST(count(DISTINCT CASE WHEN a.day = c.day0 + 1 THEN c.user_id END) AS BIGINT) AS n_day1,
        |  floor(count(DISTINCT CASE WHEN a.day = c.day0 + 1 THEN c.user_id END)
        |    / CAST(count(DISTINCT c.user_id) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS retention
        |FROM cohort c LEFT JOIN activity a ON a.user_id = c.user_id
        |GROUP BY day0 ORDER BY day0""".stripMargin,

    "q_events_pattern" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, count(*) AS n_matches,
        |  CAST(min(event_id) AS BIGINT) AS first_match_event
        |FROM seq
        |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_gaps" ->
      """SELECT user_id, event_id,
        |  coalesce((epoch_us(CAST(ts AS TIMESTAMP)) - prev_us) / 1000000, -1.0) AS gap_sec
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events) t
        |WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,

    "q_events_resample" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(sum(round(value * 100)) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |         FROM daily GROUP BY user_id),
        |spine AS (
        |  SELECT user_id, CAST(g AS DATE) AS day
        |  FROM span, unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) t(g))
        |SELECT s.user_id, s.day,
        |  last_value(d.cents IGNORE NULLS) OVER (PARTITION BY s.user_id
        |    ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_cents,
        |  d.cents IS NULL AS is_filled
        |FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
        |ORDER BY s.user_id, s.day""".stripMargin)
}
