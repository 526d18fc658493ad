package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StateMachines
import graft.streaming.StateMachines._

/** The reference's stateful process functions (CEP login-fail, order
  * timeout, two-stream reconciliation) run through the pure
  * state-machine cores in batch mode via `groupByKey.flatMapGroups` —
  * the exact same fold the streaming `flatMapGroupsWithState` form
  * uses, so the DuckDB oracle gates the state-machine semantics, not
  * just a SQL rewrite.
  *
  * Each group's events are sorted by event time inside the group
  * (cheap: per-key slices), which mirrors Flink's per-key event-time
  * order assumption (SURVEY.md §7.3 ordering note).
  */
object StatefulQueries {

  // ----------------------------------------------- login-fail FSM (C1)
  /** The reference's CEP form (LF/app/LoginFailWithCEP.scala:38-47)
    * expressed through the generic [[graft.streaming.CepPattern]]
    * combinator — two strictly-consecutive fails within the gap. Same
    * oracle as the hand-rolled `loginFold`, so the builder's NFA is
    * hash-gated against the FSM semantics it compiles to.
    */
  private val loginFailPattern: graft.streaming.CepPattern[Unit] =
    graft.streaming.CepPatterns.loginFail(3600)

  private def loginFailFsm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").cast("long").as("fail_sec"), col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toSeq.sortBy(r => (r._2, r._3))
        loginFailPattern.foldSorted(sorted.map(r => (r._2, ()))).iterator
          .map(m => LoginWarning(uid, m.tsOf("first"), m.tsOf("second"), "repeated failures"))
      }
      .toDF()
  }

  // ------------------------------------- generic CEP: fail-fail-success
  /** A pattern the reference does NOT ship — two consecutive failures
    * resolved by a success within a day — written purely with the
    * combinators (begin/next/next/within), no new FSM. This is the
    * "user brings a new pattern" path the builder exists for.
    */
  import graft.streaming.CepPatterns.CepEv

  private val failFailSuccessPattern: graft.streaming.CepPattern[CepEv] =
    graft.streaming.CepPatterns.failFailSuccess(86400)

  private def cepFailFailSuccess(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        val sorted = it.toSeq.sortBy(r => (r._2, r._3))
          .map(r => (r._2, CepEv(r._2, r._3, r._4)))
        failFailSuccessPattern.foldSorted(sorted).iterator.map { m =>
          (uid, m.tsOf("f1"), m.tsOf("f2"), m.tsOf("ok"), m("ok").id)
        }
      }
      .toDF("user_id", "fail1_sec", "fail2_sec", "ok_sec", "ok_event_id")
  }

  private val cepFfsOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec, event_id, event_type
      |  FROM events),
      |w AS (
      |  SELECT user_id, sec, event_id, event_type,
      |         lead(sec, 1) OVER win AS sec2, lead(event_type, 1) OVER win AS et2,
      |         lead(sec, 2) OVER win AS sec3, lead(event_type, 2) OVER win AS et3,
      |         lead(event_id, 2) OVER win AS id3
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY sec, event_id))
      |SELECT user_id, sec AS fail1_sec, sec2 AS fail2_sec, sec3 AS ok_sec,
      |       id3 AS ok_event_id
      |FROM w
      |WHERE event_type = 'error' AND et2 = 'error' AND et3 <> 'error'
      |  AND sec3 - sec <= 86400""".stripMargin

  // -------------------------------------------- order-timeout FSM (C5)
  /** create = order placement, pay = FIRST lineitem shipment; the C5
    * state machine keeps only the first pay, so the oracle checks
    * min(l_shipdate) against the 15-day window (deliberately different
    * semantics from q10_order_timeout's "any shipment in window").
    */
  private def orderTimeoutFsm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val creates = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("id"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("ts"),
        lit(true).as("isCreate"))
    val pays = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("id"),
        unix_seconds(col("l_shipdate").cast("timestamp")).as("ts"),
        lit(false).as("isCreate"))
    creates.unionAll(pays)
      .as[(Long, Long, Boolean)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val st = it.toSeq.sortBy(_._2).foldLeft(OrderState(None, None)) {
          case (s, (_, ts, isCreate)) => StateMachines.orderStep(s, OrderEvent(id, ts, isCreate))
        }
        StateMachines.orderOutcome2(id, st, 15L * 86400)
      }
      .toDF()
      .select(col("order_id").as("o_orderkey"), col("status"))
  }

  private val orderFsmOracle =
    """SELECT o.o_orderkey,
      |  CASE WHEN ms IS NOT NULL AND ms >= o_orderdate AND ms <= o_orderdate + INTERVAL 15 DAY
      |       THEN 'shipped' ELSE 'timeout' END AS status
      |FROM orders o LEFT JOIN
      |  (SELECT l_orderkey, min(l_shipdate) AS ms FROM lineitem GROUP BY 1) l
      |  ON o.o_orderkey = l.l_orderkey""".stripMargin

  // ------------------------------------------ two-stream match FSM (J1)
  /** Reconciliation of two keyed streams — (user, day) cells that
    * clicked vs purchased; matched / left_only / right_only tags are
    * the reference's matched + unmatchedPays + unmatchedReceipts
    * side-outputs as one tagged union.
    */
  private def txMatchFsm(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("day_start",
        col("ts").cast("long") - pmod(col("ts").cast("long"), lit(86400L)))
    val left = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("day_start"), lit(true).as("isLeft")).distinct()
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("day_start"), lit(false).as("isLeft")).distinct()
    left.unionAll(right)
      .as[(Long, Long, Boolean)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Boolean)]) =>
        val st = it.foldLeft(TxState(leftSeen = false, rightSeen = false)) {
          case (s, (_, _, isLeft)) => StateMachines.txStep(s, isLeft)
        }
        (key._1, key._2, StateMachines.txOutcome(st).tag)
      }
      .toDF("user_id", "day_start", "tag")
  }

  private val txMatchOracle =
    """WITH l AS (
      |  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)/86400)*86400 AS BIGINT) AS day_start
      |  FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)/86400)*86400 AS BIGINT) AS day_start
      |  FROM events WHERE event_type = 'purchase')
      |SELECT coalesce(l.user_id, r.user_id) AS user_id,
      |       coalesce(l.day_start, r.day_start) AS day_start,
      |       CASE WHEN l.user_id IS NOT NULL AND r.user_id IS NOT NULL THEN 'matched'
      |            WHEN l.user_id IS NOT NULL THEN 'left_only'
      |            ELSE 'right_only' END AS tag
      |FROM l FULL OUTER JOIN r
      |  ON l.user_id = r.user_id AND l.day_start = r.day_start""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q9_login_fail_fsm", Some(EventAnalytics.q9Oracle), loginFailFsm),
    GraftQuery("cep_fail_fail_success", Some(cepFfsOracle), cepFailFailSuccess),
    GraftQuery("q10_order_timeout_fsm", Some(orderFsmOracle), orderTimeoutFsm),
    GraftQuery("tx_match_fsm", Some(txMatchOracle), txMatchFsm),
  )
}
