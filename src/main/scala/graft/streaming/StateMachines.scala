package graft.streaming

/** Pure state-machine cores for the reference's stateful operators
  * (SURVEY.md §2.8-2.9). Each is a fold `(State, Event) => (State,
  * outputs)` with no Spark dependency, so the semantics unit-test
  * without a streaming harness and the same core drives both the batch
  * `flatMapGroups` form and the streaming `flatMapGroupsWithState`
  * form.
  *
  * Events must arrive in event-time order per key; the wrappers sort
  * each group (batch) / each micro-batch group iterator (streaming)
  * before folding.
  */
object StateMachines {

  // ------------------------------------------------- login-fail (C1-C3)
  /** Reference: LF/app/LoginFailWithCEP.scala:38-60 (consecutive fails
    * within N sec) and LF/app/LoginFail.scala:72-99 (success clears).
    */
  final case class LoginEvent(userId: Long, tsSec: Long, failed: Boolean)
  final case class LoginState(lastFailTs: Option[Long])
  final case class LoginWarning(user_id: Long, first_fail: Long, last_fail: Long, warn_msg: String)

  def loginStep(st: LoginState, e: LoginEvent, maxGapSec: Long): (LoginState, Seq[LoginWarning]) =
    if (!e.failed) (LoginState(None), Nil)
    else {
      val warn = st.lastFailTs.collect {
        case prev if e.tsSec - prev <= maxGapSec =>
          LoginWarning(e.userId, prev, e.tsSec, "repeated failures")
      }
      (LoginState(Some(e.tsSec)), warn.toSeq)
    }

  def loginFold(userId: Long, sorted: Seq[(Long, Boolean)], maxGapSec: Long): Seq[LoginWarning] =
    sorted.foldLeft((LoginState(None), Vector.empty[LoginWarning])) {
      case ((st, acc), (ts, failed)) =>
        val (st2, out) = loginStep(st, LoginEvent(userId, ts, failed), maxGapSec)
        (st2, acc ++ out)
    }._2

  // ---------------------------------------------- order timeout (C4/C5)
  /** Reference: OT/app/OrderTimeoutWithoutCep.scala:63-111 — the full
    * create/pay state machine with its 4 outcome labels.
    */
  final case class OrderEvent(orderId: Long, tsSec: Long, isCreate: Boolean)
  final case class OrderState(createdTs: Option[Long], paidTs: Option[Long])
  final case class OrderOutcome(order_id: Long, status: String)

  def orderStep(st: OrderState, e: OrderEvent): OrderState =
    if (e.isCreate) st.copy(createdTs = st.createdTs.orElse(Some(e.tsSec)))
    else st.copy(paidTs = st.paidTs.orElse(Some(e.tsSec)))

  /** Final outcome once the key's stream is exhausted (or the timeout
    * timer fires in streaming): 4-label contract from C5.
    */
  def orderOutcome(orderId: Long, st: OrderState, timeoutSec: Long): OrderOutcome =
    (st.createdTs, st.paidTs) match {
      case (Some(c), Some(p)) if p >= c && p - c <= timeoutSec => OrderOutcome(orderId, "payed")
      case (Some(c), Some(p)) if p >= c => OrderOutcome(orderId, "payed but timeout")
      case (Some(_), Some(_)) => OrderOutcome(orderId, "pay before create")
      case (Some(_), None) => OrderOutcome(orderId, "timeout")
      case (None, Some(_)) => OrderOutcome(orderId, "pay without create")
      case (None, None) => OrderOutcome(orderId, "empty")
    }

  /** Two-label collapse used by the q10 oracle (shipped/timeout). */
  def orderOutcome2(orderId: Long, st: OrderState, timeoutSec: Long): OrderOutcome = {
    val o = orderOutcome(orderId, st, timeoutSec)
    if (o.status == "payed") OrderOutcome(orderId, "shipped") else OrderOutcome(orderId, "timeout")
  }

  // -------------------------------------------------- two-stream match (J1)
  /** Reference: OT/app/TxMatch.scala:46-94 — symmetric two-stream
    * reconciliation; whichever side arrives first waits in state, the
    * other matches it; unmatched sides flush at timeout.
    */
  final case class TxState(leftSeen: Boolean, rightSeen: Boolean)
  final case class TxOutcome(tag: String)

  def txStep(st: TxState, isLeft: Boolean): TxState =
    if (isLeft) st.copy(leftSeen = true) else st.copy(rightSeen = true)

  def txOutcome(st: TxState): TxOutcome = st match {
    case TxState(true, true) => TxOutcome("matched")
    case TxState(true, false) => TxOutcome("left_only")
    case TxState(false, true) => TxOutcome("right_only")
    case _ => TxOutcome("empty")
  }

  // ------------------------------------------------ funnel progression
  /** Ordered view→click→purchase funnel per user — the batch
    * `funnel_analysis` query's running-conditional-minima expressed as
    * a fold: each stage's timestamp is captured the first time its
    * event arrives AFTER the previous stage is set. Folding events in
    * (ts, event_id) order reproduces the batch window semantics
    * exactly.
    */
  final case class FunnelState(tView: Option[Long], tClick: Option[Long],
      tPurchase: Option[Long])
  final case class FunnelResult(user_id: Long, t_view: Option[Long],
      t_click: Option[Long], t_purchase: Option[Long], stage: String)

  def funnelStep(st: FunnelState, eventType: String, tsSec: Long): FunnelState =
    eventType match {
      case "view" if st.tView.isEmpty => st.copy(tView = Some(tsSec))
      case "click" if st.tView.isDefined && st.tClick.isEmpty =>
        st.copy(tClick = Some(tsSec))
      case "purchase" if st.tClick.isDefined && st.tPurchase.isEmpty =>
        st.copy(tPurchase = Some(tsSec))
      case _ => st
    }

  def funnelResult(userId: Long, st: FunnelState): FunnelResult = {
    val stage =
      if (st.tPurchase.isDefined) "purchase"
      else if (st.tClick.isDefined) "click"
      else if (st.tView.isDefined) "view"
      else "none"
    FunnelResult(userId, st.tView, st.tClick, st.tPurchase, stage)
  }

  // --------------------------------------------------- blacklist (F1)
  /** Reference: MA/app/AdStatisticByGeo.scala:71-112 — per-key click
    * counter; one warning when the threshold is crossed, clicks
    * suppressed while over it.
    */
  final case class ClickState(count: Long, warned: Boolean)
  sealed trait ClickOut
  final case class PassedClick(count: Long) extends ClickOut
  final case class BlacklistWarning(count: Long, msg: String) extends ClickOut

  def clickStep(st: ClickState, threshold: Long): (ClickState, Seq[ClickOut]) = {
    val n = st.count + 1
    if (n >= threshold && !st.warned)
      (ClickState(n, warned = true), Seq(BlacklistWarning(n, s"clicks >= $threshold")))
    else if (st.warned)
      (ClickState(n, warned = true), Nil) // suppressed while blacklisted
    else
      (ClickState(n, warned = false), Seq(PassedClick(n)))
  }
}
