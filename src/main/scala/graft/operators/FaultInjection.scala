package graft.operators

/** Test-only crash injection for the remove() families' commit
  * protocol: when `crashAfter` names a step, the operator throws right
  * AFTER completing it, simulating a process death at that boundary.
  * IndexRemoveSpec drives the full crash-replay matrix through these
  * windows (plan committed / fingerprint written / replay recorded /
  * each rewrite done) and asserts every replay converges to the fresh
  * build on survivors — the property ADVICE r11 found violated by the
  * discover-on-replay protocol. Production value is None; the checks
  * cost one driver-side Option compare per boundary. */
private[graft] object FaultInjection {
  @volatile var crashAfter: Option[String] = None

  final class InjectedCrash(step: String)
    extends RuntimeException(s"injected crash after $step")

  def maybeCrash(step: String): Unit =
    if (crashAfter.contains(step)) throw new InjectedCrash(step)

  /** Run `body` with a crash armed at `step`, disarming afterwards. */
  def armed[T](step: String)(body: => T): T = {
    crashAfter = Some(step)
    try body finally crashAfter = None
  }
}
