package graft

/** Shared cause-chain assertion for refusal tests — Spark wraps
  * procedure/require failures in several layers (SparkException,
  * analysis wrappers), so the needle is matched against EVERY message
  * down the cause chain. One definition; the evolution/defaults
  * suites all import it. */
object TestErrors {
  def errChain(t: Throwable): Seq[Throwable] =
    Option(t).toSeq.flatMap(x => x +: errChain(x.getCause))

  def assertRefused(e: Throwable, needle: String): Unit =
    assert(errChain(e).exists(t => Option(t.getMessage)
      .exists(_.contains(needle))), s"expected '$needle' in: $e")

  /** Every non-null message down the cause chain. */
  def messages(t: Throwable): Seq[String] =
    errChain(t).flatMap(x => Option(x.getMessage))
}
