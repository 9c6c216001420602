package graft.util

import scala.util.control.NonFatal

/** Per-row failure containment contract for batch kernels: parse/decode
  * exceptions become error rows (one poisoned document must not kill a
  * 10^12-document job — the reference's failure-record semantics,
  * /root/reference/src/converters/document_converters.py:113-120), but
  * fatal throwables — `OutOfMemoryError`, `StackOverflowError`, any other
  * `VirtualMachineError`, `InterruptedException` — MUST propagate and fail
  * the Spark task: Spark retries task failures on a healthy executor,
  * whereas a quietly-contained OOM would emit a bogus failure row and keep
  * running on a corrupted JVM.
  */
object Containment {
  /** Run `body`; map non-fatal exceptions through `onError`, rethrow fatal
    * ones (scala.util.control.NonFatal's classification). */
  def contained[A](onError: Throwable => A)(body: => A): A =
    try body catch { case NonFatal(e) => onError(e) }

  /** The error-row message for a contained exception: named class plus the
    * parser's `require` message. */
  def describe(e: Throwable): String =
    s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}"
}
