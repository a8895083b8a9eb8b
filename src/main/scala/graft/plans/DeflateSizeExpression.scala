package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_deflate_size(text[, level])` — DEFLATE-compressed byte size
  * of a string's UTF-8 bytes (java.util.zip.Deflater, raw stream, no
  * zlib header). The standard compression-ratio quality signal next to
  * t17/t18: natural prose lands around ratio 0.3–0.6, degenerate
  * machine-generated repetition far below, high-entropy noise near (or
  * above) 1.0 — both tails are junk for LLM training data (the Gopher
  * and CCNet pipelines both gate on it).
  *
  * Map-side only, no state: each row compresses independently into a
  * counting sink, so the expression streams at any scale. Level is a
  * compile-time literal (default 6, zlib's own default); size — not
  * the compressed bytes — is returned, which is all the ratio needs
  * and keeps row width bounded.
  *
  * Determinism: a fixed Deflater level on a fixed input is
  * deterministic within a JVM, and the SPREAD between repetitive and
  * high-entropy text is enormous (10×+), so quality thresholds are
  * robust to zlib build differences; the spec pins ordering/band
  * properties, not exact byte counts. */
case class DeflateSize(child: Expression, level: Int) extends UnaryExpression {
  require(level >= 0 && level <= 9,
    s"graft_deflate_size level must be in [0, 9], got $level")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_size expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.compute(input.asInstanceOf[UTF8String], level)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DeflateSize.compute($c, $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateSize {
  /** One Deflater per EXECUTOR THREAD, `reset()` between rows
    * (ADVICE r10): allocating + `end()`ing a native zlib stream per
    * row is the dominant fixed cost on short strings at crawl scale.
    * The cache is bounded by the executor thread count (tasks run on
    * a fixed pool), and each entry holds one ~256 KB native window —
    * not idle-thread pinning at any realistic pool size. The deflater
    * is (re)created if the requested level changes (level is a plan
    * literal, so this is once per thread in practice). `nowrap = true`
    * drops the 6-byte zlib framing so tiny strings measure their
    * DEFLATE payload, not the header. */
  private final class Slot(var level: Int) {
    var d = new java.util.zip.Deflater(level, true)
  }
  private val local = new ThreadLocal[Slot]

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, level: Int): Long = {
    var slot = local.get()
    if (slot == null) { slot = new Slot(level); local.set(slot) }
    else if (slot.level != level) {
      slot.d.end(); slot.level = level
      slot.d = new java.util.zip.Deflater(level, true)
    }
    val d = slot.d
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
