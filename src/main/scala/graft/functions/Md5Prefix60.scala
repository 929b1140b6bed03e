package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest helper for [[Md5Prefix60]]: one thread-local MessageDigest per
  * executor thread, reset per value — no per-row allocation beyond the
  * 16-byte digest. Top-level object so the generated Java can call the
  * static forwarder directly. */
object Md5Hash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The first 60 bits of md5(utf8 bytes) as a non-negative long —
    * bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)`: 15 hex
    * chars = the top 7.5 digest bytes = (first 8 bytes big-endian) >>> 4. */
  def prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    v >>> 4
  }
}

/** Native codegen'd 60-bit md5 prefix of a string — the engine's portable
  * hash (see [[Checksums.md5PrefixLong]]). Value is bit-identical to the
  * composable `conv(substring(md5(x), 1, 15), 16, 10)` form (and to the
  * DuckDB oracle rebuild `CAST(('0x'||substr(md5(x),1,15)) AS BIGINT)`),
  * but skips the hex-string render and the base-16 string parse — the
  * digest's leading bytes become the long directly. On token/shingle-
  * exploded dedup pipelines this hash runs once per token, so the
  * string round-trip was the hot path.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.prefix60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
