package graft.sources.ssh

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8

/** SSH2 wire primitives (RFC 4251 §5): byte / boolean / uint32 /
  * uint64 / string / mpint / name-list over a byte array. Both the
  * client and the embedded server speak through these two classes —
  * one reader, one writer, no codec framework.
  */
final class SshReader(buf: Array[Byte], private var off: Int = 0) {
  def remaining: Int = buf.length - off
  def u8(): Int = { val v = buf(off) & 0xFF; off += 1; v }
  def bool(): Boolean = u8() != 0
  def u32(): Long = {
    val v = ((buf(off) & 0xFFL) << 24) | ((buf(off + 1) & 0xFFL) << 16) |
      ((buf(off + 2) & 0xFFL) << 8) | (buf(off + 3) & 0xFFL)
    off += 4; v
  }
  def u64(): Long = (u32() << 32) | u32()
  def bytes(n: Int): Array[Byte] = {
    require(n >= 0 && off + n <= buf.length,
      s"ssh packet underrun: want $n, have $remaining")
    val b = java.util.Arrays.copyOfRange(buf, off, off + n); off += n; b
  }
  def string(): Array[Byte] = {
    val n = u32()
    require(n <= remaining, s"ssh string overruns packet: $n > $remaining")
    bytes(n.toInt)
  }
  def text(): String = new String(string(), UTF_8)
  def nameList(): Seq[String] =
    text().split(",").toSeq.filter(_.nonEmpty)
  def mpint(): BigInteger = {
    val b = string()
    if (b.isEmpty) BigInteger.ZERO else new BigInteger(b)
  }
}

final class SshWriter {
  private val out = new java.io.ByteArrayOutputStream(256)
  def u8(v: Int): this.type = { out.write(v & 0xFF); this }
  def bool(b: Boolean): this.type = u8(if (b) 1 else 0)
  def u32(v: Long): this.type = {
    out.write(((v >>> 24) & 0xFF).toInt); out.write(((v >>> 16) & 0xFF).toInt)
    out.write(((v >>> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt); this
  }
  def u64(v: Long): this.type = { u32(v >>> 32); u32(v & 0xFFFFFFFFL) }
  def raw(b: Array[Byte]): this.type = { out.write(b, 0, b.length); this }
  def string(b: Array[Byte]): this.type = { u32(b.length.toLong); raw(b) }
  def text(s: String): this.type = string(s.getBytes(UTF_8))
  def nameList(ns: Seq[String]): this.type = text(ns.mkString(","))
  /** SSH mpint: minimal two's-complement big-endian with a leading
    * zero byte when the high bit would read as a sign.
    */
  def mpint(v: BigInteger): this.type = {
    if (v.signum() == 0) return string(Array.emptyByteArray)
    string(v.toByteArray) // BigInteger.toByteArray IS the ssh encoding
  }
  def bytes: Array[Byte] = out.toByteArray
}

/** SSH2 message numbers (RFC 4253/4252/4254) — only the ones graft
  * speaks.
  */
object SshMsg {
  val Disconnect = 1
  val Ignore = 2
  val Unimplemented = 3
  val Debug = 4
  val ServiceRequest = 5
  val ServiceAccept = 6
  val KexInit = 20
  val NewKeys = 21
  val KexEcdhInit = 30
  val KexEcdhReply = 31
  val UserauthRequest = 50
  val UserauthFailure = 51
  val UserauthSuccess = 52
  val UserauthBanner = 53
  val UserauthPkOk = 60
  val GlobalRequest = 80
  val RequestSuccess = 81
  val RequestFailure = 82
  val ChannelOpen = 90
  val ChannelOpenConfirmation = 91
  val ChannelOpenFailure = 92
  val ChannelWindowAdjust = 93
  val ChannelData = 94
  val ChannelExtendedData = 95
  val ChannelEof = 96
  val ChannelClose = 97
  val ChannelRequest = 98
  val ChannelSuccess = 99
  val ChannelFailure = 100
}
