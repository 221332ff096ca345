package graft.sources.ssh

import java.math.BigInteger
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, Signature}
import java.security.interfaces.{EdECPublicKey, XECPublicKey}
import java.security.spec.{EdECPoint, EdECPublicKeySpec, NamedParameterSpec, XECPublicKeySpec}

import javax.crypto.KeyAgreement

/** The one cipher-suite graft speaks, built entirely from JDK 17
  * primitives (no crypto code of our own — only encodings):
  *
  *   kex      curve25519-sha256   (RFC 8731; JDK XDH)
  *   hostkey  ssh-ed25519         (RFC 8709; JDK EdDSA)
  *   cipher   aes128-ctr          (RFC 4344; JDK AES/CTR)
  *   mac      hmac-sha2-256       (RFC 6668; JDK HmacSHA256)
  *
  * One of each keeps negotiation a membership test and is exactly the
  * modern-OpenSSH default intersection — the embedded server is
  * interop-tested against the real OpenSSH client.
  */
object SshCrypto {

  val KexAlgos = Seq("curve25519-sha256", "curve25519-sha256@libssh.org")
  val HostKeyAlgo = "ssh-ed25519"
  val CipherAlgo = "aes128-ctr"
  val MacAlgo = "hmac-sha2-256"

  // ---- X25519 (kex) ----------------------------------------------

  def x25519KeyPair(): KeyPair =
    KeyPairGenerator.getInstance("X25519").generateKeyPair()

  /** Raw 32-byte little-endian u coordinate (RFC 7748 encoding). */
  def x25519PublicRaw(kp: KeyPair): Array[Byte] = {
    val u = kp.getPublic.asInstanceOf[XECPublicKey].getU
    toLittleEndian(u, 32)
  }

  /** Shared secret: raw scalar-mult output bytes, which SSH then
    * interprets as an unsigned big-endian mpint (the OpenSSH
    * BN_bin2bn convention — RFC 8731 §3).
    */
  def x25519Shared(own: KeyPair, peerRaw: Array[Byte]): BigInteger = {
    require(peerRaw.length == 32, s"bad X25519 key: ${peerRaw.length} bytes")
    val kf = KeyFactory.getInstance("X25519")
    val peer = kf.generatePublic(new XECPublicKeySpec(
      NamedParameterSpec.X25519, new BigInteger(1, peerRaw.reverse)))
    val ka = KeyAgreement.getInstance("X25519")
    ka.init(own.getPrivate)
    ka.doPhase(peer, true)
    new BigInteger(1, ka.generateSecret())
  }

  // ---- Ed25519 (host + user keys) --------------------------------

  def ed25519KeyPair(): KeyPair =
    KeyPairGenerator.getInstance("Ed25519").generateKeyPair()

  /** RFC 8032 point encoding: 32-byte little-endian y with the x
    * parity in the top bit.
    */
  def ed25519PublicRaw(pub: java.security.PublicKey): Array[Byte] = {
    val p = pub.asInstanceOf[EdECPublicKey].getPoint
    val raw = toLittleEndian(p.getY, 32)
    if (p.isXOdd) raw(31) = (raw(31) | 0x80).toByte
    raw
  }

  def ed25519PublicFromRaw(raw: Array[Byte]): java.security.PublicKey = {
    require(raw.length == 32, s"bad Ed25519 key: ${raw.length} bytes")
    val xOdd = (raw(31) & 0x80) != 0
    val yBytes = raw.clone()
    yBytes(31) = (yBytes(31) & 0x7F).toByte
    val y = new BigInteger(1, yBytes.reverse)
    KeyFactory.getInstance("Ed25519").generatePublic(
      new EdECPublicKeySpec(NamedParameterSpec.ED25519,
        new EdECPoint(xOdd, y)))
  }

  /** `ssh-ed25519` public key blob (RFC 8709 §4). */
  def ed25519Blob(pub: java.security.PublicKey): Array[Byte] =
    new SshWriter().text(HostKeyAlgo).string(ed25519PublicRaw(pub)).bytes

  /** Parse an `ssh-ed25519` blob back to a verifying key. */
  def ed25519FromBlob(blob: Array[Byte]): java.security.PublicKey = {
    val r = new SshReader(blob)
    val alg = r.text()
    require(alg == HostKeyAlgo, s"unsupported host key algo $alg")
    ed25519PublicFromRaw(r.string())
  }

  /** `ssh-ed25519` signature blob (RFC 8709 §6). */
  def ed25519Sign(priv: java.security.PrivateKey,
      data: Array[Byte]): Array[Byte] = {
    val s = Signature.getInstance("Ed25519")
    s.initSign(priv); s.update(data)
    new SshWriter().text(HostKeyAlgo).string(s.sign()).bytes
  }

  def ed25519Verify(pub: java.security.PublicKey, data: Array[Byte],
      sigBlob: Array[Byte]): Boolean = {
    val r = new SshReader(sigBlob)
    if (r.text() != HostKeyAlgo) return false
    val sig = r.string()
    val s = Signature.getInstance("Ed25519")
    s.initVerify(pub); s.update(data)
    s.verify(sig)
  }

  // ---- key derivation (RFC 4253 §7.2) ----------------------------

  def kdf(letter: Char, need: Int, k: BigInteger, h: Array[Byte],
      sessionId: Array[Byte]): Array[Byte] = {
    val km = new SshWriter().mpint(k).bytes
    def md = MessageDigest.getInstance("SHA-256")
    var acc = md.digest(km ++ h ++ Array(letter.toByte) ++ sessionId)
    while (acc.length < need)
      acc = acc ++ md.digest(km ++ h ++ acc)
    acc.take(need)
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  private def toLittleEndian(v: BigInteger, n: Int): Array[Byte] = {
    val be = v.toByteArray.dropWhile(_ == 0) match {
      case a if a.isEmpty => Array(0.toByte)
      case a => a
    }
    require(be.length <= n, s"value too large for $n bytes")
    val out = new Array[Byte](n)
    // big-endian `be` reversed into the low positions of `out`
    for (i <- be.indices) out(i) = be(be.length - 1 - i)
    out
  }
}
