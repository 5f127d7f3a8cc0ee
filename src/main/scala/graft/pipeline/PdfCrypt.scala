package graft.pipeline

import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** ISO 32000-1 §7.6 standard security handler primitives — the
  * password→key derivation and the RC4 / AES-128-CBC object
  * encryption used by encrypted PDFs (what PDFBox's
  * StandardSecurityHandler does before Function.java:95-135 can read
  * an uploaded document). Pure byte-level functions; the dictionary
  * plumbing lives in [[Pdf]].
  *
  * Supported: R2 (RC4-40), R3 (RC4 up to 128), R4 with /AESV2 or /V2
  * crypt filters. R5/R6 (AES-256, PDF 2.0) are out of scope
  * (documented in Pdf's scope note).
  */
private[graft] object PdfCrypt {

  /** §7.6.3.3 Algorithm 2 padding string (32 bytes, fixed). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Password bytes padded/truncated to exactly 32 bytes (Alg 2 step a). */
  def padPassword(pw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(pw.length, 32)
    System.arraycopy(pw, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  // Instance lookups (provider search) cost more than the crypto on
  // the small objects a PDF holds; executors call these per object,
  // so both are reused per thread (reset()/init() make reuse sound).
  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val AesCbc = ThreadLocal.withInitial[Cipher](() =>
    Cipher.getInstance("AES/CBC/NoPadding"))

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = Md5.get()
    d.reset()
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 stream cipher — 20 lines beats depending on a JCE provider
    * alias ("RC4" vs "ARCFOUR") being present. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = new Array[Int](256)
    var i = 0
    while (i < 256) { s(i) = i; i += 1 }
    var j = 0
    i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var k = 0
    i = 0; j = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def int32le(v: Int): Array[Byte] =
    Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)

  /** §7.6.3.4 Algorithm 3: the /O (owner) entry. `n` = key bytes. */
  def ownerValue(ownerPw: Array[Byte], userPw: Array[Byte], n: Int, r: Int): Array[Byte] = {
    var key = md5(padPassword(ownerPw))
    if (r >= 3) for (_ <- 0 until 50) key = md5(key)
    key = key.take(n)
    var o = rc4(key, padPassword(userPw))
    if (r >= 3) for (i <- 1 to 19) o = rc4(key.map(b => (b ^ i).toByte), o)
    o
  }

  /** §7.6.3.3 Algorithm 2: the file encryption key from the USER
    * password (the reader-side path; empty password for the
    * open-without-prompt PDFs a pipeline actually meets). */
  def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int, id0: Array[Byte],
      n: Int, r: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val noMeta =
      if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xff.toByte) else Array.emptyByteArray
    var key = md5(padPassword(userPw), o, int32le(p), id0, noMeta)
    if (r >= 3) for (_ <- 0 until 50) key = md5(key.take(n))
    key.take(n)
  }

  /** §7.6.3.4 Algorithms 4/5: the /U (user) entry. For r >= 3 only the
    * first 16 bytes are significant; the tail is padded with zeros. */
  def userValue(fileKey: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) rc4(fileKey, Pad)
    else {
      var u = rc4(fileKey, md5(Pad, id0))
      for (i <- 1 to 19) u = rc4(fileKey.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16)
    }
  }

  /** True when `candidate` proves the password that produced `fileKey`
    * opens this document (Algorithm 6: recompute U and compare — all
    * 32 bytes for r=2, first 16 for r >= 3). */
  def verifyUser(fileKey: Array[Byte], id0: Array[Byte], r: Int, u: Array[Byte]): Boolean = {
    val expect = userValue(fileKey, id0, r)
    val take = if (r == 2) 32 else 16
    u.length >= take && java.util.Arrays.equals(expect.take(take), u.take(take))
  }

  private val AesSalt = Array('s', 'A', 'l', 'T').map(_.toByte)

  /** §7.6.2 Algorithm 1: per-object key — MD5(fileKey ‖ objnum(3 LE) ‖
    * gen(2 LE) [‖ "sAlT" for AESV2]) truncated to min(n+5, 16). */
  def objectKey(fileKey: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
    val ext = Array(num, num >> 8, num >> 16, gen, gen >> 8).map(_.toByte)
    val salt = if (aes) AesSalt else Array.emptyByteArray
    md5(fileKey, ext, salt).take(math.min(fileKey.length + 5, 16))
  }

  /** AESV2 decrypt: leading 16 bytes are the IV; PKCS#5 padding
    * stripped. Malformed input (short, non-block-aligned, bad pad)
    * yields empty — repair-parser philosophy, one bad object must not
    * sink the document. */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return Array.emptyByteArray
    val c = AesCbc.get()
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(data, 0, 16))
    val plain = c.doFinal(data, 16, data.length - 16)
    val pad = plain.last & 0xff
    if (pad < 1 || pad > 16 || pad > plain.length) Array.emptyByteArray
    else java.util.Arrays.copyOf(plain, plain.length - pad)
  }

  /** AESV2 encrypt with a caller-supplied IV (the writer derives a
    * deterministic one per object so fixtures are reproducible; CBC
    * only needs uniqueness, which per-object derivation gives). */
  def aesEncrypt(key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val pad = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + pad)
    java.util.Arrays.fill(padded, data.length, padded.length, pad.toByte)
    val c = AesCbc.get()
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }
}
