package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/** ECMA-376 document encryption, "agile" variant ([MS-OFFCRYPTO] §2.3.4.10
  * — a public specification): an encrypted `.xlsx` is an [[OleCfb]]
  * container whose `EncryptionInfo` stream carries an XML descriptor
  * (salts, SHA-512 spin count, AES key sizes, password-encrypted key
  * blobs) and whose `EncryptedPackage` stream is the real ZIP encrypted
  * with AES-256-CBC in 4096-byte segments.
  *
  * Key schedule (password key encryptor):
  *   h = SHA512(salt ‖ UTF-16LE(password));
  *   h = SHA512(LE32(i) ‖ h) for i in [0, spinCount);
  *   key(blockKey) = SHA512(h ‖ blockKey) truncated/0x36-padded to keyBits.
  * Three fixed block keys decrypt the password verifier pair and the
  * intermediate package key; package segment i then decrypts with
  * IV = SHA512(keyDataSalt ‖ LE32(i)) truncated to the block size.
  *
  * Both directions are implemented with JDK crypto only — the encryptor
  * exists so tests can mint real fixtures and so the writer path has
  * parity with what POI-based stacks produce. */
object OfficeCrypto {

  private val BlockKeyVerifierInput =
    Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b, 0x9e, 0x79).map(_.toByte)
  private val BlockKeyVerifierValue =
    Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61, 0x34, 0x4e).map(_.toByte)
  private val BlockKeyKeyValue =
    Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0, 0xd6).map(_.toByte)

  private val SegmentSize = 4096

  /** True iff `bytes` is an encrypted Office container (CFB magic). */
  def isEncrypted(bytes: Array[Byte]): Boolean = OleCfb.isCfb(bytes)

  private def sha512(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-512")
    parts.foreach(md.update)
    md.digest()
  }

  private def le32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()

  /** Iterated password hash (the expensive spin). */
  private def passwordHash(salt: Array[Byte], password: String, spinCount: Int): Array[Byte] = {
    var h = sha512(salt, password.getBytes(StandardCharsets.UTF_16LE))
    var i = 0
    while (i < spinCount) { h = sha512(le32(i), h); i += 1 }
    h
  }

  /** Derive an AES key for one block-key constant: truncate the hash to
    * keyBytes or pad with 0x36 (the spec's padding byte). */
  private def deriveKey(pwHash: Array[Byte], blockKey: Array[Byte], keyBytes: Int): Array[Byte] = {
    val h = sha512(pwHash, blockKey)
    if (h.length >= keyBytes) h.take(keyBytes)
    else h ++ Array.fill(keyBytes - h.length)(0x36.toByte)
  }

  private def fit(bytes: Array[Byte], n: Int): Array[Byte] =
    if (bytes.length >= n) bytes.take(n)
    else bytes ++ Array.fill(n - bytes.length)(0x36.toByte)

  private def aes(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def pad16(b: Array[Byte]): Array[Byte] =
    if (b.length % 16 == 0) b else b ++ new Array[Byte]((16 - b.length % 16) % 16)

  /** The parsed agile descriptor (keyData + password keyEncryptor). */
  private final case class Descriptor(
      keyDataSalt: Array[Byte], keyDataBlockSize: Int, keyDataKeyBits: Int,
      spinCount: Int, pwSalt: Array[Byte], pwBlockSize: Int, pwKeyBits: Int,
      hashSize: Int,
      encryptedVerifierHashInput: Array[Byte],
      encryptedVerifierHashValue: Array[Byte],
      encryptedKeyValue: Array[Byte])

  private def parseDescriptor(xml: String): Descriptor = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    var keyData: Map[String, String] = Map.empty
    var encKey: Map[String, String] = Map.empty
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) {
          val attrs = (0 until r.getAttributeCount)
            .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)).toMap
          r.getLocalName match {
            case "keyData" => keyData = attrs
            case "encryptedKey" => encKey = attrs
            case _ => ()
          }
        }
      }
    } finally r.close()
    require(keyData.nonEmpty && encKey.nonEmpty, "not an agile EncryptionInfo descriptor")
    require(keyData("cipherAlgorithm") == "AES" && keyData("hashAlgorithm") == "SHA512" &&
      keyData("cipherChaining") == "ChainingModeCBC",
      s"unsupported agile suite: $keyData (AES/SHA512/CBC only)")
    val b64 = Base64.getDecoder
    Descriptor(
      keyDataSalt = b64.decode(keyData("saltValue")),
      keyDataBlockSize = keyData("blockSize").toInt,
      keyDataKeyBits = keyData("keyBits").toInt,
      spinCount = encKey("spinCount").toInt,
      pwSalt = b64.decode(encKey("saltValue")),
      pwBlockSize = encKey("blockSize").toInt,
      pwKeyBits = encKey("keyBits").toInt,
      hashSize = encKey("hashSize").toInt,
      encryptedVerifierHashInput = b64.decode(encKey("encryptedVerifierHashInput")),
      encryptedVerifierHashValue = b64.decode(encKey("encryptedVerifierHashValue")),
      encryptedKeyValue = b64.decode(encKey("encryptedKeyValue")))
  }

  /** Decrypt an encrypted workbook container to the plain ZIP bytes.
    * Throws IllegalArgumentException("wrong password ...") on verifier
    * mismatch — the distinction a user needs from a corrupt file. */
  def decrypt(container: Array[Byte], password: String): Array[Byte] = {
    val streams = OleCfb.readStreams(container)
    val info = streams.getOrElse("EncryptionInfo", throw new IllegalArgumentException(
      s"no EncryptionInfo stream (streams: ${streams.keys.mkString(", ")})"))
    val pkg = streams.getOrElse("EncryptedPackage", throw new IllegalArgumentException(
      "no EncryptedPackage stream"))
    val infoBuf = ByteBuffer.wrap(info).order(ByteOrder.LITTLE_ENDIAN)
    val (vMajor, vMinor) = (infoBuf.getShort(0), infoBuf.getShort(2))
    require(vMajor == 4 && vMinor == 4,
      s"unsupported EncryptionInfo version $vMajor.$vMinor (agile = 4.4; " +
        "legacy standard/extensible encryption not implemented)")
    val xml = new String(info, 8, info.length - 8, StandardCharsets.UTF_8).trim
    val d = parseDescriptor(xml)

    val pwKeyBytes = d.pwKeyBits / 8
    val pwHash = passwordHash(d.pwSalt, password, d.spinCount)
    val iv = fit(d.pwSalt, d.pwBlockSize)
    // password check: SHA512(verifierInput) must equal verifierValue
    val verifierInput = aes(Cipher.DECRYPT_MODE,
      deriveKey(pwHash, BlockKeyVerifierInput, pwKeyBytes), iv,
      d.encryptedVerifierHashInput).take(d.pwSalt.length)
    val verifierValue = aes(Cipher.DECRYPT_MODE,
      deriveKey(pwHash, BlockKeyVerifierValue, pwKeyBytes), iv,
      d.encryptedVerifierHashValue).take(d.hashSize)
    if (!MessageDigest.isEqual(sha512(verifierInput), verifierValue))
      throw new IllegalArgumentException("wrong password for encrypted workbook")
    val packageKey = aes(Cipher.DECRYPT_MODE,
      deriveKey(pwHash, BlockKeyKeyValue, pwKeyBytes), iv,
      d.encryptedKeyValue).take(d.keyDataKeyBits / 8)

    val plainLen = ByteBuffer.wrap(pkg, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    // Int segment arithmetic below: refuse (crafted) >2GiB declarations
    // with a diagnosable error instead of a NegativeArraySizeException
    require(plainLen >= 0 && plainLen <= Int.MaxValue - 16,
      s"unsupported EncryptedPackage plaintext size: $plainLen")
    val out = new Array[Byte](plainLen.toInt)
    var seg = 0
    var written = 0
    while (written < plainLen) {
      val segPlain = math.min(SegmentSize, plainLen.toInt - written)
      val segCipher = (segPlain + 15) / 16 * 16
      val segIv = fit(sha512(d.keyDataSalt, le32(seg)), d.keyDataBlockSize)
      val cipherOff = 8 + seg * SegmentSize
      val block = java.util.Arrays.copyOfRange(pkg, cipherOff, cipherOff + segCipher)
      System.arraycopy(aes(Cipher.DECRYPT_MODE, packageKey, segIv, block), 0,
        out, written, segPlain)
      written += segPlain
      seg += 1
    }
    out
  }

  /** Encrypt plain ZIP bytes into an agile container (AES-256/SHA-512,
    * the suite current Excel writes). Salts, the verifier input and the
    * intermediate package key are drawn from SecureRandom per the spec's
    * model — decrypt reads the salts back from the descriptor, so no
    * determinism is needed, and identical (content, password) pairs
    * produce unrelated ciphertexts. */
  def encrypt(zip: Array[Byte], password: String, spinCount: Int = 100000): Array[Byte] = {
    val keyBits = 256; val keyBytes = keyBits / 8; val blockSize = 16; val hashSize = 64
    val rng = new java.security.SecureRandom()
    def random(n: Int): Array[Byte] = { val b = new Array[Byte](n); rng.nextBytes(b); b }
    val pwSalt = random(16)
    val keyDataSalt = random(16)
    val verifierInput = random(16)
    val packageKey = random(keyBytes)

    val pwHash = passwordHash(pwSalt, password, spinCount)
    val iv = fit(pwSalt, blockSize)
    val encVerifierInput = aes(Cipher.ENCRYPT_MODE,
      deriveKey(pwHash, BlockKeyVerifierInput, keyBytes), iv, pad16(verifierInput))
    val encVerifierValue = aes(Cipher.ENCRYPT_MODE,
      deriveKey(pwHash, BlockKeyVerifierValue, keyBytes), iv, pad16(sha512(verifierInput)))
    val encKeyValue = aes(Cipher.ENCRYPT_MODE,
      deriveKey(pwHash, BlockKeyKeyValue, keyBytes), iv, pad16(packageKey))

    val b64 = Base64.getEncoder
    def enc(b: Array[Byte]): String = b64.encodeToString(b)
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption" xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
         |<keyData saltSize="16" blockSize="$blockSize" keyBits="$keyBits" hashSize="$hashSize" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512" saltValue="${enc(keyDataSalt)}"/>
         |<keyEncryptors><keyEncryptor uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
         |<p:encryptedKey spinCount="$spinCount" saltSize="16" blockSize="$blockSize" keyBits="$keyBits" hashSize="$hashSize" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512" saltValue="${enc(pwSalt)}" encryptedVerifierHashInput="${enc(encVerifierInput)}" encryptedVerifierHashValue="${enc(encVerifierValue)}" encryptedKeyValue="${enc(encKeyValue)}"/>
         |</keyEncryptor></keyEncryptors>
         |</encryption>""".stripMargin
    val header = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(4).putShort(4).putInt(0x40).array()
    // space-pad: the CFB writer declares padded sizes (see OleCfb), and
    // trailing whitespace after the XML root is legal
    val infoBody = xml.getBytes(StandardCharsets.UTF_8)
    val infoPadded = header ++ infoBody ++
      Array.fill(math.max(0, 4096 - 8 - infoBody.length))(' '.toByte)

    val segments = zip.grouped(SegmentSize).zipWithIndex.map { case (seg, i) =>
      aes(Cipher.ENCRYPT_MODE, packageKey,
        fit(sha512(keyDataSalt, le32(i)), blockSize), pad16(seg))
    }
    val pkgBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(zip.length.toLong).array() ++ segments.flatten
    OleCfb.writeStreams(Seq(
      "EncryptionInfo" -> infoPadded,
      "EncryptedPackage" -> pkgBytes))
  }
}
