package graft.sources.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import java.security.MessageDigest

/** SCRAM-SHA-256 client (RFC 5802 mechanics, RFC 7677 hash suite) — the
  * authentication PostgreSQL requires by default since v14. Pure
  * state-machine: callers feed server messages in, get client messages
  * out, so the whole exchange verifies against the RFC 7677 example
  * vectors with no server. No channel binding (gs2 header `n,,`), i.e.
  * the SCRAM-SHA-256 mechanism, not -PLUS — matching a plain TCP
  * replication connection.
  */
object ScramSha256 {

  final class AuthException(msg: String) extends RuntimeException(msg)

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private def sha256(data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(data)

  private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** Hi(str, salt, i) — PBKDF2-style iterated HMAC (RFC 5802 §2.2). */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val pw = password.getBytes(UTF_8)
    var u = hmac(pw, salt ++ Array[Byte](0, 0, 0, 1))
    var out = u
    var i = 1
    while (i < iterations) {
      u = hmac(pw, u)
      out = xor(out, u)
      i += 1
    }
    out
  }

  /** Parse `k=v,k=v` SCRAM attribute lists. */
  private def attrs(msg: String): Map[Char, String] =
    msg.split(",").iterator.filter(_.length >= 2)
      .map(kv => kv.charAt(0) -> kv.substring(2)).toMap

  final case class ClientFirst(message: String, bare: String, nonce: String)

  /** client-first-message with the caller-supplied nonce (tests pass the
    * RFC vector's; production passes a fresh random one). The gs2 header
    * is `n,,`: no channel binding, no authzid. PostgreSQL ignores the
    * SCRAM username field (it authenticated the startup user), so `n=`
    * is sent empty, as libpq does. */
  def clientFirst(nonce: String, user: String = ""): ClientFirst = {
    val bare = s"n=$user,r=$nonce"
    ClientFirst(s"n,,$bare", bare, nonce)
  }

  final case class ClientFinal(message: String, serverSignatureB64: String)

  /** Process server-first-message, produce client-final-message and the
    * expected server signature to verify the server's final message
    * against (mutual authentication — a MITM without the verifier
    * database cannot produce it). */
  def clientFinal(password: String, first: ClientFirst,
                  serverFirst: String): ClientFinal = {
    val a = attrs(serverFirst)
    val serverNonce = a.getOrElse('r',
      throw new AuthException("server-first missing nonce"))
    if (!serverNonce.startsWith(first.nonce))
      throw new AuthException("server nonce does not extend client nonce")
    val salt = Base64.getDecoder.decode(a.getOrElse('s',
      throw new AuthException("server-first missing salt")))
    val iterations = a.getOrElse('i',
      throw new AuthException("server-first missing iteration count")).toInt

    val channelBinding = Base64.getEncoder.encodeToString("n,,".getBytes(UTF_8))
    val withoutProof = s"c=$channelBinding,r=$serverNonce"
    val authMessage = s"${first.bare},$serverFirst,$withoutProof".getBytes(UTF_8)

    val sp = saltedPassword(password, salt, iterations)
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    val storedKey = sha256(clientKey)
    val clientSignature = hmac(storedKey, authMessage)
    val proof = Base64.getEncoder.encodeToString(xor(clientKey, clientSignature))

    val serverKey = hmac(sp, "Server Key".getBytes(UTF_8))
    val serverSignature = Base64.getEncoder.encodeToString(hmac(serverKey, authMessage))

    ClientFinal(s"$withoutProof,p=$proof", serverSignature)
  }

  /** Verify server-final-message (`v=...`) against the expected
    * signature; throws on mismatch or server error (`e=...`). */
  def verifyServerFinal(expected: ClientFinal, serverFinal: String): Unit = {
    val a = attrs(serverFinal)
    a.get('e').foreach(e => throw new AuthException(s"server rejected auth: $e"))
    val v = a.getOrElse('v',
      throw new AuthException("server-final missing verifier"))
    if (v != expected.serverSignatureB64)
      throw new AuthException("server signature mismatch (not the real server?)")
  }
}
