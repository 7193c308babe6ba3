package graft

import java.io.{DataInputStream, EOFException, IOException, OutputStream}
import java.math.BigInteger
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.{AlgorithmParameters, KeyFactory, KeyPair, KeyPairGenerator, MessageDigest, Signature}
import java.security.interfaces.{ECPublicKey, EdECPublicKey}
import java.security.spec.{ECGenParameterSpec, ECParameterSpec, ECPoint, ECPublicKeySpec}

import javax.crypto.{Cipher, KeyAgreement, Mac}
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import scala.collection.mutable

/** In-process SSH2 + SFTP(v3) server fixture for SftpSpec — enough of
  * RFC 4253/4252/4254 + draft-ietf-secsh-filexfer-02 for a real jsch
  * client to key-exchange, password-authenticate, open the sftp
  * subsystem, `ls`, and `get` against a local directory served
  * read-only over a loopback socket. Pure JDK crypto:
  * ecdh-sha2-nistp256 kex (RFC 5656), ssh-ed25519 host key (RFC 8709),
  * aes128-ctr + hmac-sha2-256 (RFC 4344/6668) — all in every modern
  * client's default proposal, so the negotiation needs no client-side
  * configuration.
  *
  * A server (not a client mock) is the only way to test
  * [[graft.sources.Sftp]] end-to-end in a container with no sshd binary:
  * the jsch client's kex, host-key verification, MAC checking, channel
  * flow, and SFTP request pipelining all run for real; only the network
  * is loopback.
  */
object MiniSshServer {

  final class Handle(val port: Int, server: ServerSocket, thread: Thread) {
    def close(): Unit = {
      try server.close() catch { case _: Throwable => }
      thread.interrupt()
    }
  }

  /** Serve `root` read-only on an ephemeral loopback port. */
  def start(root: Path, user: String, pass: String): Handle = {
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val t = new Thread(() => {
      try while (!server.isClosed) {
        val sock = server.accept()
        val h    = new Thread(() => {
          try new Session(sock, root, user, pass).run()
          catch { case _: Throwable => /* connection torn down */ }
          finally (try sock.close() catch { case _: Throwable => })
        })
        h.setDaemon(true)
        h.start()
      } catch { case _: Throwable => /* server closed */ }
    })
    t.setDaemon(true)
    t.start()
    new Handle(server.getLocalPort, server, t)
  }

  // ===== SSH wire primitives (big-endian, RFC 4251 §5) =====

  private final class W {
    private val buf = mutable.ArrayBuffer[Byte]()
    def bytes(b: Array[Byte]): W = { buf ++= b; this }
    def u8(v: Int): W            = { buf += v.toByte; this }
    def u32(v: Long): W = {
      buf += ((v >>> 24) & 0xff).toByte; buf += ((v >>> 16) & 0xff).toByte
      buf += ((v >>> 8) & 0xff).toByte; buf += (v & 0xff).toByte; this
    }
    def u64(v: Long): W  = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def bool(v: Boolean): W = u8(if (v) 1 else 0)
    def str(s: String): W         = str(s.getBytes(StandardCharsets.UTF_8))
    def str(b: Array[Byte]): W    = { u32(b.length.toLong); bytes(b) }
    def mpint(v: BigInteger): W = {
      val b = v.toByteArray // big-endian two's complement, what mpint wants
      if (v.signum == 0) u32(0) else str(b)
    }
    def out: Array[Byte] = buf.toArray
  }

  private final class R(val a: Array[Byte]) {
    private var p = 0
    def u8(): Int  = { val v = a(p) & 0xff; p += 1; v }
    def u32(): Long = {
      val v = ((a(p) & 0xffL) << 24) | ((a(p + 1) & 0xffL) << 16) |
        ((a(p + 2) & 0xffL) << 8) | (a(p + 3) & 0xffL)
      p += 4; v
    }
    def u64(): Long = (u32() << 32) | u32()
    def bool(): Boolean = u8() != 0
    def bytes(n: Int): Array[Byte] = { val v = a.slice(p, p + n); p += n; v }
    def str(): Array[Byte]  = bytes(u32().toInt)
    def strUtf8(): String   = new String(str(), StandardCharsets.UTF_8)
    def remaining: Int      = a.length - p
  }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    md.digest()
  }

  // ===== message numbers =====
  private val MSG_DISCONNECT            = 1
  private val MSG_IGNORE                = 2
  private val MSG_UNIMPLEMENTED         = 3
  private val MSG_DEBUG                 = 4
  private val MSG_SERVICE_REQUEST       = 5
  private val MSG_SERVICE_ACCEPT        = 6
  private val MSG_KEXINIT               = 20
  private val MSG_NEWKEYS               = 21
  private val MSG_KEX_ECDH_INIT         = 30
  private val MSG_KEX_ECDH_REPLY        = 31
  private val MSG_USERAUTH_REQUEST      = 50
  private val MSG_USERAUTH_FAILURE      = 51
  private val MSG_USERAUTH_SUCCESS      = 52
  private val MSG_GLOBAL_REQUEST        = 80
  private val MSG_REQUEST_FAILURE       = 82
  private val MSG_CHANNEL_OPEN          = 90
  private val MSG_CHANNEL_OPEN_CONFIRM  = 91
  private val MSG_CHANNEL_WINDOW_ADJUST = 93
  private val MSG_CHANNEL_DATA          = 94
  private val MSG_CHANNEL_EOF           = 96
  private val MSG_CHANNEL_CLOSE         = 97
  private val MSG_CHANNEL_REQUEST       = 98
  private val MSG_CHANNEL_SUCCESS       = 99
  private val MSG_CHANNEL_FAILURE       = 100

  private val ServerVersion = "SSH-2.0-GraftMiniSSHD_1.0"

  // ===== one client connection =====

  private final class Session(sock: Socket, root: Path, user: String, pass: String) {
    sock.setSoTimeout(30000)
    private val in  = new DataInputStream(sock.getInputStream)
    private val out: OutputStream = sock.getOutputStream

    // transport state
    private var sendSeq = 0L
    private var recvSeq = 0L
    private var encOn   = false
    private var encC: Cipher = _ // s2c encrypt
    private var decC: Cipher = _ // c2s decrypt
    private var macS: Mac    = _ // s2c
    private var macC: Mac    = _ // c2s

    // ----- packet IO -----

    private def readPacket(): Array[Byte] = {
      if (!encOn) {
        val len = in.readInt()
        if (len < 1 || len > (1 << 20)) throw new IOException(s"bad packet length $len")
        val body = new Array[Byte](len)
        in.readFully(body)
        recvSeq += 1
        val padlen = body(0) & 0xff
        body.slice(1, len - padlen)
      } else {
        val first = new Array[Byte](16)
        in.readFully(first)
        val p0  = decC.update(first)
        val len = ((p0(0) & 0xffL) << 24) | ((p0(1) & 0xffL) << 16) |
          ((p0(2) & 0xffL) << 8) | (p0(3) & 0xffL)
        if (len < 1 || len > (1 << 20)) throw new IOException(s"bad packet length $len")
        val rest = new Array[Byte](len.toInt + 4 - 16)
        in.readFully(rest)
        val p1    = decC.update(rest)
        val plain = p0 ++ p1
        val tag   = new Array[Byte](32)
        in.readFully(tag)
        macC.reset()
        macC.update(new W().u32(recvSeq).out)
        macC.update(plain)
        if (!MessageDigest.isEqual(macC.doFinal(), tag))
          throw new IOException("client MAC mismatch")
        recvSeq += 1
        val padlen = plain(4) & 0xff
        plain.slice(5, 4 + len.toInt - padlen)
      }
    }

    private def writePacket(payload: Array[Byte]): Unit = {
      val block  = if (encOn) 16 else 8
      val unpad  = 4 + 1 + payload.length
      var padlen = block - (unpad % block)
      if (padlen < 4) padlen += block
      val plain = new W().u32((1 + payload.length + padlen).toLong).u8(padlen)
        .bytes(payload).bytes(new Array[Byte](padlen)).out
      if (!encOn) out.write(plain)
      else {
        macS.reset()
        macS.update(new W().u32(sendSeq).out)
        macS.update(plain)
        val tag = macS.doFinal()
        out.write(encC.update(plain))
        out.write(tag)
      }
      out.flush()
      sendSeq += 1
    }

    // ----- key exchange -----

    private def nameLists(): Array[Byte] = new W()
      .str("ecdh-sha2-nistp256")         // kex
      .str("ssh-ed25519")                // host key
      .str("aes128-ctr").str("aes128-ctr")
      .str("hmac-sha2-256").str("hmac-sha2-256")
      .str("none").str("none")
      .str("").str("")
      .bool(false).u32(0).out

    private def ed25519RawPub(kp: KeyPair): Array[Byte] = {
      val pt = kp.getPublic.asInstanceOf[EdECPublicKey].getPoint
      val be = pt.getY.toByteArray
      val le = new Array[Byte](32)
      // y < 2^255: big-endian bytes (minus any sign byte) reversed into LE
      val trimmed = if (be.length > 32) be.slice(be.length - 32, be.length) else be
      var i = 0
      while (i < trimmed.length) { le(i) = trimmed(trimmed.length - 1 - i); i += 1 }
      if (pt.isXOdd) le(31) = (le(31) | 0x80).toByte
      le
    }

    private def ecPointUncompressed(pub: ECPublicKey): Array[Byte] = {
      def fixed(v: BigInteger): Array[Byte] = {
        val b   = v.toByteArray
        val outB = new Array[Byte](32)
        if (b.length >= 32) System.arraycopy(b, b.length - 32, outB, 0, 32)
        else System.arraycopy(b, 0, outB, 32 - b.length, b.length)
        outB
      }
      Array[Byte](4) ++ fixed(pub.getW.getAffineX) ++ fixed(pub.getW.getAffineY)
    }

    /** Runs transport kex; returns true when keys are live. */
    private def keyExchange(clientVersion: String): Unit = {
      val serverKexPayload = new W().u8(MSG_KEXINIT)
        .bytes(Array.fill[Byte](16)(0x5a)).bytes(nameLists()).out
      writePacket(serverKexPayload)

      var clientKexPayload: Array[Byte] = null
      var qC: Array[Byte]               = null
      while (qC == null) {
        val p = readPacket()
        (p(0) & 0xff) match {
          case MSG_KEXINIT       => clientKexPayload = p
          case MSG_KEX_ECDH_INIT => qC = new R(p.drop(1)).str()
          case MSG_IGNORE | MSG_DEBUG => // skip
          case t => throw new IOException(s"unexpected pre-kex message $t")
        }
      }

      // server ephemeral ECDH key on secp256r1
      val kpg = KeyPairGenerator.getInstance("EC")
      kpg.initialize(new ECGenParameterSpec("secp256r1"))
      val eph = kpg.generateKeyPair()
      val qS  = ecPointUncompressed(eph.getPublic.asInstanceOf[ECPublicKey])

      // client point
      val params = AlgorithmParameters.getInstance("EC")
      params.init(new ECGenParameterSpec("secp256r1"))
      val spec = params.getParameterSpec(classOf[ECParameterSpec])
      require(qC.length == 65 && qC(0) == 4, "expected uncompressed client point")
      val cPoint = new ECPoint(
        new BigInteger(1, qC.slice(1, 33)), new BigInteger(1, qC.slice(33, 65)))
      val cPub = KeyFactory.getInstance("EC")
        .generatePublic(new ECPublicKeySpec(cPoint, spec))

      val ka = KeyAgreement.getInstance("ECDH")
      ka.init(eph.getPrivate)
      ka.doPhase(cPub, true)
      val k = new BigInteger(1, ka.generateSecret())

      // host key (fresh per connection — the client runs with
      // StrictHostKeyChecking=no against the fixture)
      val hostKp  = KeyPairGenerator.getInstance("Ed25519").generateKeyPair()
      val hostPub = ed25519RawPub(hostKp)
      val kS      = new W().str("ssh-ed25519").str(hostPub).out

      val hashInput = new W()
        .str(clientVersion).str(ServerVersion)
        .str(clientKexPayload).str(serverKexPayload)
        .str(kS).str(qC).str(qS).mpint(k).out
      val h = sha256(hashInput)

      val signer = Signature.getInstance("Ed25519")
      signer.initSign(hostKp.getPrivate)
      signer.update(h)
      val sigBlob = new W().str("ssh-ed25519").str(signer.sign()).out

      writePacket(new W().u8(MSG_KEX_ECDH_REPLY).str(kS).str(qS).str(sigBlob).out)
      writePacket(Array[Byte](MSG_NEWKEYS.toByte))

      // client NEWKEYS (possibly after IGNOREs)
      var done = false
      while (!done) {
        val p = readPacket()
        (p(0) & 0xff) match {
          case MSG_NEWKEYS            => done = true
          case MSG_IGNORE | MSG_DEBUG => // skip
          case t => throw new IOException(s"expected NEWKEYS, got $t")
        }
      }

      // RFC 4253 §7.2 key derivation; session id = H (first kex)
      val kM = new W().mpint(k).out
      def kdf(x: Char, n: Int): Array[Byte] = {
        var acc = sha256(kM, h, Array(x.toByte), h)
        while (acc.length < n) acc = acc ++ sha256(kM, h, acc)
        acc.take(n)
      }
      val ivC2S  = kdf('A', 16)
      val ivS2C  = kdf('B', 16)
      val keyC2S = kdf('C', 16)
      val keyS2C = kdf('D', 16)
      val macC2S = kdf('E', 32)
      val macS2C = kdf('F', 32)

      decC = Cipher.getInstance("AES/CTR/NoPadding")
      decC.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyC2S, "AES"), new IvParameterSpec(ivC2S))
      encC = Cipher.getInstance("AES/CTR/NoPadding")
      encC.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(keyS2C, "AES"), new IvParameterSpec(ivS2C))
      macC = Mac.getInstance("HmacSHA256")
      macC.init(new SecretKeySpec(macC2S, "HmacSHA256"))
      macS = Mac.getInstance("HmacSHA256")
      macS.init(new SecretKeySpec(macS2C, "HmacSHA256"))
      encOn = true
    }

    // ----- main loop -----

    def run(): Unit = {
      // version exchange (RFC 4253 §4.2)
      out.write((ServerVersion + "\r\n").getBytes(StandardCharsets.US_ASCII))
      out.flush()
      var clientVersion: String = null
      while (clientVersion == null) {
        val line = new mutable.StringBuilder
        var c = in.read()
        while (c != '\n' && c != -1) { line.append(c.toChar); c = in.read() }
        if (c == -1) throw new EOFException("client hung up in version exchange")
        val s = line.toString.stripSuffix("\r")
        if (s.startsWith("SSH-")) clientVersion = s
      }

      keyExchange(clientVersion)

      var clientChannel  = -1L
      var sftp: SftpSubsystem = null
      val sftpBuf        = mutable.ArrayBuffer[Byte]()
      var clientMaxPkt   = 0x4000L

      def sendChannelData(b: Array[Byte]): Unit = {
        var off = 0
        val cap = math.min(clientMaxPkt, 0x8000L).toInt
        while (off < b.length) {
          val n = math.min(cap, b.length - off)
          writePacket(new W().u8(MSG_CHANNEL_DATA).u32(clientChannel)
            .str(b.slice(off, off + n)).out)
          off += n
        }
      }

      var running = true
      while (running) {
        val p = new R(readPacket())
        p.u8() match {
          case MSG_DISCONNECT => running = false
          case MSG_IGNORE | MSG_DEBUG | MSG_UNIMPLEMENTED => // skip
          case MSG_SERVICE_REQUEST =>
            val svc = p.strUtf8()
            if (svc == "ssh-userauth")
              writePacket(new W().u8(MSG_SERVICE_ACCEPT).str(svc).out)
            else throw new IOException(s"unsupported service $svc")
          case MSG_USERAUTH_REQUEST =>
            val u      = p.strUtf8()
            val _svc   = p.strUtf8()
            val method = p.strUtf8()
            if (method == "password") {
              p.bool()
              val pw = p.strUtf8()
              if (u == user && pw == pass)
                writePacket(Array[Byte](MSG_USERAUTH_SUCCESS.toByte))
              else
                writePacket(new W().u8(MSG_USERAUTH_FAILURE).str("password").bool(false).out)
            } else
              writePacket(new W().u8(MSG_USERAUTH_FAILURE).str("password").bool(false).out)
          case MSG_GLOBAL_REQUEST =>
            val _name = p.strUtf8()
            if (p.bool()) writePacket(Array[Byte](MSG_REQUEST_FAILURE.toByte))
          case MSG_CHANNEL_OPEN =>
            val kind = p.strUtf8()
            val sender = p.u32()
            val _window = p.u32()
            clientMaxPkt = p.u32()
            if (kind == "session") {
              clientChannel = sender
              writePacket(new W().u8(MSG_CHANNEL_OPEN_CONFIRM).u32(sender)
                .u32(0).u32(0x7fffffffL).u32(0x8000L).out)
            } else throw new IOException(s"unsupported channel kind $kind")
          case MSG_CHANNEL_REQUEST =>
            val _rcpt = p.u32()
            val req   = p.strUtf8()
            val wantReply = p.bool()
            if (req == "subsystem" && p.strUtf8() == "sftp") {
              sftp = new SftpSubsystem(root)
              if (wantReply)
                writePacket(new W().u8(MSG_CHANNEL_SUCCESS).u32(clientChannel).out)
            } else if (wantReply)
              writePacket(new W().u8(MSG_CHANNEL_FAILURE).u32(clientChannel).out)
          case MSG_CHANNEL_WINDOW_ADJUST => // request-driven replies: no bookkeeping
          case MSG_CHANNEL_DATA =>
            val _rcpt = p.u32()
            sftpBuf ++= p.str()
            // drain complete SFTP packets (uint32 length prefix framing)
            var more = true
            while (more && sftpBuf.length >= 4) {
              val len = ((sftpBuf(0) & 0xffL) << 24) | ((sftpBuf(1) & 0xffL) << 16) |
                ((sftpBuf(2) & 0xffL) << 8) | (sftpBuf(3) & 0xffL)
              if (sftpBuf.length >= 4 + len) {
                val pkt = sftpBuf.slice(4, 4 + len.toInt).toArray
                sftpBuf.remove(0, 4 + len.toInt)
                if (sftp == null) throw new IOException("channel data before sftp subsystem")
                sftp.handle(pkt).foreach(sendChannelData)
              } else more = false
            }
          case MSG_CHANNEL_EOF => // client done writing; replies already sent
          case MSG_CHANNEL_CLOSE =>
            writePacket(new W().u8(MSG_CHANNEL_CLOSE).u32(clientChannel).out)
            running = false
          case other =>
            writePacket(new W().u8(MSG_UNIMPLEMENTED).u32(recvSeq - 1).out)
            if (other == MSG_KEXINIT) throw new IOException("rekex not supported")
        }
      }
    }
  }

  // ===== SFTP v3 subsystem (draft-ietf-secsh-filexfer-02), read-only =====

  private val FXP_INIT     = 1
  private val FXP_VERSION  = 2
  private val FXP_OPEN     = 3
  private val FXP_CLOSE    = 4
  private val FXP_READ     = 5
  private val FXP_LSTAT    = 7
  private val FXP_FSTAT    = 8
  private val FXP_OPENDIR  = 11
  private val FXP_READDIR  = 12
  private val FXP_REALPATH = 16
  private val FXP_STAT     = 17
  private val FXP_STATUS   = 101
  private val FXP_HANDLE   = 102
  private val FXP_DATA     = 103
  private val FXP_NAME     = 104
  private val FXP_ATTRS    = 105

  private val FX_OK           = 0L
  private val FX_EOF          = 1L
  private val FX_NO_SUCH_FILE = 2L
  private val FX_FAILURE      = 4L

  private final class SftpSubsystem(root: Path) {
    private var nextHandle = 0
    private val fileHandles = mutable.HashMap[String, Path]()
    private val dirHandles  = mutable.HashMap[String, mutable.Queue[Path]]()

    private def resolve(p: String): Path = {
      val rel = p.stripPrefix("/")
      val r   = if (rel.isEmpty) root else root.resolve(rel).normalize()
      if (!r.startsWith(root)) root else r
    }

    private def virtualPath(p: Path): String =
      "/" + root.relativize(p).toString.replace('\\', '/')

    private def attrsOf(p: Path): Array[Byte] = {
      val isDir = Files.isDirectory(p)
      val size  = if (isDir) 0L else Files.size(p)
      val perms = if (isDir) 0x4000 | 0x1ed /* 0755 */ else 0x8000 | 0x1a4 /* 0644 */
      new W().u32(0x1L | 0x4L).u64(size).u32(perms.toLong).out // SIZE | PERMISSIONS
    }

    private def longname(p: Path, name: String): String = {
      val d = if (Files.isDirectory(p)) "d" else "-"
      val size = if (Files.isDirectory(p)) 0L else Files.size(p)
      f"${d}rw-r--r--   1 graft    graft    $size%10d Jan  1 00:00 $name"
    }

    private def status(reqId: Long, code: Long, msg: String): Array[Byte] =
      frame(new W().u8(FXP_STATUS).u32(reqId).u32(code).str(msg).str("").out)

    private def frame(body: Array[Byte]): Array[Byte] =
      new W().u32(body.length.toLong).bytes(body).out

    /** One SFTP request in, zero-or-one framed replies out. */
    def handle(pkt: Array[Byte]): Option[Array[Byte]] = {
      val r = new R(pkt)
      r.u8() match {
        case FXP_INIT =>
          val _clientVersion = r.u32()
          Some(frame(new W().u8(FXP_VERSION).u32(3).out))

        case FXP_REALPATH =>
          val reqId = r.u32()
          val path  = r.strUtf8()
          val p     = resolve(if (path == ".") "/" else path)
          val vp    = if (p == root) "/" else virtualPath(p)
          Some(frame(new W().u8(FXP_NAME).u32(reqId).u32(1)
            .str(vp).str(longname(p, vp)).u32(0).out))

        case FXP_STAT | FXP_LSTAT =>
          val reqId = r.u32()
          val p     = resolve(r.strUtf8())
          if (!Files.exists(p)) Some(status(reqId, FX_NO_SUCH_FILE, "no such file"))
          else Some(frame(new W().u8(FXP_ATTRS).u32(reqId).bytes(attrsOf(p)).out))

        case FXP_FSTAT =>
          val reqId = r.u32()
          val h     = r.strUtf8()
          fileHandles.get(h) match {
            case Some(p) => Some(frame(new W().u8(FXP_ATTRS).u32(reqId).bytes(attrsOf(p)).out))
            case None    => Some(status(reqId, FX_FAILURE, "bad handle"))
          }

        case FXP_OPEN =>
          val reqId  = r.u32()
          val p      = resolve(r.strUtf8())
          val pflags = r.u32()
          if ((pflags & ~0x1L) != 0) Some(status(reqId, FX_FAILURE, "read-only server"))
          else if (!Files.isRegularFile(p)) Some(status(reqId, FX_NO_SUCH_FILE, "no such file"))
          else {
            val h = s"f$nextHandle"; nextHandle += 1
            fileHandles(h) = p
            Some(frame(new W().u8(FXP_HANDLE).u32(reqId).str(h).out))
          }

        case FXP_READ =>
          val reqId  = r.u32()
          val h      = r.strUtf8()
          val offset = r.u64()
          val want   = r.u32().toInt
          fileHandles.get(h) match {
            case None => Some(status(reqId, FX_FAILURE, "bad handle"))
            case Some(p) =>
              val ch = Files.newByteChannel(p)
              try {
                val size = ch.size()
                if (offset >= size) Some(status(reqId, FX_EOF, "eof"))
                else {
                  val n   = math.min(want.toLong, size - offset).toInt
                  val buf = java.nio.ByteBuffer.allocate(n)
                  ch.position(offset)
                  while (buf.hasRemaining && ch.read(buf) >= 0) {}
                  Some(frame(new W().u8(FXP_DATA).u32(reqId).str(buf.array()).out))
                }
              } finally ch.close()
          }

        case FXP_OPENDIR =>
          val reqId = r.u32()
          val p     = resolve(r.strUtf8())
          if (!Files.isDirectory(p)) Some(status(reqId, FX_NO_SUCH_FILE, "not a directory"))
          else {
            val h = s"d$nextHandle"; nextHandle += 1
            val entries = mutable.Queue[Path]()
            Files.list(p).forEach(e => entries.enqueue(e))
            dirHandles(h) = entries
            Some(frame(new W().u8(FXP_HANDLE).u32(reqId).str(h).out))
          }

        case FXP_READDIR =>
          val reqId = r.u32()
          val h     = r.strUtf8()
          dirHandles.get(h) match {
            case None => Some(status(reqId, FX_FAILURE, "bad handle"))
            case Some(q) if q.isEmpty => Some(status(reqId, FX_EOF, "eof"))
            case Some(q) =>
              val batch = (1 to math.min(64, q.size)).map(_ => q.dequeue())
              val w = new W().u8(FXP_NAME).u32(reqId).u32(batch.size.toLong)
              batch.foreach { e =>
                val name = e.getFileName.toString
                w.str(name).str(longname(e, name)).bytes(attrsOf(e))
              }
              Some(frame(w.out))
          }

        case FXP_CLOSE =>
          val reqId = r.u32()
          val h     = r.strUtf8()
          fileHandles.remove(h)
          dirHandles.remove(h)
          Some(status(reqId, FX_OK, "ok"))

        case other =>
          // write/rename/remove/mkdir…: read-only fixture
          val reqId = if (r.remaining >= 4) r.u32() else 0L
          Some(status(reqId, FX_FAILURE, s"unsupported op $other (read-only server)"))
      }
    }
  }
}
