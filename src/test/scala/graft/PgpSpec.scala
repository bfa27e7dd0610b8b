package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.pipes.Pgp

/** RFC 4880 wire-format checks. The interop tests drive the container's
  * stock GnuPG binary in BOTH directions (our bytes decrypted by gpg;
  * gpg's bytes decrypted/verified by us) — the strongest available
  * evidence that the packets are spec-conformant, not just
  * self-consistent.
  */
class PgpSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private val gpg: Option[String] =
    Seq("/usr/bin/gpg", "/usr/local/bin/gpg").find(p => new java.io.File(p).canExecute)

  // Every homedir gpg touches auto-spawns a gpg-agent daemon holding two
  // inotify instances; left alive they exhaust fs.inotify.max_user_instances
  // across test runs (observed: 114 stale agents blocking sbt startup). Track
  // the homedirs and `gpgconf --kill` each agent when the suite ends.
  private val homes = scala.collection.mutable.ArrayBuffer.empty[Path]

  private def gpgHome(): Path = {
    val d = Files.createTempDirectory("graft-gnupg")
    d.toFile.setExecutable(true, true)
    java.nio.file.Files.setPosixFilePermissions(d,
      java.util.EnumSet.of(
        java.nio.file.attribute.PosixFilePermission.OWNER_READ,
        java.nio.file.attribute.PosixFilePermission.OWNER_WRITE,
        java.nio.file.attribute.PosixFilePermission.OWNER_EXECUTE))
    homes.synchronized { homes += d }
    d
  }

  override def afterAll(): Unit = {
    homes.synchronized { homes.foreach { h =>
      try Seq("gpgconf", "--homedir", h.toString, "--kill", "gpg-agent").!
      catch { case _: Throwable => () }
    } }
    super.afterAll()
  }

  private def run(cmd: Seq[String], stdin: Array[Byte]): (Int, Array[Byte], String) = {
    val out = new java.io.ByteArrayOutputStream()
    val err = new StringBuilder
    val io = new ProcessIO(
      in => { in.write(stdin); in.close() },
      o => { o.transferTo(out); o.close() },
      e => { scala.io.Source.fromInputStream(e).getLines().foreach(l => err.append(l).append('\n')); e.close() })
    val p = cmd.run(io)
    (p.exitValue(), out.toByteArray, err.toString)
  }

  private val payload =
    ("The quick brown fox. " * 50 + "héllo ✓ bytes \u0000ÿ").getBytes(StandardCharsets.UTF_8)

  // -------------------------------------------------------- internal loops

  test("symmetric round-trip (self)") {
    val ct = Pgp.encryptSym(payload, "s3cret pass".toCharArray, "seg-0001.json", 1700000000L)
    assert(Pgp.decryptSym(ct, "s3cret pass".toCharArray).toSeq === payload.toSeq)
  }

  test("wrong passphrase fails loudly, right one still works") {
    val ct = Pgp.encryptSym(payload, "correct".toCharArray)
    val ex = intercept[IllegalArgumentException] {
      Pgp.decryptSym(ct, "wrong".toCharArray)
    }
    assert(ex.getMessage.contains("failed"))
    assert(Pgp.decryptSym(ct, "correct".toCharArray).toSeq === payload.toSeq)
  }

  test("ciphertext tamper trips the MDC (or the quick check), never returns data") {
    val ct = Pgp.encryptSym(payload, "p".toCharArray)
    // flip a bit near the end of the SEIPD body (inside MDC-protected data)
    ct(ct.length - 5) = (ct(ct.length - 5) ^ 0x40).toByte
    intercept[Exception] { Pgp.decryptSym(ct, "p".toCharArray) }
  }

  test("public-key round-trip (self, JCA RSA keypair)") {
    val kp = graft.pipes.CryptoStage.generateKeyPair()
    val pub = kp.getPublic.asInstanceOf[java.security.interfaces.RSAPublicKey]
    val pk = Pgp.PgpPublicKey(pub, Array.fill(8)(0.toByte), Array.fill(20)(0.toByte))
    val ct = Pgp.encryptPk(payload, pk)
    assert(Pgp.decryptPk(ct, kp.getPrivate).toSeq === payload.toSeq)
  }

  // ------------------------------------------------------------ gpg interop

  test("gpg decrypts our symmetric message (encrypt direction interop)") {
    assume(gpg.isDefined, "gpg not available")
    val ct = Pgp.encryptSym(payload, "interop-pass".toCharArray, "x.dat", 1700000000L)
    val (rc, out, err) = run(Seq(gpg.get, "--homedir", gpgHome().toString, "--batch",
      "--passphrase", "interop-pass", "--decrypt"), ct)
    assert(rc === 0, s"gpg failed: $err")
    assert(out.toSeq === payload.toSeq)
  }

  test("we decrypt gpg's symmetric message (decrypt direction interop)") {
    assume(gpg.isDefined, "gpg not available")
    val (rc, ct, err) = run(Seq(gpg.get, "--homedir", gpgHome().toString, "--batch",
      "--passphrase", "interop-pass", "--symmetric", "--cipher-algo", "AES256",
      "--compress-algo", "zip", "--output", "-"), payload)
    assert(rc === 0, s"gpg failed: $err")
    assert(Pgp.decryptSym(ct, "interop-pass".toCharArray).toSeq === payload.toSeq)
  }

  test("we decrypt gpg's AES128+zlib variant (algo agility)") {
    assume(gpg.isDefined, "gpg not available")
    val (rc, ct, err) = run(Seq(gpg.get, "--homedir", gpgHome().toString, "--batch",
      "--passphrase", "pp", "--symmetric", "--cipher-algo", "AES",
      "--compress-algo", "zlib", "--s2k-digest-algo", "SHA256", "--output", "-"), payload)
    assert(rc === 0, s"gpg failed: $err")
    assert(Pgp.decryptSym(ct, "pp".toCharArray).toSeq === payload.toSeq)
  }

  private def withGpgKey[A](f: (Path, Pgp.PgpPublicKey) => A): Option[A] = {
    if (gpg.isEmpty) return None
    val home = gpgHome()
    val gen = run(Seq(gpg.get, "--homedir", home.toString, "--batch", "--passphrase", "",
      "--quick-generate-key", "graft-test@example.invalid", "rsa2048", "encrypt,sign", "0"),
      Array.emptyByteArray)
    if (gen._1 != 0) fail(s"gpg keygen failed: ${gen._3}")
    val (rc, pubBytes, err) = run(Seq(gpg.get, "--homedir", home.toString, "--export",
      "graft-test@example.invalid"), Array.emptyByteArray)
    assert(rc === 0, s"gpg export failed: $err")
    Some(f(home, Pgp.parsePublicKey(pubBytes)))
  }

  test("gpg decrypts our public-key message to a gpg-generated RSA key") {
    assume(gpg.isDefined, "gpg not available")
    withGpgKey { (home, pub) =>
      val ct = Pgp.encryptPk(payload, pub, "seg.json", 1700000000L)
      val (rc, out, err) = run(Seq(gpg.get, "--homedir", home.toString, "--batch",
        "--passphrase", "", "--decrypt"), ct)
      assert(rc === 0, s"gpg pk-decrypt failed: $err")
      assert(out.toSeq === payload.toSeq)
    }
  }

  test("we verify gpg's one-pass RSA signature (verify direction interop)") {
    assume(gpg.isDefined, "gpg not available")
    withGpgKey { (home, pub) =>
      val (rc, signed, err) = run(Seq(gpg.get, "--homedir", home.toString, "--batch",
        "--passphrase", "", "--local-user", "graft-test@example.invalid",
        "--sign", "--output", "-"), payload)
      assert(rc === 0, s"gpg sign failed: $err")
      assert(Pgp.verify(signed, pub).toSeq === payload.toSeq)
      // a flipped payload bit must fail verification
      val idx = signed.length / 2
      signed(idx) = (signed(idx) ^ 0x01).toByte
      intercept[Exception] { Pgp.verify(signed, pub) }
    }
  }

  test("self round-trip: our sign() verifies with our exported key via our verify()") {
    val kp = graft.pipes.CryptoStage.generateKeyPair()
    val signed = Pgp.sign(payload, kp, "x.dat")
    val pub = Pgp.parsePublicKey(Pgp.exportPublicKey(kp, "graft-export@example.invalid"))
    assert(Pgp.verify(signed, pub).toSeq === payload.toSeq)
    assert(pub.keyId.toSeq === Pgp.keyIdOf(kp).toSeq)
  }

  test("gpg imports our exported key and verifies our signature (sign direction interop)") {
    assume(gpg.isDefined, "gpg not available")
    val home = gpgHome()
    val kp = graft.pipes.CryptoStage.generateKeyPair()
    val transferable = Pgp.exportPublicKey(kp, "graft-export@example.invalid")
    val imp = run(Seq(gpg.get, "--homedir", home.toString, "--batch", "--import"), transferable)
    assert(imp._1 === 0, s"gpg import failed: ${imp._3}")
    val signed = Pgp.sign(payload, kp, "x.dat")
    val out = java.nio.file.Files.createTempFile("graft-signed", ".gpg")
    java.nio.file.Files.write(out, signed)
    val ver = run(Seq(gpg.get, "--homedir", home.toString, "--batch", "--status-fd", "1",
      "--verify", out.toString), Array.emptyByteArray)
    assert(ver._1 === 0, s"gpg verify failed: ${ver._3}")
    assert(new String(ver._2, "UTF-8").contains("GOODSIG"), s"no GOODSIG: ${new String(ver._2, "UTF-8")} ${ver._3}")
    // tampered literal byte must flip gpg's verdict
    val bad = signed.clone()
    val idx = bad.length / 2
    bad(idx) = (bad(idx) ^ 0x01).toByte
    java.nio.file.Files.write(out, bad)
    val ver2 = run(Seq(gpg.get, "--homedir", home.toString, "--batch", "--status-fd", "1",
      "--verify", out.toString), Array.emptyByteArray)
    assert(ver2._1 != 0 || new String(ver2._2, "UTF-8").contains("BADSIG"))
  }

  test("parsePublicKey fingerprint matches gpg's own fingerprint") {
    assume(gpg.isDefined, "gpg not available")
    withGpgKey { (home, pub) =>
      val (rc, out, err) = run(Seq(gpg.get, "--homedir", home.toString,
        "--with-colons", "--fingerprint", "graft-test@example.invalid"), Array.emptyByteArray)
      assert(rc === 0, s"gpg fingerprint failed: $err")
      val fpr = new String(out, StandardCharsets.UTF_8).linesIterator
        .find(_.startsWith("fpr:")).map(_.split(":")(9)).get
      assert(pub.fingerprint.map(b => f"${b & 0xff}%02X").mkString === fpr)
    }
  }
}
