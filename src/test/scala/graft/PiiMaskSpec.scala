package graft

import graft.functions.{NativeFunctions, TextFunctions, TextImpl}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The Luhn gate and the extended PII scrub (round-6 broadening: IPv4/IPv6,
  * SSN, Luhn-gated card masking; reference context: the C4-style curation
  * cleanup the reference's users run before training).
  */
class PiiMaskSpec extends SparkSpec {

  private def luhn(s: String): Boolean = TextImpl.luhnValid(UTF8String.fromString(s))

  private def mask(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextFunctions.maskPii(col("t")).as("m"))
      .head().getString(0)
  }

  test("luhnValid accepts the classic valid PANs, all separator styles") {
    assert(luhn("4111111111111111"))
    assert(luhn("4111 1111 1111 1111"))
    assert(luhn("4111-1111-1111-1111"))
    assert(luhn("5500-0000-0000-0004"))
    assert(luhn("378282246310005"))        // 15-digit Amex
    assert(luhn("6011000990139424"))       // 16-digit Discover
  }

  test("luhnValid rejects checksum failures, bad lengths, junk") {
    assert(!luhn("4111111111111112"))      // checksum off by one
    assert(!luhn("1234-5678-9012-3456"))   // checksum fails
    assert(!luhn("41111111"))              // 8 digits: too short
    assert(!luhn("41111111111111111111111")) // 23 digits: too long
    assert(!luhn("4111 1111 1111 111x"))   // non-separator char
    assert(!luhn(""))
  }

  test("maskLuhn masks valid spans, leaves invalid look-alikes") {
    val u = UTF8String.fromString("pay 4111 1111 1111 1111 not 1234-5678-9012-3456 ok")
    assert(TextImpl.maskLuhn(u, UTF8String.fromString("<CC>")).toString ===
      "pay <CC> not 1234-5678-9012-3456 ok")
  }

  test("maskLuhn respects alnum boundaries and string edges") {
    val tok = UTF8String.fromString("<CC>")
    // identifier-embedded digits are not PANs
    assert(TextImpl.maskLuhn(UTF8String.fromString("id x4111111111111111"), tok)
      .toString === "id x4111111111111111")
    assert(TextImpl.maskLuhn(UTF8String.fromString("4111111111111111y"), tok)
      .toString === "4111111111111111y")
    // PAN at both string edges
    assert(TextImpl.maskLuhn(UTF8String.fromString("4111111111111111"), tok)
      .toString === "<CC>")
    assert(TextImpl.maskLuhn(
      UTF8String.fromString("4111-1111-1111-1111 and 5500 0000 0000 0004"), tok)
      .toString === "<CC> and <CC>")
  }

  test("maskLuhn does not glue separate shorter runs across separators") {
    val tok = UTF8String.fromString("<CC>")
    // 123-45-6789 (9 digits) followed by text — not a PAN, untouched
    assert(TextImpl.maskLuhn(UTF8String.fromString("ssn 123-45-6789 end"), tok)
      .toString === "ssn 123-45-6789 end")
  }

  test("maskPii end-to-end: every category masked, invalid CC survives to stay") {
    val in = "see alice.b+x@mail.example.org or +14155551234 at 192.168.1.254 " +
      "or 2001:db8:85a3:1:2:8a2e:370:7334 ssn 078-05-1120 " +
      "card 4111 1111 1111 1111 fake 1234-5678-9012-3456"
    assert(mask(in) ===
      "see <EMAIL> or <PHONE> at <IP> or <IP> ssn <SSN> " +
        "card <CC> fake 1234-5678-9012-3456")
  }

  test("ipv4 strictness: out-of-range octets are not IPs") {
    assert(mask("addr 999.1.1.1 end") === "addr 999.1.1.1 end")
    assert(mask("addr 256.256.256.256 end") === "addr 256.256.256.256 end")
    assert(mask("addr 255.255.255.255 end") === "addr <IP> end")
    assert(mask("addr 0.0.0.0 end") === "addr <IP> end")
  }

  test("contiguous 16-digit valid PAN is CC-masked, not phone-split") {
    assert(mask("n 4111111111111111 m") === "n <CC> m")
    // invalid contiguous 16-digit run: first 15 digits fall to the phone
    // pattern (documented: the phone dial is contiguous 7-15)
    assert(mask("n 4111111111111112 m") === "n <PHONE>2 m")
  }

  test("sql surface: graft_luhn_valid / graft_mask_cc") {
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_luhn_valid('4111 1111 1111 1111') v, " +
        "graft_mask_cc('pay 5500-0000-0000-0004 now', '<X>') m").head()
    assert(r.getBoolean(0))
    assert(r.getString(1) === "pay <X> now")
  }
}
