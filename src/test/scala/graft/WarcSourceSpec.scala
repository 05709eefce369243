package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.WarcSource

/** Kernel pins for the WARC/WET record parser — the degrade paths the
  * oracle round trip (warc1/dp6w) can't see: malformed headers,
  * truncation, byte-vs-char Content-Length accounting. */
class WarcSourceSpec extends AnyFunSuite {

  private def rec(typ: String, uri: String, lang: String, body: String): String = {
    val bytes = body.getBytes("UTF-8")
    s"WARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Record-ID: <urn:graft:doc:7>\r\n" +
      s"WARC-Identified-Content-Language: $lang\r\n" +
      s"Content-Length: ${bytes.length}\r\n\r\n$body\r\n\r\n"
  }

  test("parseRecord: conversion record round-trips headers and byte-exact body") {
    val body = "héllo wörld — ünïcode body" // multi-byte: bytes > chars
    val out = WarcSource.parseRecord(rec("conversion", "https://x.org/1", "de", body))
    assert(out.isDefined)
    val (typ, uri, rid, lang, len, b) = out.get
    assert(typ == "conversion" && uri == "https://x.org/1" && lang == "de")
    assert(rid == "<urn:graft:doc:7>")
    assert(len == body.getBytes("UTF-8").length && len > body.length,
      "Content-Length must count UTF-8 BYTES, not chars")
    assert(b == body)
  }

  test("parseRecord degrades: empty pre-first chunk, no header end, bad/missing length, truncation") {
    assert(WarcSource.parseRecord("").isEmpty)
    assert(WarcSource.parseRecord("WARC-Type: conversion\r\n").isEmpty,
      "no blank line must degrade")
    assert(WarcSource.parseRecord(
      "WARC-Type: conversion\r\n\r\nbody").isEmpty, "missing Content-Length")
    assert(WarcSource.parseRecord(
      "WARC-Type: conversion\r\nContent-Length: nope\r\n\r\nbody").isEmpty)
    assert(WarcSource.parseRecord(
      "WARC-Type: conversion\r\nContent-Length: 99\r\n\r\nshort").isEmpty,
      "body shorter than declared must degrade (truncated record)")
    // body LONGER than declared is fine: the record terminator and any
    // trailing bytes before the next delimiter are cut by the length
    val long = WarcSource.parseRecord(
      "WARC-Type: x\r\nContent-Length: 4\r\n\r\nbodyTRAILER")
    assert(long.exists(_._6 == "body"))
  }

  test("parseRecord never throws on garbage chunks") {
    val rnd = new java.util.Random(3L)
    for (_ <- 1 to 200) {
      val s = new String(Array.fill(rnd.nextInt(120))(
        (32 + rnd.nextInt(90)).toChar)) + (if (rnd.nextBoolean()) "\r\n\r\n" else "")
      WarcSource.parseRecord(s)
    }
  }
}
