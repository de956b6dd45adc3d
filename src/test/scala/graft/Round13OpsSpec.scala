package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal

/** Round-13 wave part 1 — container-format round-trips (round-12
  * verdict item 6): q513's ID3v2 and q516's PDF-xref walkers had only
  * been proven against bytes their OWN fixture writer produced; these
  * tests assemble tags/documents independently (different structure,
  * frame IDs, payload shapes, and a hand-kept byte ledger) so the
  * parsers are held to the format spec, not to `encodeId3`/`encodePdf`.
  */
class Round13OpsSpec extends AnyFunSuite {

  // ---------------- ID3v2 (q513) ----------------

  /** Hand-rolled syncsafe encode, written independently of the
    * production `syncsafe` (long-division form instead of shifts).
    */
  private def ss(v: Int): Array[Byte] = {
    var rest = v
    val out = new Array[Byte](4)
    (3 to 0 by -1).foreach { i => out(i) = (rest % 128).toByte; rest /= 128 }
    out
  }

  /** Independent ID3v2.4 assembly: TCON + TRCK frames (IDs the fixture
    * writer never emits) with 130- and 200-byte payloads — both above
    * 127 so a plain-32-bit size reader cannot accidentally agree with
    * the syncsafe decode.
    */
  private def independentTag(): (Array[Byte], Int, Long) = {
    val frames = Seq(("TCON", 130), ("TRCK", 200))
    val body = new java.io.ByteArrayOutputStream()
    frames.foreach { case (id, plen) =>
      body.write(id.getBytes("US-ASCII"))
      body.write(ss(plen))
      body.write(0); body.write(0)
      (0 until plen).foreach(j => body.write('0' + j % 10))
    }
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(4); out.write(0); out.write(0)
    out.write(ss(b.length))
    out.write(b)
    (out.toByteArray, b.length, frames.map(_._2.toLong).sum)
  }

  test("q513 round-trip: sniffId3 parses an independently-assembled tag") {
    val (tag, bodyLen, payloadSum) = independentTag()
    // independent ledger: 2 frames x (10-byte header + payload)
    assert(bodyLen === 10 + 130 + 10 + 200)
    val parsed = Multimodal.sniffId3(tag)
    assert(parsed === Some((2, bodyLen, payloadSum, "TCON", "TRCK")))
  }

  test("q513: plain-32-bit frame size is rejected (the classic ID3 bug)") {
    val (tag, _, _) = independentTag()
    // rewrite the first frame's size (bytes 14..17) as a plain 32-bit
    // big-endian 130 = 0x00000082: byte 0x82 has the high bit set,
    // which a syncsafe decoder must reject
    val bad = tag.clone()
    bad(14) = 0; bad(15) = 0; bad(16) = 0; bad(17) = 0x82.toByte
    assert(Multimodal.sniffId3(bad).isEmpty)
  }

  test("q513: frame overrunning the tag body is rejected") {
    val (tag, _, _) = independentTag()
    val bad = tag.clone()
    // inflate the first frame's syncsafe size so it runs past the body
    val huge = ss(300)
    (0 until 4).foreach(i => bad(14 + i) = huge(i))
    assert(Multimodal.sniffId3(bad).isEmpty)
  }

  test("q513: non-[A-Z0-9] frame ID and bad magic are rejected") {
    val (tag, _, _) = independentTag()
    val badId = tag.clone()
    badId(10) = 't' // lowercase first frame-ID char
    assert(Multimodal.sniffId3(badId).isEmpty)
    val badMagic = tag.clone()
    badMagic(0) = 'X'
    assert(Multimodal.sniffId3(badMagic).isEmpty)
  }

  test("q513: v2.3 version byte is rejected (walker is v2.4-only)") {
    val (tag, _, _) = independentTag()
    val v23 = tag.clone()
    v23(3) = 3
    assert(Multimodal.sniffId3(v23).isEmpty)
  }

  // ---------------- PDF xref (q516) ----------------

  /** Independent minimal-PDF assembly: 3 objects whose bodies are
    * DICTS and STREAM-like text (the fixture writer only ever emits
    * `(string)` bodies), offsets tracked by a hand-kept running byte
    * counter — the same independent-offset discipline the q516 oracle
    * uses, but in spec code against the real parser.
    */
  private def independentPdf(): (Array[Byte], Int, Long, Long) = {
    val sb = new StringBuilder
    sb.append("%PDF-1.7\n")
    sb.append("% independent fixture\n") // comment line encodePdf never writes
    val bodies = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>\n",
      "<< /Type /Pages /Count 1 >>\n",
      "stream-ish free text body\n")
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    var objBytes = 0L
    bodies.zipWithIndex.foreach { case (b, i) =>
      offsets += sb.length
      val obj = s"${i + 1} 0 obj\n" + b + "endobj\n"
      objBytes += obj.length
      sb.append(obj)
    }
    val xrefOff = sb.length
    sb.append("xref\n")
    sb.append(s"0 ${bodies.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append("trailer\n")
    sb.append(s"<< /Size ${bodies.length + 1} >>\n")
    sb.append("startxref\n")
    sb.append(s"$xrefOff\n")
    sb.append("%%EOF\n")
    (sb.toString.getBytes("US-ASCII"), bodies.length, xrefOff.toLong, objBytes)
  }

  test("q516 round-trip: sniffPdf parses an independently-assembled PDF") {
    val (pdf, nObjs, xrefOff, objBytes) = independentPdf()
    assert(Multimodal.sniffPdf(pdf) === Some((nObjs, xrefOff, objBytes)))
  }

  test("q516: off-by-one startxref is rejected") {
    val (pdf, _, xrefOff, _) = independentPdf()
    val s = new String(pdf, "US-ASCII")
    val bad = s.replace(s"startxref\n$xrefOff\n", s"startxref\n${xrefOff + 1}\n")
    assert(bad != s)
    assert(Multimodal.sniffPdf(bad.getBytes("US-ASCII")).isEmpty)
  }

  test("q516: xref entry pointing at the wrong object is rejected") {
    val (pdf, _, xrefOff, _) = independentPdf()
    val s = new String(pdf, "US-ASCII")
    // point object 2's entry at object 1's offset: sniffPdf checks the
    // "<e> 0 obj" banner at the recorded offset, so the walk must fail.
    // (substring at the KNOWN offset — a lastIndexOf("xref") would land
    // inside "startxref".)
    val table = s.substring(xrefOff.toInt)
    val lines = table.split("\n")
    val obj1Entry = lines(3) // lines: xref, "0 4", free entry, obj1, obj2...
    val obj2Entry = lines(4)
    val patched = table.replace(obj2Entry, obj1Entry)
    assert(patched != table)
    val bad = s.substring(0, xrefOff.toInt) + patched
    assert(Multimodal.sniffPdf(bad.getBytes("US-ASCII")).isEmpty)
  }

  // ---------------- q533 streaming replay ----------------

  test("q533: streaming Croston replay equals batch q496 on the sampled parts") {
    val spark = SharedSpark.spark
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingGraded.crostonReplay(spark, dir)
    val batch = graft.operators.Temporal.crostonDemand(spark, dir)
      .select(col("part"), col("n_wk"), col("z_hat"), col("p_hat"),
        col("croston"), col("croston_sba"))
    val joined = streamed.as("s").join(batch.as("b"), "part")
    assert(joined.count() === streamed.count(),
      "every streamed part must exist in the batch relation")
    val diverging = joined.filter(
      col("s.n_wk") =!= col("b.n_wk") ||
        col("s.z_hat") =!= col("b.z_hat") ||
        col("s.p_hat") =!= col("b.p_hat") ||
        col("s.croston") =!= col("b.croston") ||
        col("s.croston_sba") =!= col("b.croston_sba")).count()
    assert(diverging === 0L)
    assert(streamed.count() > 0)
  }

  test("q516: free-kind marker on a nonzero entry and missing startxref are rejected") {
    val (pdf, _, _, _) = independentPdf()
    val s = new String(pdf, "US-ASCII")
    val badKind = s.replaceFirst("00000 n ", "00000 f ")
    assert(Multimodal.sniffPdf(badKind.getBytes("US-ASCII")).isEmpty)
    val noSx = s.replace("startxref", "startXXXX")
    assert(Multimodal.sniffPdf(noSx.getBytes("US-ASCII")).isEmpty)
  }
}
