package graft.extract

/** WARC/1.0 container codec (ISO 28500) — the framing CommonCrawl-scale
  * web corpora actually arrive in. Build + parse are both real byte
  * framing: CRLF header block, case-insensitive header fields,
  * Content-Length-delimited payload, double-CRLF record trailer. The
  * payload is OPAQUE BYTES — a record whose body contains "WARC/1.0" or
  * stray CRLFs must frame correctly because only Content-Length governs
  * the body (the classic streaming-parser mistake is scanning for the
  * next magic instead).
  *
  * The reference ingests documents one-per-request (cli/app.rs); at
  * 100 TB the same documents arrive as WARC members, so this is the S1
  * scan surface a web-scale deployment actually mounts. Parsing is
  * per-blob and allocation-bounded (declared lengths are validated
  * against the remaining buffer before any copy).
  */
object Warc {

  final case class Record(recordType: String, uri: String,
                          payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Serialize records: minimal conformant header set per record. */
  def build(records: Seq[Record]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      // Header values are interpolated into the CRLF-framed block: a CR/LF
      // inside one would inject a bogus header boundary and mis-frame every
      // record after it, so reject structured instead.
      Seq("WARC-Type" -> r.recordType, "WARC-Target-URI" -> r.uri).foreach {
        case (n, v) => require(!v.exists(c => c == '\r' || c == '\n'),
          s"$n value contains CR/LF")
      }
      val header =
        s"WARC/1.0$Crlf" +
        s"WARC-Type: ${r.recordType}$Crlf" +
        s"WARC-Target-URI: ${r.uri}$Crlf" +
        s"Content-Length: ${r.payload.length}$Crlf" +
        Crlf
      out.write(header.getBytes("UTF-8"))
      out.write(r.payload)
      out.write(s"$Crlf$Crlf".getBytes("UTF-8"))
    }
    out.toByteArray
  }

  /** Parse a WARC blob into its records. Strict on framing (magic,
    * Content-Length presence and bounds, record trailer) — corrupt
    * archives fail structured, never mis-frame.
    */
  def parse(bytes: Array[Byte]): Seq[Record] = {
    val records = Seq.newBuilder[Record]
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
             !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length, "unterminated header line")
      val s = new String(bytes, start, pos - start, "UTF-8")
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val magic = line()
      require(magic == "WARC/1.0", s"bad record magic '$magic'")
      var recordType = ""; var uri = ""; var contentLength = -1L
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"malformed header '$h'")
        val name = h.substring(0, i).trim.toLowerCase
        val value = h.substring(i + 1).trim
        name match {
          case "warc-type" => recordType = value
          case "warc-target-uri" => uri = value
          case "content-length" =>
            contentLength = value.toLongOption.getOrElse(
              throw new IllegalArgumentException(s"bad Content-Length '$value'"))
          case _ => () // tolerate extra headers (WARC-Date, record ids…)
        }
        h = line()
      }
      require(contentLength >= 0, "missing Content-Length")
      require(contentLength <= bytes.length - pos,
        s"Content-Length $contentLength exceeds remaining ${bytes.length - pos}")
      val payload = java.util.Arrays.copyOfRange(
        bytes, pos, pos + contentLength.toInt)
      pos += contentLength.toInt
      require(pos + 4 <= bytes.length &&
        bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        "missing record trailer")
      pos += 4
      records += Record(recordType, uri, payload)
    }
    records.result()
  }
}
