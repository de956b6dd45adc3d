package graft.sources

/** Minimal HTML extraction for fetched pages (SURVEY S11 tail: the
  * reference's `fetchHTML` returns a `cheerio.load(html)` document —
  * `lib.ts:47-62` — whose consumer surface is selector text, link
  * hrefs and page text). This is that surface as a dependency-free
  * linear scanner: one pass, no DOM allocation, no regex backtracking
  * — the shape that runs safely inside a fetch task over millions of
  * pages (a crafted page can blow up a backtracking parser; a linear
  * scanner can't).
  *
  * Handled: comments, <!doctype>/<? ... ?>, quoted/unquoted/bare
  * attributes, self-closing tags, script/style/CDATA content
  * exclusion, nested same-name tags in [[selectText]], named +
  * numeric (dec/hex) entity decoding, whitespace normalization.
  * Not a validator: malformed input degrades to best-effort text,
  * never to an exception.
  */
object Html {

  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode named + numeric character references; unknown ones pass
    * through verbatim (browser behavior for unrecognized text).
    */
  def decodeEntities(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi > i && semi - i <= 10) s.substring(i + 1, semi)
        else ""
        val decoded: Option[String] =
          if (body.isEmpty) None
          else if (body.startsWith("#x") || body.startsWith("#X"))
            scala.util.Try(
              new String(Character.toChars(
                Integer.parseInt(body.substring(2), 16)))).toOption
          else if (body.startsWith("#"))
            scala.util.Try(
              new String(Character.toChars(
                Integer.parseInt(body.substring(1))))).toOption
          else entities.get(body)
        decoded match {
          case Some(d) => out.append(d); i = semi + 1
          case None => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One scanned event: either a tag (with parsed attributes) or a
    * text run. `close` marks `</name>`; void/self-closing tags emit
    * open-only.
    */
  sealed trait Event
  case class TagEvent(name: String, attrs: Map[String, String],
                      close: Boolean) extends Event
  case class TextEvent(text: String) extends Event

  /** Linear scan of the markup into events. Content of script/style
    * is suppressed (cheerio's `.text()` likewise excludes script
    * bodies from page text extraction in the common usage).
    */
  def scan(html: String): Seq[Event] = {
    val events = scala.collection.mutable.ArrayBuffer.empty[Event]
    val n = html.length
    val lower = html.toLowerCase // once: raw-content scans stay O(n)
    var i = 0
    var rawUntil: String = null // inside <script>/<style>: skip to this
    val text = new StringBuilder
    def flushText(): Unit = if (text.nonEmpty) {
      events += TextEvent(decodeEntities(text.toString)); text.clear()
    }
    while (i < n) {
      if (rawUntil != null) {
        val end = lower.indexOf(rawUntil, i)
        i = if (end < 0) n else end // the </tag> then parses as an event
        rawUntil = null
      } else if (html.charAt(i) == '<' && i + 1 < n) {
        flushText()
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
          val end = html.indexOf('>', i)
          i = if (end < 0) n else end + 1
        } else {
          val close = html.charAt(i + 1) == '/'
          var j = i + (if (close) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit ||
            html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (name.isEmpty) { text.append('<'); i += 1 }
          else {
            // attributes up to the (quote-respecting) tag end
            val attrs = scala.collection.mutable.Map.empty[String, String]
            var selfClosing = false
            var done = false
            while (j < n && !done) {
              val c = html.charAt(j)
              if (c == '>') { done = true; j += 1 }
              else if (c == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
                selfClosing = true; done = true; j += 2
              } else if (c.isWhitespace) j += 1
              else {
                val aStart = j
                while (j < n && !html.charAt(j).isWhitespace &&
                  html.charAt(j) != '=' && html.charAt(j) != '>' &&
                  html.charAt(j) != '/') j += 1
                if (j == aStart) j += 1 // lone '/': skip as garbage
                val aName =
                  if (j == aStart + 1 && html.charAt(aStart) == '/') ""
                  else html.substring(aStart, j).toLowerCase
                var aVal = ""
                if (aName.nonEmpty && j < n && html.charAt(j) == '=') {
                  j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j); j += 1
                    val vStart = j
                    while (j < n && html.charAt(j) != q) j += 1
                    aVal = html.substring(vStart, j)
                    if (j < n) j += 1
                  } else {
                    val vStart = j
                    while (j < n && !html.charAt(j).isWhitespace &&
                      html.charAt(j) != '>') j += 1
                    aVal = html.substring(vStart, j)
                  }
                }
                if (aName.nonEmpty) attrs(aName) = decodeEntities(aVal)
              }
            }
            // HTML5 tokenizer: a tag unterminated at EOF is dropped
            if (done) {
              events += TagEvent(name, attrs.toMap, close)
              if (!close && !selfClosing &&
                (name == "script" || name == "style"))
                rawUntil = s"</$name"
            }
            i = j
          }
        }
      } else { text.append(html.charAt(i)); i += 1 }
    }
    flushText()
    events.toSeq
  }

  /** Page text: all non-script/style text runs, whitespace-normalized
    * — the `$.text()` consumer.
    */
  def text(html: String): String =
    scan(html).collect { case TextEvent(t) => t }
      .mkString(" ").split("\\s+").filter(_.nonEmpty).mkString(" ")

  /** All `<a href>` values in document order — the `$('a')` + href
    * consumer.
    */
  def links(html: String): Seq[String] =
    scan(html).collect {
      case TagEvent("a", attrs, false) if attrs.contains("href") =>
        attrs("href")
    }

  /** `<title>` text, if any. */
  def title(html: String): Option[String] =
    selectText(html, "title").headOption

  /** Text content of every `name` element (nesting-aware: a nested
    * same-name tag's text belongs to the OUTERMOST match, cheerio's
    * `.text()` semantics), whitespace-normalized per element.
    */
  def selectText(html: String, name: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val cur = new StringBuilder
    scan(html).foreach {
      case TagEvent(`name`, _, false) => depth += 1
      case TagEvent(`name`, _, true) if depth > 0 =>
        depth -= 1
        if (depth == 0) {
          out += cur.toString.split("\\s+").filter(_.nonEmpty)
            .mkString(" ")
          cur.clear()
        }
      case TextEvent(t) if depth > 0 => cur.append(t).append(' ')
      case _ => ()
    }
    out.toSeq
  }
}
