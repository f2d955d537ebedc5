package graft.conversation

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Chat-history collapse — the reference's multi-turn pruning
  * (/root/reference/crates/server/src/generation.rs:191-256
  * `convert_messages` + `flatten_content`): the OCR model is single-turn,
  * so a request's message history collapses to
  *
  *   - system messages BEFORE the latest user turn (in order), then
  *   - the latest user turn itself (found by reverse position — T5);
  *     assistant turns and anything after the last user turn are dropped
  *     (P8: message-role predicate);
  *
  * each kept message's parts flattened in REVERSE order (images become
  * `<image>` placeholders, text parts joined with a newline onto a
  * non-empty buffer), trimmed, empty results dropped (P7), and the
  * surviving sections rendered as
  *
  *   <|User|>\n  body(sections joined by \n\n)\n  <|Assistant|>\n
  *
  * (the trailing newline after the body only when the body is non-empty
  * and does not already end with one — generation.rs:226-234).
  *
  * All per-conversation: a narrow map over one row's message array — no
  * shuffle, scales with the scan.
  */
object Collapse {

  final case class Part(ptype: String, content: String) // "text" | "image"
  final case class Message(role: String, parts: Seq[Part])
  final case class Collapsed(prompt: String, images: Seq[String],
                             n_sections: Int)

  /** flatten_content: parts in REVERSE; image → "<image>" placeholder +
    * collected ref; text → newline-joined onto a non-empty buffer; trim.
    */
  def flattenParts(parts: Seq[Part]): (String, Seq[String]) = {
    val buf = new StringBuilder
    val images = Seq.newBuilder[String]
    parts.reverseIterator.foreach {
      case Part("image", ref) =>
        buf.append("<image>")
        images += ref
      case Part(_, text) =>
        if (buf.nonEmpty) buf.append('\n')
        buf.append(text)
    }
    (buf.toString.trim, images.result())
  }

  /** Collapse one conversation's history. Returns None when there is no
    * user message (the reference's BadRequest).
    */
  def collapse(messages: Seq[Message]): Option[Collapsed] = {
    val lastUser = messages.lastIndexWhere(_.role.equalsIgnoreCase("user"))
    if (lastUser < 0) return None
    val sections = Seq.newBuilder[String]
    val images = Seq.newBuilder[String]
    var nSections = 0
    messages.iterator.take(lastUser)
      .filter(_.role.equalsIgnoreCase("system"))
      .foreach { m =>
        val (text, imgs) = flattenParts(m.parts)
        if (text.nonEmpty) { sections += text; nSections += 1 }
        images ++= imgs
      }
    val (userText, userImgs) = flattenParts(messages(lastUser).parts)
    if (userText.nonEmpty) { sections += userText; nSections += 1 }
    images ++= userImgs
    val imgList = images.result()
    val body = sections.result().mkString("\n\n")
    if (body.isEmpty && imgList.isEmpty) return None
    val sb = new StringBuilder("<|User|>\n")
    if (body.nonEmpty) {
      sb.append(body)
      if (!body.endsWith("\n")) sb.append('\n')
    }
    sb.append("<|Assistant|>\n")
    Some(Collapsed(sb.toString, imgList, nSections))
  }

  /** Deterministic multi-turn conversation derived from one document row
    * (same oracle-reproducible discipline as CorpusDerive): exercises an
    * early user turn (dropped), an assistant turn (dropped), system turns
    * before the last user turn (kept, one with an image part flattened in
    * reverse), an empty system message (dropped by the P7 filter), the
    * final user turn (kept, image on doc_id % 3 == 0), and a system turn
    * AFTER the last user turn (dropped by the T5 truncation).
    */
  def deriveConversation(id: Long, text: String): Seq[Message] = {
    val ws = text.split(" ").filter(_.nonEmpty)
    def w(i: Int): String = if (i < ws.length) ws(i) else ""
    val b = Seq.newBuilder[Message]
    b += Message("system", Seq(Part("text", s"sys ${w(0)}")))
    b += Message("user", Seq(Part("text", s"old ${w(1)}")))
    b += Message("assistant", Seq(Part("text", "ignored answer")))
    if (id % 7 == 0) b += Message("system", Seq(Part("text", "  ")))
    if (id % 2 == 0)
      b += Message("system",
        Seq(Part("text", w(2)), Part("image", s"img://$id/0")))
    else b += Message("system", Seq(Part("text", w(2))))
    if (id % 3 == 0)
      b += Message("user",
        Seq(Part("text", s"q ${w(3)}"), Part("image", s"img://$id/q")))
    else b += Message("user", Seq(Part("text", s"q ${w(3)}")))
    if (id % 5 == 0) b += Message("system", Seq(Part("text", "late sys")))
    b.result()
  }

  /** Driver query: collapse every derived conversation.
    * Output (conv_id, prompt, n_sections, n_images).
    */
  def collapseQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val c = collapse(deriveConversation(id, text)).get
        (id, c.prompt, c.n_sections.toLong, c.images.length.toLong)
      }
      .toDF("conv_id", "prompt", "n_sections", "n_images")
  }
}
