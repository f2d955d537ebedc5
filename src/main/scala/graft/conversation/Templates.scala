package graft.conversation

/** Conversation-template registry + prompt render — the reference's
  * template surface (/root/reference/crates/core/src/conversation/
  * mod.rs:16-256): a named registry of templates (duplicate registration
  * panics unless `overrideExisting`), `{system_message}` interpolation in
  * the system template, and four separator styles whose render rules are
  * mirrored exactly:
  *
  *  - DeepSeek (mod.rs:63-88): optional system prompt + sep[0]; each
  *    message with non-empty trimmed content renders `role: content` +
  *    sep[idx % 2]; a None/empty message renders `role:` with no sep
  *    (the generation cue).
  *  - DeepSeekV2 (mod.rs:90-113): user turns wrapped in `<｜sft▁begin｜>`,
  *    assistant turns followed by sep2.
  *  - Plain (mod.rs:115-126): bare contents + alternating seps.
  *  - Alignment (mod.rs:128-147): even turns replaced by `<image>\n`.
  *
  * Registry mutation is test-surface only; at pipeline scale templates
  * are resolved once on the driver and the render runs as a pure
  * per-row function (broadcast-free: templates are a handful of strings).
  */
object Templates {

  sealed trait SepStyle
  case object DeepSeek extends SepStyle
  case object DeepSeekV2 extends SepStyle
  case object Plain extends SepStyle
  case object Alignment extends SepStyle

  val EosSentinel = "<｜end▁of▁sentence｜>"

  final case class ConvTemplate(
      name: String,
      systemTemplate: String,
      systemMessage: String,
      roles: (String, String),
      sepStyle: SepStyle,
      sep: String,
      sep2: String,
      stopStr: Seq[String]) {

    def withSystemMessage(msg: String): ConvTemplate =
      copy(systemMessage = msg)

    /** Render a prompt for `messages` (role, optional content) — exact
      * mirror of ConversationTemplate::get_prompt.
      */
    def prompt(messages: Seq[(String, Option[String])]): String = {
      val seps = Array(sep, sep2)
      def trimmed(m: Option[String]): Option[String] =
        m.map(_.trim).filter(_.nonEmpty)
      val sb = new StringBuilder
      sepStyle match {
        case DeepSeek =>
          val sys = systemTemplate.replace("{system_message}", systemMessage)
          if (sys.nonEmpty) { sb.append(sys); sb.append(seps(0)) }
          messages.zipWithIndex.foreach { case ((role, msg), idx) =>
            trimmed(msg) match {
              case Some(content) =>
                sb.append(role).append(": ").append(content).append(seps(idx % 2))
              case None => sb.append(role).append(':')
            }
          }
        case DeepSeekV2 =>
          val sys = systemTemplate.replace("{system_message}", systemMessage)
          if (sys.nonEmpty) { sb.append(sys); sb.append(seps(0)) }
          messages.foreach { case (role, msg) =>
            trimmed(msg).foreach { content =>
              if (role == "User") {
                sb.append("<｜sft▁begin｜>\n").append(content).append(seps(0))
              } else sb.append(content).append(seps(1))
            }
          }
        case Plain =>
          messages.zipWithIndex.foreach { case ((_, msg), idx) =>
            trimmed(msg).foreach(c => sb.append(c).append(seps(idx % 2)))
          }
        case Alignment =>
          messages.zipWithIndex.foreach { case ((_, msg), idx) =>
            trimmed(msg).foreach { c =>
              if (idx % 2 == 0) sb.append("<image>\n").append(seps(idx % 2))
              else sb.append(c).append(seps(idx % 2))
            }
          }
      }
      sb.toString
    }
  }

  def deepseekTemplate: ConvTemplate = ConvTemplate(
    name = "deepseek",
    systemTemplate = "{system_message}",
    systemMessage = "",
    roles = ("<|User|>", "<|Assistant|>"),
    sepStyle = DeepSeek,
    sep = "\n\n",
    sep2 = EosSentinel,
    stopStr = Seq("User:", EosSentinel))

  def deepseekV2Template: ConvTemplate = ConvTemplate(
    name = "deepseekv2",
    systemTemplate = "{system_message}",
    systemMessage = "",
    roles = ("<｜User｜>", "<｜Assistant｜>"),
    sepStyle = DeepSeek,
    sep = "",
    sep2 = EosSentinel,
    stopStr = Seq("User:", EosSentinel))

  def plainTemplate: ConvTemplate = ConvTemplate(
    name = "plain",
    systemTemplate = "",
    systemMessage = "",
    roles = ("", ""),
    sepStyle = Plain,
    sep = "",
    sep2 = "",
    stopStr = Seq("</s>"))

  def alignmentTemplate: ConvTemplate = ConvTemplate(
    name = "alignment",
    systemTemplate = "",
    systemMessage = "",
    roles = ("", ""),
    sepStyle = Alignment,
    sep = "",
    sep2 = "",
    stopStr = Seq("</s>"))

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ConvTemplate]()
  resetRegistry()

  /** Restore the four built-ins (test isolation helper). */
  def resetRegistry(): Unit = {
    registry.clear()
    Seq(deepseekTemplate, deepseekV2Template, plainTemplate,
      alignmentTemplate).foreach(t => registry.put(t.name, t))
  }

  /** register_conv_template semantics (mod.rs:180-190): duplicate names
    * fail loudly unless `overrideExisting`.
    */
  def register(template: ConvTemplate, overrideExisting: Boolean = false): Unit = {
    if (!overrideExisting && registry.containsKey(template.name))
      throw new IllegalStateException(s"${template.name} has been registered")
    registry.put(template.name, template)
  }

  def get(name: String): Option[ConvTemplate] = Option(registry.get(name))
}
