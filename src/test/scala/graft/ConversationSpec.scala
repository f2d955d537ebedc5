package graft

import graft.conversation.{Collapse, Templates}
import org.scalatest.funsuite.AnyFunSuite

/** Chat-history collapse (P8+T5) + template registry (§2.10) — unit
  * mirrors of the reference's semantics
  * (server/generation.rs:191-256; conversation/mod.rs:16-256;
  * tests/conversation_templates.rs:3-18).
  */
class ConversationSpec extends AnyFunSuite {

  import Collapse.{Message, Part}

  test("collapse keeps system-before-last-user + last user; drops the rest") {
    val msgs = Seq(
      Message("system", Seq(Part("text", "rules"))),
      Message("user", Seq(Part("text", "old question"))),
      Message("assistant", Seq(Part("text", "old answer"))),
      Message("System", Seq(Part("text", "more rules"))), // case-insensitive
      Message("USER", Seq(Part("text", "final question"))),
      Message("system", Seq(Part("text", "after — dropped"))))
    val c = Collapse.collapse(msgs).get
    assert(c.prompt ==
      "<|User|>\nrules\n\nmore rules\n\nfinal question\n<|Assistant|>\n")
    assert(c.n_sections == 3)
    assert(!c.prompt.contains("old"))
    assert(!c.prompt.contains("after"))
  }

  test("parts flatten in reverse; empty text dropped; images collected in order") {
    val (text, imgs) = Collapse.flattenParts(Seq(
      Part("text", "caption"), Part("image", "img://1/0"),
      Part("text", "intro"), Part("image", "img://1/1")))
    // reversed: img1, intro, img0, caption; images append with no
    // preceding newline (generation.rs:245-252 — only text parts prepend
    // one onto a non-empty buffer)
    assert(text == "<image>\nintro<image>\ncaption")
    assert(imgs == Seq("img://1/1", "img://1/0"))

    val msgs = Seq(
      Message("system", Seq(Part("text", "   "))), // empty after trim
      Message("user", Seq(Part("image", "img://2/0"))))
    val c = Collapse.collapse(msgs).get
    // image-only user turn: body is "<image>"
    assert(c.prompt == "<|User|>\n<image>\n<|Assistant|>\n")
    assert(c.n_sections == 1)
    assert(c.images == Seq("img://2/0"))
  }

  test("collapse with no user message is an error (None)") {
    assert(Collapse.collapse(Seq(
      Message("system", Seq(Part("text", "only sys"))))).isEmpty)
    assert(Collapse.collapse(Nil).isEmpty)
  }

  test("deepseek template renders markers and EOS separator (ref test mirror)") {
    val t = Templates.get("deepseek").get
    val prompt = t.prompt(Seq(
      (t.roles._1, Some("Hello!")),
      (t.roles._2, Some("Hi! This is Tony.")),
      (t.roles._1, Some("Who are you?")),
      (t.roles._2, Some("I am a helpful assistant.")),
      (t.roles._1, Some("How are you?")),
      (t.roles._2, None)))
    assert(prompt.contains("Hello!"))
    assert(prompt.contains(Templates.EosSentinel))
    assert(prompt.endsWith("<|Assistant|>:")) // None cue: bare role, no sep
  }

  test("{system_message} interpolation + empty-system skip") {
    val t = Templates.deepseekTemplate.withSystemMessage("be terse")
    val p = t.prompt(Seq((t.roles._1, Some("hi")), (t.roles._2, None)))
    assert(p.startsWith("be terse\n\n<|User|>: hi"))
    // empty system message -> no leading separator
    val p2 = Templates.deepseekTemplate.prompt(Seq((t.roles._1, Some("hi"))))
    assert(p2.startsWith("<|User|>: hi"))
  }

  test("plain + alignment styles") {
    val p = Templates.get("plain").get
    assert(p.prompt(Seq(("", Some("a")), ("", Some("b")))) == "ab")
    val a = Templates.get("alignment").get
    assert(a.prompt(Seq(("", Some("pix")), ("", Some("label")))) ==
      "<image>\nlabel")
  }

  test("registry: duplicate registration fails unless override") {
    Templates.resetRegistry()
    val custom = Templates.deepseekTemplate.copy(name = "custom-x")
    Templates.register(custom)
    assert(Templates.get("custom-x").isDefined)
    val e = intercept[IllegalStateException](Templates.register(custom))
    assert(e.getMessage.contains("has been registered"))
    Templates.register(custom.withSystemMessage("v2"), overrideExisting = true)
    assert(Templates.get("custom-x").get.systemMessage == "v2")
    val dup = intercept[IllegalStateException](
      Templates.register(Templates.deepseekTemplate))
    assert(dup.getMessage.startsWith("deepseek"))
    Templates.resetRegistry()
  }

  test("derived conversation exercises every collapse rule") {
    // id 30: %2=0 (sys image), %3=0 (user image), %5=0 (late sys)
    val msgs = Collapse.deriveConversation(30L, "w0 w1 w2 w3 w4")
    val c = Collapse.collapse(msgs).get
    assert(c.prompt ==
      "<|User|>\nsys w0\n\n<image>\nw2\n\n<image>\nq w3\n<|Assistant|>\n")
    assert(c.images == Seq("img://30/0", "img://30/q"))
    // id 7: %7=0 adds an empty system message — dropped, sections still 3
    val c7 = Collapse.collapse(
      Collapse.deriveConversation(7L, "a b c d e")).get
    assert(c7.n_sections == 3)
    assert(c7.prompt == "<|User|>\nsys a\n\nc\n\nq d\n<|Assistant|>\n")
  }
}
