package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{NLExpr, Serialize, SerializationFormat}
import graft.llm.{ChatMessage, DocParse, LMRequest, Prompts}

class CoreSpec extends AnyFunSuite {

  test("NLExpr parses placeholders, skips escaped braces") {
    val e = NLExpr.parse("This is a {test} string with {variable} and {{escaped}}.")
    assert(e.cols == Seq("test", "variable"))
  }

  test("NLExpr rejects expressions without columns") {
    assertThrows[IllegalArgumentException](NLExpr.parse("no placeholders here"))
  }

  test("NLExpr instruction capitalizes column names") {
    val e = NLExpr.parse("the {Course Name} is about {topic}")
    assert(e.instruction == "the Course name is about Topic")
  }

  test("substitute unescapes doubled braces") {
    assert(NLExpr.substitute("a {x} {{literal}}", Map("x" -> "B")) == "a B {literal}")
  }

  test("DEFAULT serialization matches the reference format") {
    val s = Serialize.defaultRow(Seq("Course Name", "n"), Seq("Cooking", 7))
    assert(s == "[Course name]: «Cooking»\n[N]: «7»\n")
  }

  test("null renders as None (pandas parity)") {
    assert(Serialize.defaultRow(Seq("a"), Seq(null)) == "[A]: «None»\n")
  }

  test("JSON serialization") {
    assert(Serialize.jsonRow(Seq("a", "b"), Seq("x\"y", 3)) == """{"a":"x\"y","b":3}""")
  }

  test("XML serialization strips special chars from names") {
    assert(Serialize.xmlRow(Seq("a b!", "c"), Seq("<v>", null)) ==
      "<row><ab>&lt;v&gt;</ab><c/></row>")
  }

  test("filter prompt has system + claim-tagged user message") {
    val msgs = Prompts.filterFormatter("[Text]: «hi»\n", "the Text is a greeting")
    assert(msgs.head.role == "system")
    assert(msgs.head.content.contains("claim"))
    assert(msgs.last.content ==
      "Context:\n[Text]: «hi»\n\n\nClaim: the Text is a greeting")
  }

  test("few-shot examples appear as message pairs") {
    val msgs = Prompts.filterFormatter("[T]: «x»\n", "claim",
      examples = Seq(Prompts.Example("[T]: «ex»\n", "True")))
    assert(msgs.length == 4)
    assert(msgs(1).role == "user" && msgs(2).role == "assistant")
    assert(msgs(2).content == "Answer: True")
  }

  test("LMRequest.context extracts the doc between Context and tag") {
    val req = LMRequest(Seq(ChatMessage("user", "Context:\n[A]: «1»\n\n\nClaim: c")))
    assert(req.context == "[A]: «1»\n")
    assert(DocParse.fields(req.context) == Map("A" -> "1"))
  }

  test("DocParse handles multi-line values") {
    assert(DocParse.allValues("[S]: «a\nb»\n[S]: «c»\n") == Seq("a\nb", "c"))
  }
}
