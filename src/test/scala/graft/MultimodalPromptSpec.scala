package graft

import org.apache.spark.sql.functions._
import graft.core.Sem
import graft.functions.MultimodalOps
import graft.llm._

/** Image columns end-to-end: metadata tag → executor-side ref resolution →
  * LMRequest.images → OpenAI content-parts (reference context_formatter /
  * user_message_formatter, task_instructions.py:40-84).
  */
class MultimodalPromptSpec extends SparkSpec {
  import spark.implicits._

  test("toImageUrl resolves base64 / data / file refs") {
    val b64 = java.util.Base64.getEncoder.encodeToString("PIXELS".getBytes("UTF-8"))
    assert(MultimodalOps.toImageUrl(s"base64:$b64", null) == s"data:image/png;base64,$b64")
    assert(MultimodalOps.toImageUrl(b64, null) == s"data:image/png;base64,$b64")
    assert(MultimodalOps.toImageUrl("data:image/jpeg;base64,xyz", null) == "data:image/jpeg;base64,xyz")
    assert(MultimodalOps.toImageUrl("https://x.test/i.png", null) == "https://x.test/i.png")
    val tmp = java.nio.file.Files.createTempFile("graftimg", ".png")
    java.nio.file.Files.write(tmp, "FILEBYTES".getBytes("UTF-8"))
    val fb64 = java.util.Base64.getEncoder.encodeToString("FILEBYTES".getBytes("UTF-8"))
    assert(MultimodalOps.toImageUrl(s"file://$tmp", null) == s"data:image/png;base64,$fb64")
  }

  test("golden: OpenAICompatLM emits content parts for image requests") {
    val lm = OpenAICompatLM("http://localhost:0/v1/chat/completions", "test-model")
    val req = LMRequest(
      Seq(ChatMessage("system", "sys"),
        ChatMessage("user", "Context:\n[Text]: «hello»\n\n\nClaim: it is an image")),
      images = Map("Img" -> "data:image/png;base64,QUJD"))
    val json = lm.toJson(req)
    // Content-part layout mirrors user_message_formatter: context text part,
    // "[Name]: \n" label part, image_url part, instruction-tag part.
    assert(json.contains(""""content":[{"type":"text","text":"Context:\n[Text]: «hello»\n"}"""),
      json)
    assert(json.contains(""""type":"text","text":"[Img]: \n""""), json)
    assert(json.contains(""""type":"image_url","image_url":{"url":"data:image/png;base64,QUJD"}"""),
      json)
    assert(json.contains(""""text":"\n\nClaim: it is an image"""), json)
    // The system message stays a plain string.
    assert(json.contains(""""role":"system","content":"sys""""), json)
  }

  test("semMap over a tagged image column ships images to the model") {
    val b64 = java.util.Base64.getEncoder.encodeToString("IMAGEBYTES".getBytes("UTF-8"))
    val df = MultimodalOps.tagImage(
      Seq((1L, b64, "caption one")).toDF("id", "img", "caption"), "img")
    val out = Sem.withLM(FakeLM(FakeBehavior.ImagePayloadLen)) {
      df.semMap("describe the {img} with {caption}")
    }
    val got = out.select("_map").as[String].head()
    assert(got.toInt == s"data:image/png;base64,$b64".length)
    // The text side still serializes the non-image column only.
    val out2 = Sem.withLM(FakeLM(FakeBehavior.Echo)) {
      df.semMap("describe the {img} with {caption}")
    }
    val ctx = out2.select("_map").as[String].head()
    assert(ctx.contains("[Caption]: «caption one»"))
    assert(!ctx.contains(b64))
  }
}
