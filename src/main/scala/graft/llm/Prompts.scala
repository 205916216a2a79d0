package graft.llm

import graft.core.ReasoningStrategy

/** Prompt assembly, behavior-parity with the reference's formatter layer
  * (lotus/templates/task_instructions.py:11-329). The exact template strings
  * matter: they drive output parity with the reference for the same model.
  */
object Prompts {

  def cotFormatter(reasoning: String, answer: String): String =
    s"Reasoning:\n$reasoning\n\nAnswer: $answer"

  def answerOnlyFormatter(answer: String): String = s"Answer: $answer"

  def cotPromptFormatter(reasoningInstructions: String = "", answerInstructions: String = ""): String = {
    val r = s"<Your reasoning here. $reasoningInstructions>"
    val a = s"<Your answer here. $answerInstructions>"
    s"""Let's think step by step. Use the following format to provide your answer:
        ${cotFormatter(r, a)}
        """
  }

  def nonCotPromptFormatter(answerInstructions: String = ""): String = {
    val a = s"<Your answer here. $answerInstructions>"
    s"""Use the following format to provide your answer:
            ${answerOnlyFormatter(a)}
            """
  }

  /** `Context:\n<doc>\n\n<tag>` user message (task_instructions.py:69-87). */
  def userMessage(doc: String, instructionWithTag: String): ChatMessage =
    ChatMessage("user", s"Context:\n$doc\n\n$instructionWithTag")

  def userMessageNoTag(doc: String): ChatMessage =
    ChatMessage("user", s"Context:\n$doc\n\nnull")

  /** One few-shot example: (serialized doc, assistant answer, optional CoT). */
  final case class Example(doc: String, answer: String, cot: Option[String] = None)

  def filterFormatter(
      doc: String,
      userInstruction: String,
      examples: Seq[Example] = Nil,
      strategy: ReasoningStrategy = ReasoningStrategy.Default,
      systemPrompt: Option[String] = None,
      outputTokens: (String, String) = ("True", "False")
  ): Seq[ChatMessage] = {
    val (pos, neg) = outputTokens
    val answerInstructions = s"The answer should be either $pos or $neg"
    val defaultSys =
      """The user will provide a claim and some relevant context.
    Your job is to determine whether the claim is true for the given context.
     """
    var sys = systemPrompt.getOrElse(defaultSys)
    if (strategy == ReasoningStrategy.Cot || strategy == ReasoningStrategy.ZsCot)
      sys += cotPromptFormatter(answerInstructions = answerInstructions)
    else if (systemPrompt.isEmpty)
      sys += nonCotPromptFormatter(answerInstructions = answerInstructions)

    val b = Vector.newBuilder[ChatMessage]
    b += ChatMessage("system", sys)
    examples.foreach { ex =>
      val token = if (ex.answer.toLowerCase == pos.toLowerCase || ex.answer == "true") pos else neg
      val content = ex.cot match {
        case Some(c)                                  => cotFormatter(c, token)
        case None if strategy == ReasoningStrategy.Cot => cotFormatter("Reasoning omitted", token)
        case None                                     => answerOnlyFormatter(token)
      }
      b += userMessage(ex.doc, s"Claim: $userInstruction")
      b += ChatMessage("assistant", content)
    }
    b += userMessage(doc, s"Claim: $userInstruction")
    b.result()
  }

  def mapFormatter(
      doc: String,
      userInstruction: String,
      examples: Seq[Example] = Nil,
      strategy: ReasoningStrategy = ReasoningStrategy.Default,
      systemPrompt: Option[String] = None
  ): Seq[ChatMessage] = {
    val hasCot = examples.exists(_.cot.isDefined)
    val sys = systemPrompt.getOrElse {
      if (hasCot)
        "The user will provide an instruction and some relevant context.\n" +
          "Your job is to answer the user's instruction given the context." +
          "You must give your reasoning and then your final answer"
      else if (strategy == ReasoningStrategy.ZsCot)
        "The user will provide an instruction and some relevant context.\n" +
          "Your job is to answer the user's instruction given the context." +
          "First give your reasoning. Then you MUST end your output with \"Answer: your answer\""
      else
        "The user will provide an instruction and some relevant context.\n" +
          "Your job is to answer the user's instruction given the context."
    }
    val b = Vector.newBuilder[ChatMessage]
    b += ChatMessage("system", sys)
    examples.foreach { ex =>
      b += userMessage(ex.doc, s"Instruction: $userInstruction")
      b += ChatMessage("assistant", ex.cot match {
        case Some(c) => s"Reasoning:\n$c\n\nAnswer: ${ex.answer}"
        case None    => ex.answer
      })
    }
    b += userMessage(doc, s"Instruction: $userInstruction")
    b.result()
  }

  def extractFormatter(
      doc: String,
      outputCols: Seq[(String, Option[String])],
      extractQuotes: Boolean = false,
      strategy: ReasoningStrategy = ReasoningStrategy.Default
  ): Seq[ChatMessage] = {
    val names = outputCols.map(_._1)
    val withDesc = outputCols.map { case (c, d) => c -> d.getOrElse(c) }
    val quoteFields = if (extractQuotes) names.map(c => s"${c}_quote") else Nil
    val fieldsStr = (names ++ quoteFields).mkString(", ")
    val descStr = withDesc.map { case (k, v) => s"'$k': '$v'" }.mkString("{", ", ", "}")
    val sys =
      if (extractQuotes)
        "The user will provide the columns that need to be extracted and some relevant context.\n" +
          s"Your job is to extract these columns and provide only a concise value for each field " +
          s"and the corresponding full quote for each field in the '${quoteFields.mkString(", ")}' fields.\n" +
          s"Here is a description of each field: $descStr\n" +
          s"The response should be valid JSON format with the following fields: $fieldsStr.\n"
      else
        "The user will provide the columns that need to be extracted and some relevant context.\n" +
          s"Your job is to extract these columns and provide only a concise value for each field.\n" +
          s"Here is a description of each field: $descStr\n" +
          s"The response should be valid JSON format with the following fields: $fieldsStr.\n"
    val cot =
      if (strategy == ReasoningStrategy.Cot || strategy == ReasoningStrategy.ZsCot)
        "\n" + cotPromptFormatter(
          "Think through each extraction step by step.",
          s"Provide the JSON response with fields: $fieldsStr")
      else ""
    Vector(ChatMessage("system", sys + cot), userMessageNoTag(doc))
  }

  /** sem_agg fold prompts (leaf vs node), mirroring the reference's
    * aggregation templates (lotus/sem_ops/sem_agg.py:62-160): leaf rounds see
    * raw documents, upper rounds see prior partial summaries.
    */
  def aggFormatter(docs: Seq[String], userInstruction: String, isLeaf: Boolean): Seq[ChatMessage] = {
    val kind = if (isLeaf) "documents" else "partial summaries"
    val sys =
      s"Your job is to provide an answer to the user's instruction given the context below from multiple $kind.\n" +
        "Remember that your job is to answer the user's instruction by combining all relevant information from all provided documents, into a single coherent answer.\n" +
        "Do NOT copy the format of the source documents, instead provide your answer in a coherent, well-structured manner that best answers the instruction.\n"
    val ctx = docs.mkString("\n")
    Vector(
      ChatMessage("system", sys),
      userMessage(ctx, s"Instruction: $userInstruction"))
  }

  /** sem_topk pairwise comparison (lotus/sem_ops/sem_topk.py:16-80). */
  def compareFormatter(doc1: String, doc2: String, userInstruction: String,
      strategy: ReasoningStrategy = ReasoningStrategy.Default): Seq[ChatMessage] = {
    val sys =
      "Your job is to to select and return the most relevant document to the user's question.\n" +
        "Respond only with the label of the document such as \"Document NUMBER\".\n" +
        "NUMBER must be either 1 or 2, depending on which document is most relevant.\n" +
        "You must pick a number and cannot say things like \"None\" or \"Neither\""
    val user =
      s"Question: $userInstruction\n\nDocument 1:\n$doc1\n\nDocument 2:\n$doc2"
    Vector(ChatMessage("system", sys), ChatMessage("user", user))
  }
}
