package graft.classify

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F8 — the real (remote) LLM decision fallback, executed out-of-plan
  * like [[graft.embed.HttpEmbedder]] is for F4: the production client
  * a user wiring live ingest needs for the reference's gpt-4o tail
  * (`/root/reference/extract_and_embed_v2.py:264-300` — model gpt-4o,
  * temperature 0.3, max_tokens 10, system prompt built from the C3
  * document context, response validated against the three-label enum).
  *
  * Scale shape fixes over the reference, same playbook as the
  * embedder client:
  *  - the fallback runs ONLY on rows the regex cascade left `invalid`
  *    ([[decideWithFallback]] filters first) — the reference calls its
  *    `determine_case_decision` tail per document inside the request
  *    thread whether or not a rule already matched the retry text;
  *  - rows stream through `mapPartitions`, so documents classify in
  *    parallel across the cluster (the chat API takes one prompt per
  *    request — no array input like `/embeddings` — so per-partition
  *    sequencing with cluster-wide fan-out is the batching unit);
  *  - transient statuses (408/429/5xx) retry with linear backoff;
  *    exhausted retries either coerce to `invalid` (default — the
  *    reference's `except` tail) or fail the task (`failClosed`,
  *    for pipelines where silently unclassified rows are worse).
  *
  * Enum validation matches [[Cascades.decisionWithFallback]]: any
  * response outside the three labels becomes `invalid`
  * (`extract_and_embed_v2.py:295-297`), so no remote model can widen
  * the label set. External-world I/O ⇒ NOT part of the deterministic
  * correctness surface (SURVEY §2 F8); unit-tested against a local
  * fake server like the embedder client.
  */
object HttpChatFallback {

  final case class Config(
      endpoint: String,
      model: String = "gpt-4o",
      apiKey: Option[String] = None,
      temperature: Double = 0.3,
      maxTokens: Int = 10,
      maxRetries: Int = 3,
      retryBackoffMs: Long = 200L,
      connectTimeoutMs: Int = 5000,
      readTimeoutMs: Int = 60000,
      failClosed: Boolean = false) {
    require(maxRetries >= 0, "maxRetries must be non-negative")
    require(maxTokens > 0, "maxTokens must be positive")
  }

  /** The prompt pair (test seam). The system prompt carries the C3
    * document context and pins the output enum; the user content is
    * the F7 conclusion section.
    */
  private[classify] def systemPrompt(docContext: String): String =
    s"You classify the outcome of a $docContext document for the appellant. " +
      s"Answer with exactly one of: ${DecisionRules.Won}, " +
      s"${DecisionRules.Lost}, ${DecisionRules.Invalid}."

  /** Decide every row of `docs` (id, conclusion, docContext) remotely →
    * (id, case_decision), enum-validated. Callers should pre-filter to
    * cascade-`invalid` rows; [[decideWithFallback]] does.
    */
  def decide(spark: SparkSession, docs: DataFrame, idCol: String,
             conclusionCol: String, contextCol: String,
             cfg: Config): DataFrame = {
    import spark.implicits._
    docs.selectExpr(s"CAST($idCol AS BIGINT)", conclusionCol, contextCol)
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, conclusion, context) =>
          (id, decideOne(Option(conclusion).getOrElse(""),
            Option(context).getOrElse(DecisionRules.GenericDocContext), cfg))
        }
      }
      .toDF(idCol, "case_decision")
  }

  /** The full ingest-service tail (`extract_and_embed_v2.py:340-343` +
    * `:264-300`) with the remote execution wired in: run the C1 regex
    * cascade over `textCol`; ONLY rows it leaves `invalid` build the
    * F7 conclusion + C3 context and go to the model; responses are
    * enum-validated and merged back. Matched rows never pay an RPC.
    */
  def decideWithFallback(spark: SparkSession, docs: DataFrame,
                         idCol: Column, textCol: Column,
                         cfg: Config): DataFrame = {
    val base = docs.select(idCol.cast("long").as("id"),
      Cascades.decision(textCol).as("__rule"),
      textCol.as("__text"))
    val needy = base.where(col("__rule") === DecisionRules.Invalid)
      .select(col("id"),
        Conclusion.extractCol(col("__text"), Cascades.docType(col("__text")))
          .as("__conclusion"),
        Cascades.docContext(col("__text")).as("__context"))
    val decided = decide(spark, needy, "id", "__conclusion", "__context", cfg)
      .select(col("id"), col("case_decision").as("__llm"))
    base.join(decided, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__llm"), col("__rule")).as("case_decision"))
  }

  /** One document's remote decision — the serving layer's per-upload
    * tail ([[graft.serve.CaseSearchService]] ingests one PDF per
    * request, so the driver-side single call IS the right granularity
    * there; batch pipelines use [[decideWithFallback]]).
    */
  def decideDocument(conclusion: String, docContext: String,
                     cfg: Config): String =
    decideOne(Option(conclusion).getOrElse(""),
      Option(docContext).getOrElse(DecisionRules.GenericDocContext), cfg)

  // Jackson is thread-safe after configuration; one instance per JVM.
  private lazy val mapper = new ObjectMapper()

  /** One chat-completions request with retries; coerces to `invalid`
    * on exhaustion unless `failClosed`.
    */
  private[classify] def decideOne(conclusion: String, context: String,
                                  cfg: Config): String = {
    val body = requestBytes(conclusion, context, cfg)
    var attempt = 0
    while (true) {
      try {
        return validated(postOnce(body, cfg))
      } catch {
        case _: RetryableFailure if attempt < cfg.maxRetries =>
          attempt += 1
          Thread.sleep(cfg.retryBackoffMs * attempt)
        case e: Exception =>
          if (!cfg.failClosed) return DecisionRules.Invalid
          throw new RuntimeException(
            s"chat fallback failed after $attempt retries", e)
      }
    }
    DecisionRules.Invalid // unreachable
  }

  /** Out-of-enum responses become `invalid`, exactly like the in-plan
    * validation in [[Cascades.decisionWithFallback]].
    */
  private[classify] def validated(raw: String): String = {
    val label = raw.trim.toLowerCase
    if (label == DecisionRules.Won || label == DecisionRules.Lost ||
      label == DecisionRules.Invalid) label
    else DecisionRules.Invalid
  }

  private[classify] def requestBytes(conclusion: String, context: String,
                                     cfg: Config): Array[Byte] = {
    val root = mapper.createObjectNode()
    root.put("model", cfg.model)
    root.put("temperature", cfg.temperature)
    root.put("max_tokens", cfg.maxTokens)
    val msgs = root.putArray("messages")
    val sys = msgs.addObject()
    sys.put("role", "system"); sys.put("content", systemPrompt(context))
    val usr = msgs.addObject()
    usr.put("role", "user"); usr.put("content", conclusion)
    mapper.writeValueAsBytes(root)
  }

  private final class RetryableFailure(msg: String) extends RuntimeException(msg)

  private def postOnce(body: Array[Byte], cfg: Config): String = {
    val conn = URI.create(cfg.endpoint).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(cfg.connectTimeoutMs)
      conn.setReadTimeout(cfg.readTimeoutMs)
      conn.setRequestProperty("Content-Type", "application/json")
      cfg.apiKey.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
      conn.setDoOutput(true)
      conn.getOutputStream.write(body)
      val status = conn.getResponseCode
      if (status == 408 || status == 429 || status >= 500)
        throw new RetryableFailure(s"transient status $status")
      if (status != 200)
        throw new RuntimeException(s"chat endpoint returned $status")
      parseResponse(conn.getInputStream)
    } finally conn.disconnect()
  }

  private def readAll(in: InputStream): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    var k = in.read(tmp)
    while (k >= 0) { buf.write(tmp, 0, k); k = in.read(tmp) }
    in.close()
    buf.toByteArray
  }

  /** `choices[0].message.content` of a chat-completions response. */
  private def parseResponse(in: InputStream): String = {
    val root = mapper.readTree(readAll(in))
    val choices = root.get("choices")
    require(choices != null && choices.isArray && choices.size > 0,
      "response carries no choices")
    val msg = choices.get(0).get("message")
    require(msg != null && msg.get("content") != null,
      "choice carries no message content")
    msg.get("content").asText()
  }
}
