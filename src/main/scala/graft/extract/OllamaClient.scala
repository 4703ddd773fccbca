package graft.extract

import graft.extract.Json._
import graft.net.{HttpTransport, JdkHttpTransport}

/** The Ollama-shaped LLM client (ollama_client.py) — the REAL exchange:
  * `POST {base}/api/generate` with `{"model", "prompt", "stream": false,
  * "format": "json", "options": {"temperature": t}}`, response object
  * carrying the generated text under `"response"`, code-fence stripping,
  * then a JSON parse of the model output. Plugs into [[Healing.healWithAi]]
  * through [[LlmJobExtractor]] exactly like [[StubLlm]], so lineage
  * (`data_source_layer = "L2"`) is unchanged.
  *
  * No model ships in this container, so HealingSpec drives this client over
  * a [[graft.net.RecordedTransport]] capture; production passes a
  * [[graft.net.JdkHttpTransport]] and a live base URL. Failure semantics
  * mirror ollama_client.py: any transport/HTTP/parse error degrades to
  * no-result (the reference returns `{}` and the healing gate declines).
  */
final class OllamaClient(transport: HttpTransport,
                         baseUrl: String,
                         model: String,
                         fewShotContext: String = "",
                         temperature: Double = 0.1) extends LlmJobExtractor {

  private def strippedBase = baseUrl.replaceAll("/+$", "")

  private def generate(prompt: String, temp: Double): Option[String] =
    try {
      val payload = JObj.empty
      payload.put("model", JStr(model))
      payload.put("prompt", JStr(prompt))
      payload.put("stream", JBool(false))
      payload.put("format", JStr("json"))
      val opts = JObj.empty
      opts.put("temperature", JFloat(temp))
      payload.put("options", opts)
      val resp = transport.send("POST", s"$strippedBase/api/generate",
        Some(Json.dumps(payload)))
      if (resp.status < 200 || resp.status >= 300) None // raise_for_status
      else Json.parse(resp.body) match {
        case o: JObj => o.get("response").map(pyStr)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ollama_client.py: the model is asked for fenced-or-bare JSON; strip
    * markdown fences, then parse.
    */
  private def parseModelJson(content: String): Option[JV] =
    try Some(Json.parse(
      content.replace("```json", "").replace("```", "").strip()))
    catch { case _: Json.ParseError => None }

  /** extract_job_from_html (ollama_client.py:96-141): few-shot context +
    * first 3500 chars of the html text, temperature 0.1, JSON-object reply.
    */
  def extractJobFromHtml(html: String): Option[JObj] = {
    if (html == null || html.isEmpty) return None
    val prompt =
      s"""
        Role: Expert Technical Job Classifier.
        Task: Extract job details from the provided text snippet.

        Constraints:
        1. Return ONLY a valid JSON object.
        2. Required fields: "title", "company_name", "salary_text", "salary_type".
        3. Allowed salary_type: "月薪", "時薪", "年薪", "日薪", "面議".

        $fewShotContext

        Data to analyze:
        ${html.take(3500)}

        JSON Result:
        """
    for {
      content <- generate(prompt, temperature)
      parsed <- parseModelJson(content)
      obj <- parsed match { case o: JObj if o.entries.nonEmpty => Some(o); case _ => None }
    } yield obj
  }

  /** extract_skills (ollama_client.py:42-94): skill entities from a job
    * description — `[{"name": …, "type": …}]`, temperature 0.2, short texts
    * skipped. Complements the X23 lexicon explode with the reference's LLM
    * path.
    */
  def extractSkills(text: String): Seq[(String, String)] = {
    if (text == null || Py.strip(text).length < 10) return Nil
    val prompt =
      s"""
        Task: Extract technical skills from the Chinese job description.
        Rules:
        - Return ONLY a valid JSON array.
        - Fields: "name" (string), "type" (string).
        - Type category: Programming, Framework, Database, Tool, Cloud, Other.

        Job Description:
        $text

        JSON Result:
        """
    (for {
      content <- generate(prompt, 0.2)
      parsed <- parseModelJson(content)
    } yield parsed match {
      case JArr(items) => items.toSeq.collect {
        case o: JObj if o.get("name").exists(truthy) =>
          (pyStr(o("name")), o.get("type").map(pyStr).getOrElse("Other"))
      }
      case _ => Seq.empty[(String, String)]
    }).getOrElse(Nil)
  }
}

object OllamaClient {
  /** Production wiring: live transport, env-configured endpoint (the
    * reference reads OLLAMA_URL/OLLAMA_MODEL from central config).
    */
  def live(baseUrl: String, model: String): OllamaClient =
    new OllamaClient(new JdkHttpTransport(), baseUrl, model)
}
