package graft.api

/** The reference's OpenAPI surface (`src/docs.rs:6-42`, served at
  * `/api-docs/openapi.json`) rebuilt as a static OpenAPI 3.0 document:
  * the five paths and the component schemas the reference registers
  * (GetLogsFilter, IndexerStats, LogsResponse, GenericErrorResponse,
  * MyBlock, MyTransaction, MyLog).
  *
  * The reference also bundles the Swagger UI web app at `/swagger-ui`
  * (`src/api.rs:392`); this build is zero-egress and dependency-free,
  * so [[indexHtml]] is a self-contained endpoint index over the same
  * document instead of the asset bundle.
  */
object OpenApiDoc {

  private def schemaRef(name: String): JObj = JObj("$ref" -> s"#/components/schemas/$name")

  private def prop(tpe: String, nullable: Boolean = false): JObj =
    if (nullable) JObj("type" -> tpe, "nullable" -> true) else JObj("type" -> tpe)

  private def objSchema(props: (String, Any)*): JObj =
    JObj("type" -> "object", "properties" -> JObj(props: _*))

  private def jsonResponse(desc: String, schema: Any): JObj =
    JObj("description" -> desc,
      "content" -> JObj("application/json" -> JObj("schema" -> schema)))

  private val errorResponses: Seq[(String, Any)] = Seq(
    "400" -> jsonResponse("Bad request", schemaRef("GenericErrorResponse")),
    "404" -> jsonResponse("Not found", schemaRef("GenericErrorResponse")),
    "500" -> jsonResponse("Internal server error", schemaRef("GenericErrorResponse")))

  lazy val json: String = Json.write(JObj(
    "openapi" -> "3.0.3",
    "info" -> JObj(
      "title" -> "EVM Indexer API",
      "version" -> "1.0.0",
      "description" -> ("Access to Ethereum blockchain data indexed by a " +
        "Spark-based analytics engine: blocks, transactions, and logs " +
        "with filtered, cursor-paginated queries.")),
    "tags" -> Seq(JObj(
      "name" -> "EVM Indexer API",
      "description" -> "Endpoints for querying indexed blockchain data.")),
    "paths" -> JObj(
      "/" -> JObj("get" -> JObj(
        "summary" -> "API root",
        "responses" -> JObj("200" -> JObj(
          "description" -> "Success",
          "content" -> JObj("text/html" -> JObj("schema" -> prop("string"))))))),
      "/stats" -> JObj("get" -> JObj(
        "summary" -> "Indexer statistics",
        "responses" -> JObj(
          ("200" -> jsonResponse("Current counts and lag", schemaRef("IndexerStats"))) +:
            errorResponses.filter(_._1 == "500"): _*))),
      "/logs" -> JObj("post" -> JObj(
        "summary" -> "Get filtered logs",
        "description" -> ("Paginated event logs. Offset pagination via " +
          "page/page_size; stable cursor pagination via cursorBlock/" +
          "cursorLogId from a previous response (preferred at scale)."),
        "requestBody" -> JObj("required" -> false,
          "content" -> JObj("application/json" ->
            JObj("schema" -> schemaRef("GetLogsFilter")))),
        "responses" -> JObj(
          ("200" -> jsonResponse("One page of logs", schemaRef("LogsResponse"))) +:
            errorResponses.filterNot(_._1 == "404"): _*))),
      "/block/{identifier}" -> JObj("get" -> JObj(
        "summary" -> "Get block by hash or number",
        "parameters" -> Seq(JObj("name" -> "identifier", "in" -> "path",
          "required" -> true, "schema" -> prop("string"),
          "description" -> "0x-prefixed 66-char hash or decimal height")),
        "responses" -> JObj(
          ("200" -> jsonResponse("The block", schemaRef("MyBlock"))) +:
            errorResponses: _*))),
      "/transaction/{tx_hash}" -> JObj("get" -> JObj(
        "summary" -> "Get transaction by hash",
        "parameters" -> Seq(JObj("name" -> "tx_hash", "in" -> "path",
          "required" -> true, "schema" -> prop("string"),
          "description" -> "0x-prefixed 66-char transaction hash")),
        "responses" -> JObj(
          ("200" -> jsonResponse("The transaction", schemaRef("MyTransaction"))) +:
            errorResponses: _*)))),
    "components" -> JObj("schemas" -> JObj(
      "GetLogsFilter" -> objSchema(
        "fromBlock" -> prop("integer", nullable = true),
        "toBlock" -> prop("integer", nullable = true),
        "address" -> prop("string", nullable = true),
        "topic0" -> prop("string", nullable = true),
        "topic1" -> prop("string", nullable = true),
        "topic2" -> prop("string", nullable = true),
        "topic3" -> prop("string", nullable = true),
        "blockHash" -> prop("string", nullable = true),
        "page" -> prop("integer", nullable = true),
        "pageSize" -> prop("integer", nullable = true),
        "cursorBlock" -> prop("integer", nullable = true),
        "cursorLogId" -> prop("integer", nullable = true)),
      "IndexerStats" -> objSchema(
        "total_blocks" -> prop("integer"),
        "total_transactions" -> prop("integer"),
        "total_logs" -> prop("integer"),
        "last_synced_block" -> prop("integer", nullable = true),
        "ingestion_lag" -> prop("integer", nullable = true)),
      "LogsResponse" -> objSchema(
        "logs" -> JObj("type" -> "array", "items" -> schemaRef("MyLog")),
        "next_cursor_block" -> prop("integer", nullable = true),
        "next_cursor_log_id" -> prop("integer", nullable = true)),
      "GenericErrorResponse" -> objSchema(
        "status" -> prop("string"),
        "statusCode" -> prop("integer"),
        "message" -> prop("string")),
      "MyBlock" -> objSchema(
        "blockNumber" -> prop("integer"),
        "blockHash" -> prop("string"),
        "parentHash" -> prop("string"),
        "timestamp" -> prop("integer"),
        "gasUsed" -> prop("string", nullable = true),
        "gasLimit" -> prop("string", nullable = true),
        "baseFeePerGas" -> prop("string", nullable = true)),
      "MyTransaction" -> objSchema(
        "txHash" -> prop("string"),
        "blockNumber" -> prop("integer"),
        "blockHash" -> prop("string"),
        "transactionIndex" -> prop("integer", nullable = true),
        "fromAddress" -> prop("string"),
        "toAddress" -> prop("string", nullable = true),
        "value" -> prop("string"),
        "gasPrice" -> prop("string", nullable = true),
        "maxFeePerGas" -> prop("string", nullable = true),
        "maxPriorityFeePerGas" -> prop("string", nullable = true),
        "gas" -> prop("string", nullable = true),
        "inputData" -> prop("string"),
        "status" -> prop("integer", nullable = true)),
      "MyLog" -> objSchema(
        "logIndex" -> prop("integer", nullable = true),
        "transactionHash" -> prop("string"),
        "transactionIndex" -> prop("integer", nullable = true),
        "blockNumber" -> prop("integer"),
        "blockHash" -> prop("string"),
        "address" -> prop("string"),
        "data" -> prop("string"),
        "topics" -> JObj("type" -> "array", "items" -> prop("string")))))))

  /** A dependency-free "try it out" console over [[json]] — the
    * functional core of the Swagger UI bundle the reference embeds
    * (`src/docs.rs:1-42`, route `src/api.rs:391-402`), vendored as one
    * self-contained page (zero egress: no CDN assets). The page is a
    * generic OpenAPI driver, not a hardcoded link list: it fetches
    * `/api-docs/openapi.json`, renders one form per path+method
    * (path-parameter inputs from `parameters`, a JSON textarea where a
    * `requestBody` is declared), and executes real `fetch` calls
    * against the live server, showing status + response body. */
  lazy val indexHtml: String =
    """<!doctype html><html><head><meta charset="utf-8"><title>EVM Indexer API</title>
      |<style>
      | body{font-family:sans-serif;max-width:56rem;margin:2rem auto;padding:0 1rem}
      | .op{border:1px solid #ccc;border-radius:6px;margin:1rem 0;padding:.75rem 1rem}
      | .m{display:inline-block;min-width:3.5rem;font-weight:bold}
      | .m.post{color:#49719c}.m.get{color:#2f7d32}
      | textarea{width:100%;font-family:monospace;min-height:4rem}
      | input{font-family:monospace;width:24rem;max-width:100%}
      | pre{background:#f6f6f6;padding:.5rem;overflow:auto;max-height:18rem}
      | button{cursor:pointer;padding:.25rem 1rem}
      |</style></head><body>
      |<h1>EVM Indexer API</h1>
      |<p>Interactive console over <a href="/api-docs/openapi.json">/api-docs/openapi.json</a>.
      |Fill parameters, <em>Execute</em>, and the browser performs the real request.</p>
      |<div id="ops">loading OpenAPI document…</div>
      |<script>
      |const EXAMPLES = {"/logs": '{\n  "fromBlock": 0,\n  "toBlock": 100,\n  "pageSize": 5\n}'};
      |async function boot() {
      |  const doc = await (await fetch('/api-docs/openapi.json')).json();
      |  const root = document.getElementById('ops');
      |  root.innerHTML = '';
      |  for (const [path, methods] of Object.entries(doc.paths)) {
      |    for (const [method, op] of Object.entries(methods)) {
      |      const d = document.createElement('div');
      |      d.className = 'op';
      |      let h = '<span class="m ' + method + '">' + method.toUpperCase() + '</span>' +
      |        '<code>' + path + '</code> — ' + (op.summary || '');
      |      for (const p of op.parameters || [])
      |        h += '<p><label>' + p.name + ': <input data-param="' + p.name + '" ' +
      |          'placeholder="' + (p.description || '') + '"></label></p>';
      |      if (op.requestBody)
      |        h += '<p><textarea data-body>' + (EXAMPLES[path] || '{}') + '</textarea></p>';
      |      h += '<p><button>Execute</button></p><pre hidden></pre>';
      |      d.innerHTML = h;
      |      d.querySelector('button').onclick = () => exec(method, path, d);
      |      root.appendChild(d);
      |    }
      |  }
      |}
      |async function exec(method, path, box) {
      |  let url = path;
      |  for (const i of box.querySelectorAll('[data-param]'))
      |    url = url.replace('{' + i.dataset.param + '}', encodeURIComponent(i.value));
      |  const body = box.querySelector('[data-body]');
      |  const out = box.querySelector('pre');
      |  out.hidden = false; out.textContent = '…';
      |  try {
      |    const res = await fetch(url, body
      |      ? {method: method.toUpperCase(), body: body.value,
      |         headers: {'Content-Type': 'application/json'}}
      |      : {method: method.toUpperCase()});
      |    const text = await res.text();
      |    let shown = text;
      |    try { shown = JSON.stringify(JSON.parse(text), null, 2); } catch (e) {}
      |    out.textContent = 'HTTP ' + res.status + '\n' + shown;
      |  } catch (e) { out.textContent = 'request failed: ' + e; }
      |}
      |boot();
      |</script></body></html>""".stripMargin
}
