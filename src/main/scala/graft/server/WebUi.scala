package graft.server

/** The query sandbox the reference serves at `/` (reference: ui/web — a
  * React SPA per docs/ui-overview.md; served by the HTTP server next to
  * /api/v2). Re-expressed as ONE self-contained HTML page with inline
  * CSS/JS and no external assets (the runtime has no egress), covering
  * the same user surface:
  *
  *   - Query: editor + language dropdown (gizmo/graphql/mql/sexp/
  *     linkedql) + limit, POSTing to /api/v2/query and rendering the
  *     JSON response both raw and as a result table.
  *   - Visualize: rows carrying `source`/`target` keys (the reference's
  *     tagging convention, docs/ui-overview.md "Visualize") render as an
  *     inline SVG node-link view — source nodes blue, target orange,
  *     deterministic circular layout.
  *   - Write/Delete: N-Quads textarea POSTing to /api/v2/write and
  *     /api/v2/delete.
  *
  * The page is a static string: no templating, no server state beyond
  * the existing API endpoints it calls.
  */
object WebUi {
  val html: String = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graft query sandbox</title>
<style>
  :root { --bg:#fff; --fg:#1a1a1a; --mut:#666; --line:#d9d9d9;
          --accent:#2f6fab; --src:#2f6fab; --tgt:#d97a1f; }
  * { box-sizing: border-box; }
  body { margin:0; font:14px/1.5 system-ui, sans-serif;
         color:var(--fg); background:var(--bg); }
  header { padding:10px 16px; border-bottom:1px solid var(--line);
           display:flex; gap:12px; align-items:baseline; }
  header h1 { font-size:16px; margin:0; }
  header span { color:var(--mut); font-size:12px; }
  main { display:grid; grid-template-columns: 1fr 1fr; gap:16px;
         padding:16px; max-width:1200px; }
  section { border:1px solid var(--line); border-radius:6px; padding:12px; }
  section h2 { font-size:13px; margin:0 0 8px;
               text-transform:uppercase; letter-spacing:.05em;
               color:var(--mut); }
  textarea { width:100%; font:13px/1.4 ui-monospace, monospace;
             border:1px solid var(--line); border-radius:4px; padding:8px;
             resize:vertical; }
  #query { height:140px; } #quads { height:90px; }
  .row { display:flex; gap:8px; margin:8px 0; align-items:center;
         flex-wrap:wrap; }
  select, input[type=number] { font:inherit; padding:4px 6px;
         border:1px solid var(--line); border-radius:4px; }
  input[type=number] { width:80px; }
  button { font:inherit; padding:5px 14px; border:1px solid var(--accent);
           border-radius:4px; background:var(--accent); color:#fff;
           cursor:pointer; }
  button.sec { background:#fff; color:var(--accent); }
  pre { background:#f6f6f6; border:1px solid var(--line); border-radius:4px;
        padding:8px; overflow:auto; max-height:280px; font-size:12px;
        white-space:pre-wrap; word-break:break-all; }
  table { border-collapse:collapse; width:100%; font-size:13px; }
  th, td { border:1px solid var(--line); padding:3px 8px; text-align:left; }
  th { background:#f6f6f6; }
  #viz svg { border:1px solid var(--line); border-radius:4px; width:100%; }
  .err { color:#b3261e; }
  .full { grid-column: 1 / -1; }
</style>
</head>
<body>
<header><h1>graft</h1><span>query sandbox &mdash; /api/v2</span></header>
<main>
<section class="full">
  <h2>Query</h2>
  <textarea id="query">g.V().out(iri("follows")).getLimit(10)</textarea>
  <div class="row">
    <label>language
      <select id="lang">
        <option>gizmo</option><option>graphql</option><option>mql</option>
        <option>sexp</option><option>linkedql</option>
      </select>
    </label>
    <label>limit <input id="limit" type="number" value="100"></label>
    <button id="run">Run query</button>
    <span id="status"></span>
  </div>
</section>
<section>
  <h2>Result</h2>
  <pre id="raw">&mdash;</pre>
</section>
<section>
  <h2>Result table</h2>
  <div id="table">&mdash;</div>
</section>
<section class="full" id="viz" hidden>
  <h2>Visualize (rows with source/target keys)</h2>
</section>
<section class="full">
  <h2>Write / delete quads (N-Quads)</h2>
  <textarea id="quads">&lt;alice&gt; &lt;follows&gt; &lt;bob&gt; .</textarea>
  <div class="row">
    <button id="write">Write</button>
    <button id="del" class="sec">Delete</button>
    <span id="wstatus"></span>
  </div>
</section>
</main>
<script>
"use strict";
var $ = function (id) { return document.getElementById(id); };

function post(path, body, cb) {
  var xhr = new XMLHttpRequest();
  xhr.open("POST", path);
  xhr.onload = function () { cb(null, xhr.responseText, xhr.status); };
  xhr.onerror = function () { cb("network error"); };
  xhr.send(body);
}

function rowsOf(res) {
  // /api/v2/query responses: {"result": [...]} with object rows; other
  // shapes (graphql's nested object) fall back to raw-only display
  if (res && Array.isArray(res.result)) {
    return res.result.filter(function (r) {
      return r && typeof r === "object" && !Array.isArray(r);
    });
  }
  return [];
}

function renderTable(rows) {
  if (!rows.length) { $("table").textContent = "—"; return; }
  var cols = [];
  rows.forEach(function (r) {
    Object.keys(r).forEach(function (k) {
      if (cols.indexOf(k) < 0) cols.push(k);
    });
  });
  var t = document.createElement("table");
  var hr = t.insertRow();
  cols.forEach(function (c) {
    var th = document.createElement("th");
    th.textContent = c; hr.appendChild(th);
  });
  rows.forEach(function (r) {
    var tr = t.insertRow();
    cols.forEach(function (c) {
      tr.insertCell().textContent = r[c] === undefined ? "" : String(r[c]);
    });
  });
  $("table").replaceChildren(t);
}

function renderViz(rows) {
  // the reference's convention: rows tagged source/target become edges;
  // nodes are auto-detected (docs/ui-overview.md). Deterministic circular
  // layout; source-only nodes blue, target-touched orange.
  var edges = rows.filter(function (r) {
    return r.source !== undefined && r.target !== undefined;
  });
  var viz = $("viz");
  viz.hidden = edges.length === 0;
  Array.prototype.slice.call(viz.querySelectorAll("svg"))
    .forEach(function (n) { n.remove(); });
  if (!edges.length) return;
  var names = [], isTarget = {};
  edges.forEach(function (e) {
    [e.source, e.target].forEach(function (n) {
      if (names.indexOf(n) < 0) names.push(n);
    });
    isTarget[e.target] = true;
  });
  var W = 900, H = Math.max(300, 40 * Math.min(names.length, 14));
  var cx = W / 2, cy = H / 2, R = Math.min(W, H) / 2 - 60, pos = {};
  names.forEach(function (n, i) {
    var a = 2 * Math.PI * i / names.length - Math.PI / 2;
    pos[n] = [cx + R * Math.cos(a), cy + R * Math.sin(a)];
  });
  var NS = "http://www.w3.org/2000/svg";
  var svg = document.createElementNS(NS, "svg");
  svg.setAttribute("viewBox", "0 0 " + W + " " + H);
  edges.forEach(function (e) {
    var l = document.createElementNS(NS, "line");
    l.setAttribute("x1", pos[e.source][0]); l.setAttribute("y1", pos[e.source][1]);
    l.setAttribute("x2", pos[e.target][0]); l.setAttribute("y2", pos[e.target][1]);
    l.setAttribute("stroke", "#aaa");
    svg.appendChild(l);
  });
  names.forEach(function (n) {
    var c = document.createElementNS(NS, "circle");
    c.setAttribute("cx", pos[n][0]); c.setAttribute("cy", pos[n][1]);
    c.setAttribute("r", 8);
    c.setAttribute("fill", isTarget[n] ?
      getComputedStyle(document.documentElement).getPropertyValue("--tgt") :
      getComputedStyle(document.documentElement).getPropertyValue("--src"));
    svg.appendChild(c);
    var t = document.createElementNS(NS, "text");
    t.setAttribute("x", pos[n][0] + 11); t.setAttribute("y", pos[n][1] + 4);
    t.setAttribute("font-size", "11");
    t.textContent = n;
    svg.appendChild(t);
  });
  viz.appendChild(svg);
}

$("run").onclick = function () {
  $("status").textContent = "…";
  $("status").className = "";
  var url = "/api/v2/query?lang=" + encodeURIComponent($("lang").value) +
    "&limit=" + encodeURIComponent($("limit").value || "100");
  post(url, $("query").value, function (err, text, code) {
    if (err) { $("status").textContent = err; $("status").className = "err"; return; }
    $("status").textContent = "HTTP " + code;
    var res = null;
    try { res = JSON.parse(text); } catch (e) { /* show raw below */ }
    $("raw").textContent = res ? JSON.stringify(res, null, 2) : text;
    var rows = rowsOf(res);
    renderTable(rows);
    renderViz(rows);
  });
};

function writeOp(path) {
  $("wstatus").textContent = "…";
  post(path, $("quads").value, function (err, text, code) {
    $("wstatus").textContent = err ? err : ("HTTP " + code + " " + text);
    $("wstatus").className = err || code >= 400 ? "err" : "";
  });
}
$("write").onclick = function () { writeOp("/api/v2/write"); };
$("del").onclick = function () { writeOp("/api/v2/delete"); };
</script>
</body>
</html>
"""
}
