// Headless smoke of the web UI's JavaScript against a LIVE server.
// Usage: node tools/ui_smoke.mjs http://127.0.0.1:PORT
//
// No browser in the test environment, so this stands in for one: it fetches
// GET /, extracts the page's <script>, runs it under a minimal DOM shim, and
// drives the real user flows (status load, ask -> table render, governance
// shield, dev-mode SQL run, export fetch, KG load). Exits non-zero with a
// message on the first failure. The pytest wrapper skips when node is absent.

const base = process.argv[2];
if (!base) { console.error("usage: node ui_smoke.mjs <base-url>"); process.exit(2); }

// ---- minimal DOM shim ------------------------------------------------------
class Elem {
  constructor(id) {
    this.id = id; this.children = [];
    this.innerHTML = ""; this.textContent = ""; this.value = "";
    this.style = {}; this.dataset = {};
    this.width = 800; this.height = 600; this.clientWidth = 800; this.clientHeight = 600;
    const names = new Set();
    this.classList = {
      add: c => names.add(c), remove: c => names.delete(c),
      toggle: (c, f) => { (f === undefined ? !names.has(c) : f) ? names.add(c) : names.delete(c); },
      contains: c => names.has(c),
    };
  }
  appendChild(c) { this.children.push(c); return c; }
  querySelector(sel) {
    // the page only queries .bubble / .toolbar / canvas.chart inside a message;
    // memoize pseudo-elements so writer and reader get the same object
    const want = sel.replace(/^canvas\./, "").replace(/^\./, "");
    this._inner = this._inner || {};
    const find = el => {
      if (el.className && String(el.className).includes(want)) return el;
      if (el.innerHTML && el.innerHTML.includes(`class="${want}"`) ||
          el.innerHTML && el.innerHTML.includes(`id="${want}`)) {
        if (!this._inner[want]) this._inner[want] = new Elem("inner:" + want);
        return this._inner[want];
      }
      for (const c of el.children || []) { const hit = find(c); if (hit) return hit; }
      return null;
    };
    return find(this);
  }
  addEventListener() {}
  getContext() {
    return new Proxy({}, { get: (t, p) => (p === "measureText" ? () => ({width: 10}) : () => {}) });
  }
  getBoundingClientRect() { return {left: 0, top: 0, width: this.width, height: this.height}; }
}
const elems = new Map();
const byId = id => { if (!elems.has(id)) elems.set(id, new Elem(id)); return elems.get(id); };

const listeners = [];
global.document = {
  getElementById: byId,
  createElement: tag => { const e = new Elem("anon-" + tag); e.tag = tag; return e; },
  addEventListener: (ev, fn) => listeners.push([ev, fn]),
};
const store = new Map();
global.localStorage = {
  getItem: k => store.get(k) ?? null,
  setItem: (k, v) => store.set(k, String(v)),
  removeItem: k => store.delete(k),
};
// node's own `performance` suffices (and undici needs it intact)
global.alert = msg => { throw new Error("alert: " + msg); };
global.URL.createObjectURL ||= () => "blob:fake";
global.URL.revokeObjectURL ||= () => {};

// fetch: rewrite relative paths to the live server
const realFetch = global.fetch;
global.fetch = (url, opts) => realFetch(url.startsWith("/") ? base + url : url, opts);

// ---- load the page ---------------------------------------------------------
const html = await (await realFetch(base + "/")).text();
let script = /<script>\n([\s\S]*?)<\/script>/.exec(html)[1];
const { Script } = await import("node:vm");
// top-level const/let in a vm script do NOT land on globalThis — export the
// handles this harness needs through an explicit shim appended to the script
script = script.replace(/^"use strict";\n/, "") + `
globalThis.__ui = { kg, state, ask, devRun, devLineage, devExplain, devPipeline, loadPipelineList,
                    colFormat, fmtCell, drawChart, openKG, kgTick, kgDraw, renderAnswer, tableHtml };
`;
new Script(script).runInThisContext();
const { kg, ask, devRun, devLineage, devExplain, devPipeline, loadPipelineList,
        colFormat, fmtCell, drawChart, openKG, kgTick, kgDraw } = globalThis.__ui;

const assert = (cond, msg) => { if (!cond) { console.error("FAIL: " + msg); process.exit(1); } };
const sleep = ms => new Promise(r => setTimeout(r, ms));

// init() fired at the bottom of the script — let the fetches settle
await sleep(1500);

// ---- status / examples / catalog ------------------------------------------
assert(byId("statusdot").className === "dot ok", "status dot not ok: " + byId("statusdot").className);
assert(/Spark \d/.test(byId("statustext").textContent), "status text: " + byId("statustext").textContent);
assert(byId("body_examples").innerHTML.includes("vendors"), "examples not loaded");
assert(byId("body_catalog").innerHTML.includes("cat-mod"), "catalog not loaded");
console.log("ok status+examples+catalog");

// ---- ask flow: template question -> table + history + chart ---------------
byId("question").value = "Accounts receivable aging buckets";
await ask();
for (let i = 0; i < 40 && byId("messages").children.length < 2; i++) await sleep(250);
const msgs = byId("messages").children;
assert(msgs.length >= 2, "no engine reply appended");
const reply = msgs[msgs.length - 1];
const bubble = reply.querySelector(".bubble");
assert(bubble, "no bubble in reply");
const ansHtml = bubble.innerHTML;
assert(ansHtml.includes("<table class=\"res\"") || ansHtml.includes("chip"),
  "reply has neither table nor suggestions: " + ansHtml.slice(0, 200));
assert(JSON.parse(store.get("sse_history")).length === 1, "history not recorded");
console.log("ok ask->render+history");

// ---- direct formatting functions ------------------------------------------
assert(colFormat("total_spend") === "currency", "colFormat currency");
assert(colFormat("order_count") === "count", "colFormat count");
assert(colFormat("LIFNR") === "none", "colFormat id");
assert(fmtCell(1234.5, "currency") === "$1,234.50", "fmtCell: " + fmtCell(1234.5, "currency"));
assert(fmtCell(null, "none") === "NULL", "fmtCell null");
console.log("ok client-side formats");

// ---- dev mode: run SQL, draw a chart from the execute response ------------
byId("devsql").value = "SELECT c_mktsegment AS segment, COUNT(*) AS cnt FROM customer GROUP BY c_mktsegment";
await devRun();
assert(byId("devout").innerHTML.includes("<table class=\"res\""), "dev run no table");
assert(/\d+ rows/.test(byId("devstatus").textContent), "dev status: " + byId("devstatus").textContent);
console.log("ok dev-mode execute");

// ---- column lineage for the executed SQL ----------------------------------
await devLineage();
const linHtml = byId("devlineage").innerHTML;
assert(linHtml.includes("c_mktsegment"), "lineage missing base column: " + linHtml.slice(0, 200));
console.log("ok dev-mode lineage");

// ---- explain for the executed SQL -----------------------------------------
await devExplain();
assert(byId("devlineage").innerHTML.includes("physical plan"), "explain not rendered");
console.log("ok dev-mode explain");

// chart spec comes back on /api/execute; drawChart must not throw
const execRes = await (await fetch("/api/execute", {method: "POST",
  headers: {"Content-Type": "application/json"},
  body: JSON.stringify({sql: byId("devsql").value})})).json();
assert(execRes.chart && execRes.chart.value_cols.includes("cnt"), "no chart spec on execute");
const canvas = new Elem("c"); canvas.width = 760; canvas.height = 300;
for (const t of execRes.chart.suggested_types) drawChart(canvas, execRes.chart, execRes, t);
console.log("ok chart draw (" + execRes.chart.suggested_types.join(",") + ")");

// ---- pipeline runner (extension surface over HTTP) -------------------------
await loadPipelineList();
for (let i = 0; i < 20 && byId("pipesel").children.length < 2; i++) await sleep(250);
assert(byId("pipesel").children.length > 50, "pipeline list not loaded: " + byId("pipesel").children.length);
byId("pipesel").value = "dedup_exact";
await devPipeline();
assert(byId("devout").innerHTML.includes("pipeline: dedup_exact"), "pipeline result not rendered");
assert(byId("devout").innerHTML.includes("doc_count"), "pipeline table missing");
console.log("ok pipeline runner");

// ---- governance shield -----------------------------------------------------
byId("devsql").value = "SELECT PERNR, NACHN FROM PA0002";
await devRun();
assert(byId("devout").innerHTML.includes("Governance block"), "no governance shield");
assert(byId("devstatus").textContent === "blocked", "dev status not blocked");
console.log("ok governance shield");

// ---- export ----------------------------------------------------------------
const exp = await fetch("/api/export", {method: "POST",
  headers: {"Content-Type": "application/json"},
  body: JSON.stringify({sql: "SELECT r_name FROM region ORDER BY r_name", format: "csv"})});
const csv = await exp.text();
assert(csv.startsWith("r_name\n"), "csv export: " + csv.slice(0, 40));
console.log("ok export");

// ---- KG explorer -----------------------------------------------------------
await openKG();
for (let i = 0; i < 20 && !kg.loaded; i++) await sleep(200);
assert(kg.loaded && kg.nodes.length > 50, "kg not loaded: " + kg.nodes.length);
assert(kg.links.length > 50, "kg links: " + kg.links.length);
kgTick(); kgDraw(); // layout + draw must not throw
clearInterval(kg.sim);
console.log("ok kg explorer (" + kg.nodes.length + " nodes)");

console.log("UI SMOKE PASS");
process.exit(0);
