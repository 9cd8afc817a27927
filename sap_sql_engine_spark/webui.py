"""Web UI — single-page chat front-end over the JSON API (SURVEY §2.11,
§3.1; reference ``sap_sql_ui.html`` served at ``sap_sql_engine.py:1375``).

Feature parity with the reference page, re-implemented from scratch over
*this* server's endpoints:

- chat Q&A (``POST /api/generate``) with classification badge, SQL block,
  and clarification/suggestion chips,
- results table with client-side column formatting (C2/C3),
- auto-charting — bar / line / pie on a <canvas>, server-inferred spec (C4),
- CSV / TSV / Excel export buttons (``POST /api/export``, S6-S8),
- query history + favorites in localStorage (C5,
  reference ``sap_sql_ui.html:3033-3130``),
- session token / cost tracking (C6, reference ``:1910``),
- developer mode: SQL editor + run (C7, ``POST /api/execute``),
- catalog browser (C8, ``POST /api/catalog``),
- knowledge-graph explorer on a force-layout canvas (``GET /api/kg/graph``),
- governance shield panel on HTTP 403 (G1-G5 surfaced),
- API-key / model settings modal (``/api/save-key`` etc.).

The page is a Python string (no package-data loading, works from any
install layout) and is served by ``server.py`` at ``GET /``.
"""

PAGE = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>SAP SQL Engine (Spark)</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
:root {
  --bg: #10141a; --panel: #171c24; --panel2: #1e2530; --border: #2a3342;
  --text: #d7dee8; --dim: #8b96a5; --accent: #4da3ff; --green: #3ecf8e;
  --red: #ff6b6b; --amber: #ffb454; --chip: #223047;
}
* { box-sizing: border-box; }
body { margin: 0; background: var(--bg); color: var(--text);
  font: 14px/1.45 -apple-system, "Segoe UI", Roboto, Helvetica, Arial, sans-serif;
  height: 100vh; display: flex; flex-direction: column; }
header { display: flex; align-items: center; gap: 10px; padding: 8px 14px;
  background: var(--panel); border-bottom: 1px solid var(--border); }
header h1 { font-size: 15px; margin: 0 8px 0 0; font-weight: 600; }
.dot { width: 9px; height: 9px; border-radius: 50%; background: var(--dim);
  display: inline-block; margin-right: 5px; }
.dot.ok { background: var(--green); } .dot.err { background: var(--red); }
.spacer { flex: 1; }
button { background: var(--panel2); color: var(--text); border: 1px solid var(--border);
  border-radius: 6px; padding: 5px 10px; cursor: pointer; font-size: 13px; }
button:hover { border-color: var(--accent); }
button.primary { background: var(--accent); color: #08121f; border-color: var(--accent); }
.tokens { position: relative; }
.tokens-pop { display: none; position: absolute; right: 0; top: 32px; z-index: 30;
  background: var(--panel2); border: 1px solid var(--border); border-radius: 8px;
  padding: 10px 14px; min-width: 210px; }
.tokens-pop.open { display: block; }
.tokens-pop div { display: flex; justify-content: space-between; gap: 18px; padding: 2px 0; }
.tokens-pop span:first-child { color: var(--dim); }
main { flex: 1; display: flex; min-height: 0; }
#sidebar { width: 290px; background: var(--panel); border-right: 1px solid var(--border);
  display: flex; flex-direction: column; min-height: 0; }
.tabs { display: flex; border-bottom: 1px solid var(--border); }
.tabs button { flex: 1; border: none; border-radius: 0; background: none;
  padding: 8px 0; color: var(--dim); border-bottom: 2px solid transparent; }
.tabs button.active { color: var(--text); border-bottom-color: var(--accent); }
.tabbody { flex: 1; overflow-y: auto; padding: 8px; display: none; }
.tabbody.active { display: block; }
.hist-item { padding: 7px 8px; border-radius: 6px; cursor: pointer; display: flex;
  gap: 6px; align-items: flex-start; }
.hist-item:hover { background: var(--panel2); }
.hist-item .q { flex: 1; overflow: hidden; text-overflow: ellipsis;
  display: -webkit-box; -webkit-line-clamp: 2; -webkit-box-orient: vertical; }
.hist-item .meta { color: var(--dim); font-size: 11px; }
.star { cursor: pointer; color: var(--dim); background: none; border: none; padding: 0 2px; }
.star.fav { color: var(--amber); }
.section-label { color: var(--dim); font-size: 11px; text-transform: uppercase;
  letter-spacing: .06em; margin: 8px 4px 4px; }
.example, .cat-q { padding: 6px 8px; border-radius: 6px; cursor: pointer; color: var(--text); }
.example:hover, .cat-q:hover { background: var(--panel2); }
.cat-mod > summary { cursor: pointer; padding: 5px 4px; font-weight: 600; }
.cat-obj { margin: 2px 0 8px 12px; }
.cat-obj .desc { color: var(--dim); font-size: 12px; margin-bottom: 2px; }
#chat { flex: 1; display: flex; flex-direction: column; min-width: 0; }
#messages { flex: 1; overflow-y: auto; padding: 16px 20px; }
.msg { max-width: 880px; margin: 0 auto 14px; }
.msg .who { color: var(--dim); font-size: 11px; text-transform: uppercase;
  letter-spacing: .06em; margin-bottom: 3px; }
.msg .bubble { background: var(--panel); border: 1px solid var(--border);
  border-radius: 10px; padding: 10px 14px; overflow-x: auto; }
.msg.user .bubble { background: var(--panel2); }
.badge { display: inline-block; font-size: 11px; padding: 1px 8px; border-radius: 10px;
  background: var(--chip); color: var(--accent); margin-right: 6px; }
.badge.high { color: var(--green); }
.badge.tpl { color: var(--amber); }
pre.sql { background: #0c1016; border: 1px solid var(--border); border-radius: 8px;
  padding: 10px 12px; overflow-x: auto; color: #9fd0ff; font-size: 13px; }
table.res { border-collapse: collapse; width: 100%; margin: 8px 0; font-size: 13px; }
table.res th { text-align: left; color: var(--dim); border-bottom: 1px solid var(--border);
  padding: 4px 10px 4px 0; white-space: nowrap; }
table.res td { padding: 3px 10px 3px 0; border-bottom: 1px solid #202836; white-space: nowrap; }
td.num { text-align: right; font-variant-numeric: tabular-nums; }
.rowinfo { color: var(--dim); font-size: 12px; }
.toolbar { display: flex; gap: 6px; margin-top: 6px; flex-wrap: wrap; align-items: center; }
.shield { border: 1px solid var(--red); background: #2a1418; color: #ffc9c9;
  border-radius: 10px; padding: 10px 14px; }
.shield .stitle { font-weight: 700; color: var(--red); margin-bottom: 4px; }
.chip { background: var(--chip); border: 1px solid var(--border); color: var(--text);
  padding: 4px 10px; border-radius: 14px; cursor: pointer; font-size: 13px;
  display: inline-block; margin: 3px 4px 0 0; }
.chip:hover { border-color: var(--accent); }
#askbar { display: flex; gap: 8px; padding: 12px 20px; border-top: 1px solid var(--border);
  background: var(--panel); }
#question { flex: 1; background: var(--panel2); color: var(--text); resize: none;
  border: 1px solid var(--border); border-radius: 8px; padding: 9px 12px; font: inherit; }
#devpanel { display: none; width: 430px; border-left: 1px solid var(--border);
  background: var(--panel); flex-direction: column; min-height: 0; }
#devpanel.open { display: flex; }
#devsql { height: 160px; background: #0c1016; color: #9fd0ff; border: none;
  border-bottom: 1px solid var(--border); padding: 10px; font: 13px ui-monospace, monospace;
  resize: vertical; }
#devout { flex: 1; overflow: auto; padding: 10px; }
.overlay { display: none; position: fixed; inset: 0; background: rgba(0,0,0,.55); z-index: 40;
  align-items: center; justify-content: center; }
.overlay.open { display: flex; }
.modal { background: var(--panel); border: 1px solid var(--border); border-radius: 12px;
  padding: 18px 20px; width: 430px; }
.modal h2 { margin: 0 0 10px; font-size: 16px; }
.modal input, .modal select { width: 100%; background: var(--panel2); color: var(--text);
  border: 1px solid var(--border); border-radius: 6px; padding: 8px 10px; margin: 4px 0 10px; }
.modal .statusline { font-size: 12px; min-height: 16px; margin-bottom: 6px; }
#kgpanel { display: none; position: fixed; inset: 30px; background: var(--panel);
  border: 1px solid var(--border); border-radius: 12px; z-index: 50;
  flex-direction: column; overflow: hidden; }
#kgpanel.open { display: flex; }
#kgbar { display: flex; gap: 8px; align-items: center; padding: 8px 12px;
  border-bottom: 1px solid var(--border); }
#kgbody { flex: 1; display: flex; min-height: 0; }
#kgcanvas { flex: 1; cursor: grab; }
#kgdetail { width: 300px; border-left: 1px solid var(--border); overflow-y: auto;
  padding: 10px 12px; font-size: 13px; }
#kgdetail table { font-size: 12px; border-collapse: collapse; }
#kgdetail td { padding: 1px 8px 1px 0; }
canvas.chart { background: #0c1016; border: 1px solid var(--border); border-radius: 8px;
  margin-top: 6px; max-width: 100%; }
a { color: var(--accent); }
.err { color: var(--red); }
</style>
</head>
<body>
<header>
  <h1>SAP SQL Engine <span style="color:var(--dim);font-weight:400">/ Spark</span></h1>
  <span><span class="dot" id="statusdot"></span><span id="statustext">connecting…</span></span>
  <span class="spacer"></span>
  <span class="tokens">
    <button id="tokenbtn" onclick="toggleTokens()">0 tokens</button>
    <div class="tokens-pop" id="tokenpop">
      <div><span>Queries</span><span id="tq">0</span></div>
      <div><span>Input tokens</span><span id="ti">0</span></div>
      <div><span>Output tokens</span><span id="to">0</span></div>
      <div><span>Cache write</span><span id="tcw">0</span></div>
      <div><span>Cache read</span><span id="tcr">0</span></div>
      <div><span>Est. cost</span><span id="tc">$0.0000</span></div>
    </div>
  </span>
  <button onclick="openKG()" title="Knowledge graph">KG</button>
  <button onclick="toggleDev()" title="Developer mode (SQL editor)">SQL</button>
  <button onclick="openSettings()" title="Settings">&#9881;</button>
</header>
<main>
  <aside id="sidebar">
    <div class="tabs">
      <button id="tab_history" class="active" onclick="showTab('history')">History</button>
      <button id="tab_examples" onclick="showTab('examples')">Examples</button>
      <button id="tab_catalog" onclick="showTab('catalog')">Catalog</button>
    </div>
    <div class="tabbody active" id="body_history"></div>
    <div class="tabbody" id="body_examples"></div>
    <div class="tabbody" id="body_catalog"></div>
  </aside>
  <section id="chat">
    <div id="messages">
      <div class="msg"><div class="bubble">
        Ask a business question about the SAP ECC data — e.g.
        <span class="chip" onclick="useQuestion('Who are our top vendors by total spend?')">top vendors by spend</span>
        <span class="chip" onclick="useQuestion('Accounts receivable aging buckets')">AR aging</span>
        <span class="chip" onclick="useQuestion('Three-way match exceptions')">3-way match</span>
        — or open the SQL editor for direct queries.
      </div></div>
    </div>
    <div id="askbar">
      <textarea id="question" rows="1" placeholder="Ask a business question…"
        onkeydown="if(event.key==='Enter'&&!event.shiftKey){event.preventDefault();ask();}"></textarea>
      <button class="primary" onclick="ask()">Ask</button>
    </div>
  </section>
  <aside id="devpanel">
    <textarea id="devsql" placeholder="-- SQL editor (Ctrl+Enter to run)&#10;SELECT ..."
      onkeydown="if(event.key==='Enter'&&event.ctrlKey){event.preventDefault();devRun();}"></textarea>
    <div style="display:flex;gap:8px;padding:8px;border-bottom:1px solid var(--border);align-items:center">
      <button class="primary" onclick="devRun()">Run</button>
      <select id="pipesel" title="pipeline operators"><option value="">pipeline…</option></select>
      <button onclick="devPipeline()">Go</button>
      <span class="rowinfo" id="devstatus"></span>
    </div>
    <div id="devout"></div>
  </aside>
</main>

<div class="overlay" id="settings">
  <div class="modal">
    <h2>Settings</h2>
    <div id="keystate" class="rowinfo"></div>
    <label>Anthropic API key</label>
    <input type="password" id="keyinput" placeholder="sk-ant-…">
    <div class="statusline" id="keystatus"></div>
    <div style="display:flex;gap:8px">
      <button class="primary" onclick="saveKey()">Save key</button>
      <button onclick="removeKey()">Remove key</button>
    </div>
    <label style="display:block;margin-top:12px">Model</label>
    <select id="modelsel" onchange="saveModel()"></select>
    <div class="statusline" id="modelstatus"></div>
    <div style="text-align:right"><button onclick="closeSettings()">Close</button></div>
  </div>
</div>

<div id="kgpanel">
  <div id="kgbar">
    <strong>Knowledge Graph</strong>
    <input id="kgsearch" placeholder="search tables…" oninput="kgDraw()"
      style="background:var(--panel2);color:var(--text);border:1px solid var(--border);border-radius:6px;padding:5px 9px">
    <span class="rowinfo" id="kgstats"></span>
    <span class="spacer"></span>
    <button onclick="closeKG()">Close</button>
  </div>
  <div id="kgbody">
    <canvas id="kgcanvas"></canvas>
    <div id="kgdetail"><em class="rowinfo">Click a node for table details.</em></div>
  </div>
</div>

<script>
"use strict";
const $ = id => document.getElementById(id);
const esc = s => String(s).replace(/[&<>"']/g,
  c => ({'&':'&amp;','<':'&lt;','>':'&gt;','"':'&quot;',"'":'&#39;'}[c]));

// ---------- state ----------
const state = {
  model: '', hasKey: false,
  usage: { queries: 0, input_tokens: 0, output_tokens: 0,
           cache_creation_input_tokens: 0, cache_read_input_tokens: 0 },
  history: JSON.parse(localStorage.getItem('sse_history') || '[]'),
  favorites: new Set(JSON.parse(localStorage.getItem('sse_favorites') || '[]')),
};

// C6: model-aware pricing ($/Mtok)
const PRICING = {
  'claude-sonnet-4-5-20250929': {input: 3.0, output: 15.0, cw: 3.75, cr: 0.30},
  'claude-sonnet-4-20250514':   {input: 3.0, output: 15.0, cw: 3.75, cr: 0.30},
  'claude-haiku-4-20250414':    {input: 0.80, output: 4.0, cw: 1.00, cr: 0.08},
};
function sessionCost() {
  const p = PRICING[state.model] || PRICING['claude-sonnet-4-5-20250929'];
  const u = state.usage;
  return u.input_tokens/1e6*p.input + u.output_tokens/1e6*p.output
       + u.cache_creation_input_tokens/1e6*p.cw + u.cache_read_input_tokens/1e6*p.cr;
}
function addUsage(u) {
  if (!u) return;
  state.usage.queries += 1;
  for (const k of ['input_tokens','output_tokens','cache_creation_input_tokens','cache_read_input_tokens'])
    state.usage[k] += u[k] || 0;
  renderTokens();
}
function renderTokens() {
  const u = state.usage, total = u.input_tokens + u.output_tokens;
  const c = sessionCost();
  $('tokenbtn').textContent = total.toLocaleString() + ' tokens' +
    (total ? ' (' + (c < 0.01 ? '$'+c.toFixed(4) : '$'+c.toFixed(2)) + ')' : '');
  $('tq').textContent = u.queries.toLocaleString();
  $('ti').textContent = u.input_tokens.toLocaleString();
  $('to').textContent = u.output_tokens.toLocaleString();
  $('tcw').textContent = u.cache_creation_input_tokens.toLocaleString();
  $('tcr').textContent = u.cache_read_input_tokens.toLocaleString();
  $('tc').textContent = '$' + c.toFixed(4);
}
function toggleTokens() { $('tokenpop').classList.toggle('open'); }
document.addEventListener('click', e => {
  if (!e.target.closest('.tokens')) $('tokenpop').classList.remove('open');
});

// ---------- status / settings ----------
async function checkStatus() {
  try {
    const s = await (await fetch('/api/status')).json();
    $('statusdot').className = 'dot ok';
    $('statustext').textContent =
      `Spark ${s.spark_version} · ${s.tables} tables · ${s.modules.length} modules`;
    state.model = s.model; state.hasKey = s.has_api_key;
    if (s.session_usage) { Object.assign(state.usage, s.session_usage); renderTokens(); }
    $('keystate').textContent = s.has_api_key
      ? `Connected (${s.key_preview}) — LLM generation enabled`
      : 'No API key — deterministic template mode';
    const sel = $('modelsel');
    sel.innerHTML = Object.keys(PRICING).map(m =>
      `<option ${m === s.model ? 'selected' : ''}>${m}</option>`).join('');
  } catch (e) {
    $('statusdot').className = 'dot err';
    $('statustext').textContent = 'offline';
  }
}
function openSettings() { $('settings').classList.add('open'); }
function closeSettings() { $('settings').classList.remove('open'); }
$('settings').addEventListener('click', e => { if (e.target === $('settings')) closeSettings(); });
async function saveKey() {
  const key = $('keyinput').value.trim();
  $('keystatus').textContent = 'validating…'; $('keystatus').className = 'statusline';
  const r = await (await fetch('/api/save-key', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({key})})).json();
  if (r.status === 'ok') {
    $('keystatus').textContent = 'Saved ' + r.key_preview;
    $('keyinput').value = ''; checkStatus();
  } else { $('keystatus').textContent = r.error; $('keystatus').className = 'statusline err'; }
}
async function removeKey() {
  await fetch('/api/remove-key', {method: 'POST'});
  $('keystatus').textContent = 'Key removed.'; checkStatus();
}
async function saveModel() {
  const r = await (await fetch('/api/save-model', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({model: $('modelsel').value})})).json();
  $('modelstatus').textContent = r.status === 'ok' ? 'Model saved.' : r.error;
  if (r.status === 'ok') state.model = r.model;
}

// ---------- sidebar ----------
function showTab(name) {
  for (const t of ['history', 'examples', 'catalog']) {
    $('tab_' + t).classList.toggle('active', t === name);
    $('body_' + t).classList.toggle('active', t === name);
  }
}
// C5: history + favorites (localStorage)
function saveHistory() {
  localStorage.setItem('sse_history', JSON.stringify(state.history));
  localStorage.setItem('sse_favorites', JSON.stringify([...state.favorites]));
}
function addToHistory(question, confidence, modules) {
  if (state.history[0] && state.history[0].question === question) return;
  state.history.unshift({ id: 'h' + Date.now() + Math.random().toString(36).slice(2, 6),
    question, confidence: confidence || '', modules: modules || [],
    ts: new Date().toISOString() });
  if (state.history.length > 50) state.history.length = 50;
  saveHistory(); renderHistory();
}
function toggleFav(id, ev) {
  ev.stopPropagation();
  state.favorites.has(id) ? state.favorites.delete(id) : state.favorites.add(id);
  saveHistory(); renderHistory();
}
function clearHistory() {
  state.history = []; state.favorites.clear(); saveHistory(); renderHistory();
}
function histItem(h) {
  const fav = state.favorites.has(h.id);
  return `<div class="hist-item" onclick="useQuestion(${JSON.stringify(h.question)
      .replace(/"/g, '&quot;')})">` +
    `<div class="q">${esc(h.question)}<div class="meta">${esc(h.confidence)}` +
    `${h.modules.length ? ' · ' + esc(h.modules.join(', ')) : ''}</div></div>` +
    `<button class="star ${fav ? 'fav' : ''}" onclick="toggleFav('${h.id}', event)">` +
    `${fav ? '&#9733;' : '&#9734;'}</button></div>`;
}
function renderHistory() {
  const favs = state.history.filter(h => state.favorites.has(h.id));
  const rest = state.history.filter(h => !state.favorites.has(h.id));
  let html = '';
  if (favs.length) html += '<div class="section-label">Favorites</div>' + favs.map(histItem).join('');
  if (rest.length) html += '<div class="section-label">Recent</div>' + rest.map(histItem).join('');
  html = html || '<div class="rowinfo" style="padding:8px">No queries yet.</div>';
  if (state.history.length)
    html += '<div style="text-align:center;margin-top:8px"><button onclick="clearHistory()">Clear history</button></div>';
  $('body_history').innerHTML = html;
}
async function loadExamples() {
  const r = await (await fetch('/api/examples')).json();
  $('body_examples').innerHTML = r.examples.map(q =>
    `<div class="example" onclick="useQuestion(${JSON.stringify(q).replace(/"/g, '&quot;')})">${esc(q)}</div>`
  ).join('');
}
// C8: catalog browser
async function loadCatalog() {
  const cat = await (await fetch('/api/catalog', {method: 'POST'})).json();
  let html = '';
  for (const [mod, m] of Object.entries(cat.modules).sort()) {
    html += `<details class="cat-mod"><summary>${esc(mod)}</summary>`;
    for (const [obj, o] of Object.entries(m.objects)) {
      html += `<div class="cat-obj"><strong>${esc(obj)}</strong>` +
        `<div class="desc">${esc(o.description || '')} — tables: ${esc((o.tables || []).join(', '))}</div>` +
        (o.business_questions || []).map(q =>
          `<div class="cat-q" onclick="useQuestion(${JSON.stringify(q).replace(/"/g, '&quot;')})">&#8250; ${esc(q)}</div>`
        ).join('') + '</div>';
    }
    html += '</details>';
  }
  $('body_catalog').innerHTML = html || '<div class="rowinfo">catalog unavailable</div>';
}
function useQuestion(q) { $('question').value = q; $('question').focus(); }

// ---------- chat ----------
let msgSeq = 0;
function addMsg(who, html) {
  const d = document.createElement('div');
  d.className = 'msg ' + who;
  d.innerHTML = `<div class="who">${who === 'user' ? 'You' : 'Engine'}</div>` +
    `<div class="bubble">${html}</div>`;
  $('messages').appendChild(d);
  $('messages').scrollTop = $('messages').scrollHeight;
  return d;
}
async function ask() {
  const q = $('question').value.trim();
  if (!q) return;
  $('question').value = '';
  addMsg('user', esc(q));
  const wait = addMsg('engine', '<em class="rowinfo">thinking…</em>');
  try {
    const out = await (await fetch('/api/generate', {method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({question: q})})).json();
    wait.querySelector('.bubble').innerHTML = renderAnswer(out);
    const cls = out.classification || {};
    addToHistory(q, cls.confidence, cls.modules);
    addUsage(out.usage || (cls._usage));
    attachCharts(wait, out);
  } catch (e) {
    wait.querySelector('.bubble').innerHTML = `<span class="err">${esc(e.message || e)}</span>`;
  }
}
function renderAnswer(out) {
  const cls = out.classification || {};
  let html = '';
  if (cls.confidence)
    html += `<span class="badge ${cls.confidence === 'high' ? 'high' : ''}">${esc(cls.confidence)}</span>`;
  if (out.template) html += `<span class="badge tpl">template: ${esc(out.template)}</span>`;
  if (cls.interpretation) html += `<span class="rowinfo">${esc(cls.interpretation)}</span>`;
  if (out.answer_markdown && !out.sql)
    html += `<div style="margin-top:6px;white-space:pre-wrap">${esc(out.answer_markdown)}</div>`;
  if (out.sql) html += `<pre class="sql">${esc(out.sql)}</pre>`;
  const res = out.result;
  if (res && res.governance_block) return html + shieldHtml(res);
  if (res && res.error)
    return html + `<div class="err" style="margin-top:6px">${esc(res.error)}</div>`;
  if (res && res.rows) {
    const id = 'm' + (msgSeq++);
    html += tableHtml(res) +
      `<div class="toolbar" id="bar_${id}">` + exportButtons(out.sql) +
      `</div><canvas class="chart" id="chart_${id}" width="760" height="300" style="display:none"></canvas>`;
  }
  if (out.clarification_needed) {
    html += `<div style="margin-top:6px">I need a bit more detail. Try one of:</div>` +
      (out.suggestions || []).map(s =>
        `<span class="chip" onclick="useQuestion(${JSON.stringify(s.prompt).replace(/"/g, '&quot;')})">${esc(s.prompt)}</span>`
      ).join('');
    if (out.template_error)
      html += `<div class="rowinfo" style="margin-top:4px">template error: ${esc(out.template_error)}</div>`;
  }
  return html;
}
function shieldHtml(res) {
  return `<div class="shield" style="margin-top:6px"><div class="stitle">&#128737; Governance block — ${esc(res.type)}</div>` +
    `${esc(res.message)}</div>`;
}

// ---------- results table (C2/C3 client-side formats) ----------
const ID_COLS = new Set(('belnr bukrs gjahr buzei lifnr kunnr matnr ebeln ebelp vbeln saknr kostl ' +
  'aufnr pernr objnr werks lgort spras waers banfn bnfpo doc_id event_id user_id session_id ' +
  'l_orderkey o_orderkey c_custkey s_suppkey p_partkey n_nationkey r_regionkey').split(' '));
function colFormat(name) {
  const n = name.toLowerCase();
  if (ID_COLS.has(n)) return 'none';
  if (/date|_dt$|budat|augdt|bldat/.test(n)) return 'date';
  const toks = n.split(/[^a-z0-9]+/);
  if (toks.some(t => ['count','cnt','num','qty','quantity','headcount'].includes(t))) return 'count';
  if (toks.some(t => ['center','element','id','key','code','flag','year','month','pct','ratio','rate','score'].includes(t))) return 'none';
  if (toks.some(t => ['amount','amt','dmbtr','wrbtr','netwr','spend','revenue','price','balance','salary','value'].includes(t))) return 'currency';
  return 'none';
}
function fmtCell(v, fmt) {
  if (v === null || v === undefined) return 'NULL';
  if (fmt === 'currency' && isFinite(v)) return '$' + Number(v).toLocaleString(undefined, {minimumFractionDigits: 2, maximumFractionDigits: 2});
  if (fmt === 'count' && isFinite(v)) return Number(v).toLocaleString();
  return String(v);
}
function tableHtml(res) {
  const fmts = res.columns.map(colFormat);
  const head = res.columns.map(c => `<th>${esc(c)}</th>`).join('');
  const body = res.rows.map(row =>
    '<tr>' + row.map((v, i) => {
      const numeric = typeof v === 'number';
      return `<td class="${numeric ? 'num' : ''}">${esc(fmtCell(v, fmts[i]))}</td>`;
    }).join('') + '</tr>').join('');
  const more = res.has_more ? ` (capped — more rows available)` : '';
  return `<table class="res"><thead><tr>${head}</tr></thead><tbody>${body}</tbody></table>` +
    `<div class="rowinfo">${res.row_count} row${res.row_count === 1 ? '' : 's'}${more}</div>`;
}
function exportButtons(sql) {
  if (!sql) return '';
  const j = JSON.stringify(sql).replace(/"/g, '&quot;');
  return ['csv', 'tsv', 'excel'].map(f =>
    `<button onclick="exportResult(${j}, '${f}')">${f.toUpperCase()}</button>`).join('');
}
async function exportResult(sql, format) {
  const r = await fetch('/api/export', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({sql, format})});
  if (!r.ok) { alert('export failed'); return; }
  const blob = await r.blob();
  const a = document.createElement('a');
  a.href = URL.createObjectURL(blob);
  a.download = 'results.' + (format === 'excel' ? 'xls' : format);
  a.click(); URL.revokeObjectURL(a.href);
}

// ---------- charts (C4) ----------
const CHART_COLORS = ['#4da3ff', '#3ecf8e', '#ffb454', '#ff6b6b', '#b07cff', '#49c7da'];
function attachCharts(msgEl, out) {
  const chart = out.chart, res = out.result;
  if (!chart || !res || !res.rows || !res.rows.length) return;
  const bar = msgEl.querySelector('.toolbar');
  const canvas = msgEl.querySelector('canvas.chart');
  if (!bar || !canvas) return;
  for (const t of chart.suggested_types) {
    const b = document.createElement('button');
    b.textContent = '📊 ' + t;
    b.onclick = () => { canvas.style.display = 'block'; drawChart(canvas, chart, res, t); };
    bar.appendChild(b);
  }
}
function chartData(chart, res, maxPts) {
  const li = res.columns.indexOf(chart.label_col);
  const vis = chart.value_cols.map(c => res.columns.indexOf(c));
  const rows = res.rows.slice(0, maxPts || 40);
  return {
    labels: rows.map((r, i) => li >= 0 ? String(r[li]) : String(i + 1)),
    series: vis.map(vi => rows.map(r => Number(r[vi]) || 0)),
    names: chart.value_cols,
  };
}
function drawChart(canvas, chart, res, type) {
  const ctx = canvas.getContext('2d');
  const W = canvas.width, H = canvas.height, padL = 60, padB = 46, padT = 16, padR = 10;
  ctx.clearRect(0, 0, W, H);
  ctx.font = '11px sans-serif';
  const d = chartData(chart, res, type === 'pie' ? 8 : 40);
  if (type === 'pie') { drawPie(ctx, W, H, d); return; }
  const all = d.series.flat();
  const maxV = Math.max(...all, 0), minV = Math.min(...all, 0);
  const span = (maxV - minV) || 1;
  const plotW = W - padL - padR, plotH = H - padT - padB;
  const y = v => padT + plotH * (1 - (v - minV) / span);
  // axes + gridlines
  ctx.strokeStyle = '#2a3342'; ctx.fillStyle = '#8b96a5';
  for (let g = 0; g <= 4; g++) {
    const gy = padT + plotH * g / 4, gv = maxV - span * g / 4;
    ctx.beginPath(); ctx.moveTo(padL, gy); ctx.lineTo(W - padR, gy); ctx.stroke();
    ctx.fillText(gv.toLocaleString(undefined, {maximumFractionDigits: 1}), 4, gy + 4);
  }
  const n = d.labels.length, step = plotW / Math.max(n, 1);
  // x labels (thinned)
  const every = Math.ceil(n / 12);
  ctx.save();
  d.labels.forEach((lb, i) => {
    if (i % every) return;
    const x = padL + step * (i + 0.5);
    ctx.save(); ctx.translate(x, H - padB + 12); ctx.rotate(-Math.PI / 5);
    ctx.fillText(lb.slice(0, 14), -20, 8); ctx.restore();
  });
  ctx.restore();
  if (type === 'bar') {
    const bw = step / (d.series.length + 0.5);
    d.series.forEach((s, si) => {
      ctx.fillStyle = CHART_COLORS[si % CHART_COLORS.length];
      s.forEach((v, i) => {
        const x = padL + step * i + bw * (si + 0.25);
        ctx.fillRect(x, Math.min(y(v), y(0)), bw * 0.9, Math.abs(y(v) - y(0)));
      });
    });
  } else { // line
    d.series.forEach((s, si) => {
      ctx.strokeStyle = CHART_COLORS[si % CHART_COLORS.length]; ctx.lineWidth = 2;
      ctx.beginPath();
      s.forEach((v, i) => {
        const x = padL + step * (i + 0.5);
        i ? ctx.lineTo(x, y(v)) : ctx.moveTo(x, y(v));
      });
      ctx.stroke();
    });
  }
  // legend
  d.names.forEach((nm, si) => {
    ctx.fillStyle = CHART_COLORS[si % CHART_COLORS.length];
    ctx.fillRect(padL + 120 * si, 2, 10, 10);
    ctx.fillStyle = '#d7dee8'; ctx.fillText(nm.slice(0, 16), padL + 14 + 120 * si, 11);
  });
}
function drawPie(ctx, W, H, d) {
  const vals = d.series[0].map(v => Math.max(v, 0));
  const total = vals.reduce((a, b) => a + b, 0) || 1;
  const cx = W * 0.35, cy = H / 2, r = Math.min(W, H) / 2 - 24;
  let a0 = -Math.PI / 2;
  vals.forEach((v, i) => {
    const a1 = a0 + v / total * 2 * Math.PI;
    ctx.fillStyle = CHART_COLORS[i % CHART_COLORS.length];
    ctx.beginPath(); ctx.moveTo(cx, cy); ctx.arc(cx, cy, r, a0, a1); ctx.closePath(); ctx.fill();
    a0 = a1;
  });
  ctx.font = '12px sans-serif';
  d.labels.forEach((lb, i) => {
    ctx.fillStyle = CHART_COLORS[i % CHART_COLORS.length];
    ctx.fillRect(W * 0.68, 24 + 18 * i, 10, 10);
    ctx.fillStyle = '#d7dee8';
    const pct = (vals[i] / total * 100).toFixed(1);
    ctx.fillText(`${lb.slice(0, 20)} (${pct}%)`, W * 0.68 + 16, 33 + 18 * i);
  });
}

// ---------- dev mode (C7) ----------
let pipeLoaded = false;
function toggleDev() {
  $('devpanel').classList.toggle('open');
  if (!pipeLoaded) { pipeLoaded = true; loadPipelineList(); }
}
async function loadPipelineList() {
  try {
    const r = await fetch('/api/pipeline', {method: 'POST',
      headers: {'Content-Type': 'application/json'}, body: JSON.stringify({name: 'list'})});
    const res = await r.json();
    const sel = $('pipesel');
    (res.queries || []).forEach(q => {
      const o = document.createElement('option'); o.value = q; o.textContent = q;
      sel.appendChild(o);
    });
  } catch (e) { /* extension surface absent — selector stays empty */ }
}
async function devPipeline() {
  const name = $('pipesel').value;
  if (!name) return;
  $('devstatus').textContent = 'running ' + name + '…';
  const t0 = performance.now();
  const r = await fetch('/api/pipeline', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({name})});
  const res = await r.json();
  const ms = Math.round(performance.now() - t0);
  if (res.error) {
    $('devstatus').textContent = 'error';
    $('devout').innerHTML = `<div class="err">${esc(res.error)}</div>`;
  } else {
    $('devstatus').textContent = `${res.row_count} rows · ${ms} ms`;
    $('devout').innerHTML = `<div class="rowinfo">pipeline: ${esc(res.query)}</div>` + tableHtml(res);
  }
}
async function devRun() {
  const sql = $('devsql').value.trim();
  if (!sql) return;
  $('devstatus').textContent = 'running…';
  const t0 = performance.now();
  const r = await fetch('/api/execute', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({sql})});
  const res = await r.json();
  const ms = Math.round(performance.now() - t0);
  if (res.governance_block) {
    $('devstatus').textContent = 'blocked';
    $('devout').innerHTML = shieldHtml(res);
  } else if (res.error) {
    $('devstatus').textContent = 'error';
    $('devout').innerHTML = `<div class="err">${esc(res.error)}</div>` +
      (res.spark_sql ? `<pre class="sql">${esc(res.spark_sql)}</pre>` : '');
  } else {
    $('devstatus').textContent = `${res.row_count} rows · ${ms} ms`;
    $('devout').innerHTML = tableHtml(res) +
      `<div class="toolbar">${exportButtons(sql)}` +
      ` <button onclick="devLineage()">lineage</button>` +
      ` <button onclick="devExplain()">explain</button></div>` +
      `<div id="devlineage"></div>` +
      (res.spark_sql && res.spark_sql !== sql
        ? `<div class="rowinfo">transpiled:</div><pre class="sql">${esc(res.spark_sql)}</pre>` : '');
  }
}
async function devExplain() {
  const sql = $('devsql').value.trim();
  if (!sql) return;
  const r = await fetch('/api/explain', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({sql})});
  const res = await r.json();
  const el = $('devlineage');
  if (res.error) { el.innerHTML = `<div class="err">${esc(res.error)}</div>`; return; }
  el.innerHTML = `<div class="rowinfo">physical plan (${esc(res.mode)}):</div>` +
    `<pre class="sql">${esc(res.plan)}</pre>`;
}
async function devLineage() {
  const sql = $('devsql').value.trim();
  if (!sql) return;
  const r = await fetch('/api/lineage', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({sql})});
  const res = await r.json();
  const el = $('devlineage');
  if (res.error) { el.innerHTML = `<div class="err">${esc(res.error)}</div>`; return; }
  const rows = Object.entries(res.columns).map(([col, srcs]) =>
    `<tr><td>${esc(col)}</td><td>${srcs.length ? srcs.map(esc).join(', ') : '<i>derived/constant</i>'}</td></tr>`
  ).join('');
  el.innerHTML = `<div class="rowinfo">column lineage (base columns feeding each output):</div>` +
    `<table class="results"><thead><tr><th>column</th><th>sources</th></tr></thead><tbody>${rows}</tbody></table>`;
}

// ---------- knowledge-graph explorer ----------
const kg = { nodes: [], links: [], loaded: false, sim: null, drag: null, scale: 1, ox: 0, oy: 0 };
const KG_COLORS = {FI_GL:'#4da3ff', FI_AP:'#3ecf8e', FI_AR:'#49c7da', CO:'#ffb454',
  MM:'#ff6b6b', SD:'#b07cff', PM:'#e789c7', HR:'#9acd32', PAY:'#f2e55c', BEN:'#8fb8ff'};
async function openKG() {
  $('kgpanel').classList.add('open');
  const c = $('kgcanvas');
  c.width = c.clientWidth; c.height = c.clientHeight;
  if (!kg.loaded) {
    const g = await (await fetch('/api/kg/graph')).json();
    // show the structural layers (modules / objects / tables); concept-alias
    // nodes are search fodder, not layout fodder
    const keep = new Set(['module', 'object', 'table']);
    kg.nodes = g.nodes.filter(n => keep.has(n.kind)).map((n, i) => ({...n,
      x: c.width / 2 + 230 * Math.cos(i * 2.399), y: c.height / 2 + 230 * Math.sin(i * 2.399),
      vx: 0, vy: 0}));
    const byId = Object.fromEntries(kg.nodes.map(n => [n.id, n]));
    kg.links = g.links.map(l => ({s: byId[l.source], t: byId[l.target], kind: l.kind || ''}))
      .filter(l => l.s && l.t);
    const nTables = kg.nodes.filter(n => n.kind === 'table').length;
    const nJoins = kg.links.filter(l => l.kind === 'joins').length;
    $('kgstats').textContent = `${nTables} tables · ${nJoins} joins · ` +
      `${g.stats.nodes} nodes total`;
    kg.loaded = true;
    let ticks = 0;
    kg.sim = setInterval(() => { kgTick(); kgDraw(); if (++ticks > 300) clearInterval(kg.sim); }, 16);
  }
  kgDraw();
}
function closeKG() { $('kgpanel').classList.remove('open'); }
function kgTick() {
  const c = $('kgcanvas');
  // repulsion (O(n^2) is fine for ~60 nodes) + springs + center pull
  for (const a of kg.nodes) {
    let fx = (c.width / 2 - a.x) * 0.002, fy = (c.height / 2 - a.y) * 0.002;
    for (const b of kg.nodes) {
      if (a === b) continue;
      const dx = a.x - b.x, dy = a.y - b.y, d2 = dx * dx + dy * dy + 20;
      const f = 1800 / d2;
      fx += dx * f / Math.sqrt(d2); fy += dy * f / Math.sqrt(d2);
    }
    a.vx = (a.vx + fx) * 0.85; a.vy = (a.vy + fy) * 0.85;
  }
  for (const l of kg.links) {
    const dx = l.t.x - l.s.x, dy = l.t.y - l.s.y;
    const d = Math.sqrt(dx * dx + dy * dy) || 1, f = (d - 90) * 0.01;
    l.s.vx += dx / d * f; l.s.vy += dy / d * f;
    l.t.vx -= dx / d * f; l.t.vy -= dy / d * f;
  }
  for (const n of kg.nodes) {
    if (n === kg.drag) continue;
    n.x += n.vx; n.y += n.vy;
  }
}
function kgDraw() {
  const c = $('kgcanvas'), ctx = c.getContext('2d');
  ctx.clearRect(0, 0, c.width, c.height);
  const filter = $('kgsearch').value.trim().toLowerCase();
  ctx.strokeStyle = '#2a3342';
  for (const l of kg.links) {
    ctx.beginPath(); ctx.moveTo(l.s.x, l.s.y); ctx.lineTo(l.t.x, l.t.y); ctx.stroke();
  }
  ctx.font = '10px sans-serif'; ctx.textAlign = 'center';
  for (const n of kg.nodes) {
    const hit = filter && (n.label || '').toLowerCase().includes(filter);
    const dim = filter && !hit;
    ctx.globalAlpha = dim ? 0.25 : 1;
    const r = n.kind === 'module' ? 11 : (n.kind === 'object' ? 7 : 5);
    ctx.fillStyle = n.kind === 'table'
      ? (KG_COLORS[n.module] || '#8b96a5')
      : (n.kind === 'module' ? '#d7dee8' : '#5a6b80');
    ctx.beginPath(); ctx.arc(n.x, n.y, hit ? r + 3 : r, 0, 7); ctx.fill();
    if (n.kind !== 'object' || hit) {
      ctx.fillStyle = n.kind === 'module' ? '#ffb454' : '#d7dee8';
      ctx.fillText(n.label || n.id, n.x, n.y - r - 4);
    }
  }
  ctx.globalAlpha = 1;
}
function kgNodeAt(x, y) {
  return kg.nodes.find(n => (n.x - x) ** 2 + (n.y - y) ** 2 < 120);
}
$('kgcanvas').addEventListener('mousedown', e => {
  const r = e.target.getBoundingClientRect();
  kg.drag = kgNodeAt(e.clientX - r.left, e.clientY - r.top) || null;
});
$('kgcanvas').addEventListener('mousemove', e => {
  if (!kg.drag) return;
  const r = e.target.getBoundingClientRect();
  kg.drag.x = e.clientX - r.left; kg.drag.y = e.clientY - r.top; kgDraw();
});
$('kgcanvas').addEventListener('mouseup', async e => {
  const r = e.target.getBoundingClientRect();
  const n = kgNodeAt(e.clientX - r.left, e.clientY - r.top);
  kg.drag = null;
  if (!n || n.kind !== 'table') return;
  const t = await (await fetch('/api/kg/table/' + encodeURIComponent(n.label))).json();
  if (t.error) { $('kgdetail').innerHTML = `<div class="err">${esc(t.error)}</div>`; return; }
  $('kgdetail').innerHTML = `<h3 style="margin:4px 0">${esc(t.table)}</h3>` +
    `<div class="rowinfo">${esc(t.module)} · ${esc(t.object || '')}</div>` +
    `<p>${esc(t.description || '')}</p>` +
    (t.primary_key && t.primary_key.length ? `<div class="rowinfo">PK: ${esc(t.primary_key.join(', '))}</div>` : '') +
    `<table>` + (t.columns || []).map(col =>
      `<tr><td><strong>${esc(col.column)}</strong></td><td class="rowinfo">${esc(col.type || '')}` +
      `</td><td class="rowinfo">${esc(col.description || '')}</td></tr>`).join('') + `</table>`;
});

// ---------- init ----------
checkStatus(); loadExamples(); loadCatalog(); renderHistory(); renderTokens();
</script>
</body>
</html>
"""
