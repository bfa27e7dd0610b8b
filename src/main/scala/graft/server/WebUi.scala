package graft.server

/** The control-plane HTML UI (§2.7), the counterpart of the reference's
  * `server/index.go:29-699`: a single static page served at `/` whose
  * JavaScript drives the same REST endpoints a human operator would use —
  * tabbed Tables / Clusters / Schemas / Settings views, incremental search,
  * limit+1-probe pagination, add/delete with confirmation, and a config
  * editor with reload/save.
  *
  * Where the reference pulls Bootstrap + jQuery from a CDN, this page is
  * fully self-contained (inline CSS, vanilla JS): the engine runs in
  * egress-less environments, and a control plane must not depend on a
  * third-party CDN being reachable to be operable.
  *
  * Wire contract reproduced from index.go's AJAX calls:
  *  - `POST /{table,cluster,schema}` form-encoded `cmd=list&filter=&offset=&limit=`
  *    → newline-delimited JSON rows; the client asks for pagesize+1 rows and
  *    enables "Next" only when the probe row comes back (index.go:489-523).
  *  - `POST /{type}?cmd=add` / `?cmd=del` with the form-encoded object
  *    (index.go:541-546, 618-622).
  *  - `GET /config?cmd=get` text body; `POST /config?cmd=set` with the edited
  *    body (index.go:589-596, 673-681).
  */
object WebUi {

  val page: String = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>Graft</title>
<style>
  :root { --bg:#1f2430; --fg:#e8eaf0; --accent:#4a90d9; --ok:#3d9970; --err:#d9534f; }
  body { margin:0; font-family:system-ui,sans-serif; background:#f5f6f8; color:#222; }
  nav { background:var(--bg); color:var(--fg); padding:10px 16px; font-size:18px; font-weight:600; }
  .tabs { display:flex; gap:2px; background:var(--bg); padding:0 8px; }
  .tabs button { border:0; padding:8px 16px; background:transparent; color:#aab; cursor:pointer; font-size:14px; }
  .tabs button.active { background:#f5f6f8; color:#222; border-radius:4px 4px 0 0; }
  .pane { display:none; padding:12px 16px; }
  .pane.active { display:block; }
  .bar { display:flex; justify-content:space-between; margin-bottom:8px; }
  input, select, textarea { padding:5px 8px; border:1px solid #bbb; border-radius:3px; font-size:13px; }
  button.act { background:var(--ok); color:#fff; border:0; padding:6px 12px; border-radius:3px; cursor:pointer; }
  button.danger { background:var(--err); color:#fff; border:0; padding:3px 9px; border-radius:3px; cursor:pointer; }
  button.pg { border:1px solid #bbb; background:#fff; padding:4px 10px; border-radius:3px; cursor:pointer; }
  button.pg.active { background:var(--accent); color:#fff; border-color:var(--accent); }
  button:disabled { opacity:.45; cursor:default; }
  table.list { width:100%; border-collapse:collapse; background:#fff; font-size:13px; }
  table.list th, table.list td { text-align:left; padding:6px 10px; border-bottom:1px solid #e3e5e8; }
  table.list th { background:#eceef1; }
  .pager { display:flex; gap:6px; justify-content:center; margin:10px 0; }
  dialog { border:1px solid #999; border-radius:6px; padding:18px; min-width:380px; }
  dialog::backdrop { background:rgba(0,0,0,.35); }
  dialog form label { display:block; margin:8px 0 2px; font-size:12px; color:#555; }
  dialog form input, dialog form select, dialog form textarea { width:100%; box-sizing:border-box; }
  .msg { padding:6px 10px; border-radius:3px; margin:8px 0; display:none; font-size:13px; }
  .msg.err { background:#fbe4e4; color:#8a2320; }
  .msg.ok { background:#e2f3ea; color:#1f5c40; }
  #config_editor { width:100%; min-height:260px; font-family:monospace; box-sizing:border-box; }
  td.body { max-width:480px; overflow:hidden; text-overflow:ellipsis; white-space:nowrap; }
</style>
</head>
<body>
<nav>Graft</nav>
<div class="tabs" id="tabs">
  <button data-pane="tables" class="active">Tables</button>
  <button data-pane="clusters">Clusters</button>
  <button data-pane="schemas">Schemas</button>
  <button data-pane="settings">Settings</button>
</div>

<div class="pane active" id="pane_tables">
  <div class="bar">
    <button class="act" data-open="add_table">&#10133; Register</button>
    <input id="table_filter" type="search" placeholder="Search">
  </div>
  <div class="msg err" id="table_err"></div>
  <table class="list" id="table_list"><thead><tr>
    <th>Service</th><th>Cluster</th><th>DB</th><th>Table</th><th>Input</th>
    <th>Output</th><th>Format</th><th>Version</th><th>State</th><th></th>
  </tr></thead><tbody></tbody></table>
  <div class="pager">
    <button class="pg" id="table_prev">Previous</button>
    <button class="pg" id="table_next">Next</button>
    <span style="width:24px"></span>
    <button class="pg active" data-pager="table" data-pagesize="25">25</button>
    <button class="pg" data-pager="table" data-pagesize="50">50</button>
    <button class="pg" data-pager="table" data-pagesize="100">100</button>
  </div>
</div>

<div class="pane" id="pane_clusters">
  <div class="bar">
    <button class="act" data-open="add_cluster">&#10133; New</button>
    <input id="cluster_filter" type="search" placeholder="Search">
  </div>
  <div class="msg err" id="cluster_err"></div>
  <table class="list" id="cluster_list"><thead><tr>
    <th>Name</th><th>Host</th><th>Port</th><th>User</th><th></th>
  </tr></thead><tbody></tbody></table>
  <div class="pager">
    <button class="pg" id="cluster_prev">Previous</button>
    <button class="pg" id="cluster_next">Next</button>
    <span style="width:24px"></span>
    <button class="pg active" data-pager="cluster" data-pagesize="25">25</button>
    <button class="pg" data-pager="cluster" data-pagesize="50">50</button>
    <button class="pg" data-pager="cluster" data-pagesize="100">100</button>
  </div>
</div>

<div class="pane" id="pane_schemas">
  <div class="bar">
    <button class="act" data-open="add_schema">&#10133; Register</button>
    <input id="schema_filter" type="search" placeholder="Search">
  </div>
  <div class="msg err" id="schema_err"></div>
  <table class="list" id="schema_list"><thead><tr>
    <th>Name</th><th>Type</th><th>Body</th><th></th>
  </tr></thead><tbody></tbody></table>
  <div class="pager">
    <button class="pg" id="schema_prev">Previous</button>
    <button class="pg" id="schema_next">Next</button>
    <span style="width:24px"></span>
    <button class="pg active" data-pager="schema" data-pagesize="25">25</button>
    <button class="pg" data-pager="schema" data-pagesize="50">50</button>
    <button class="pg" data-pager="schema" data-pagesize="100">100</button>
  </div>
</div>

<div class="pane" id="pane_settings">
  <div class="msg err" id="config_err"></div>
  <div class="msg ok" id="config_ok">Saved</div>
  <textarea id="config_editor" spellcheck="false"></textarea>
  <div style="margin-top:8px; display:flex; gap:8px;">
    <button class="act" id="config_save">Save</button>
    <button class="pg" id="config_reset">Reload</button>
  </div>
</div>

<dialog id="add_table">
  <form id="table_add">
    <h3 style="margin-top:0">Register table</h3>
    <label>Service</label><input name="service" required>
    <label>Cluster</label><input name="cluster" required>
    <label>DB</label><input name="db" required>
    <label>Table</label><input name="table" required>
    <label>Input</label>
    <select name="input"><option>mysql</option><option>kafka</option><option>file</option></select>
    <label>Output</label>
    <select name="output"><option>kafka</option><option>file</option><option>hdfs</option><option>s3</option><option>sql</option></select>
    <label>Format</label>
    <select name="outputFormat"><option>json</option><option>avro</option><option>msgpack</option><option>mysql</option><option>ansisql</option><option>mysql_idempotent</option><option>ansisql_idempotent</option></select>
    <label>Version</label><input name="version" type="number" value="0">
    <label>Params (k=v,k=v)</label><input name="params">
    <div class="msg err" id="table_add_error"></div>
    <div style="margin-top:12px; display:flex; gap:8px; justify-content:flex-end;">
      <button type="button" class="pg" data-close="add_table">Cancel</button>
      <button type="submit" class="act" id="table_add_submit">Register</button>
    </div>
  </form>
</dialog>

<dialog id="add_cluster">
  <form id="cluster_add">
    <h3 style="margin-top:0">New cluster</h3>
    <label>Name</label><input name="name" required autofocus>
    <label>Host</label><input name="host" required>
    <label>Port</label><input name="port" type="number" min="1" max="65535" value="3306">
    <label>User</label><input name="user">
    <label>Password</label><input name="pw" type="password">
    <div class="msg err" id="cluster_add_error"></div>
    <div style="margin-top:12px; display:flex; gap:8px; justify-content:flex-end;">
      <button type="button" class="pg" data-close="add_cluster">Cancel</button>
      <button type="submit" class="act" id="cluster_add_submit">Add</button>
    </div>
  </form>
</dialog>

<dialog id="add_schema">
  <form id="schema_add">
    <h3 style="margin-top:0">Register schema</h3>
    <label>Name (db.table)</label><input name="name" required>
    <label>Type</label><select name="type"><option>struct</option></select>
    <label>Body (Spark StructType JSON)</label><textarea name="body" rows="10" required></textarea>
    <div class="msg err" id="schema_add_error"></div>
    <div style="margin-top:12px; display:flex; gap:8px; justify-content:flex-end;">
      <button type="button" class="pg" data-close="add_schema">Cancel</button>
      <button type="submit" class="act" id="schema_add_submit">Register</button>
    </div>
  </form>
</dialog>

<dialog id="confirm_delete">
  <div id="confirm_msg"></div>
  <div class="msg err" id="delete_error"></div>
  <div style="margin-top:12px; display:flex; gap:8px; justify-content:flex-end;">
    <button type="button" class="pg" data-close="confirm_delete">Cancel</button>
    <button type="button" class="danger" id="delete_yes">Delete</button>
  </div>
</dialog>

<script>
'use strict';
var curPage = { table: 0, cluster: 0, schema: 0 };
var pageSize = { table: 25, cluster: 25, schema: 25 };
var pending = null; // {type, obj} awaiting delete confirmation

function $(id) { return document.getElementById(id); }
function esc(s) {
  return String(s == null ? '' : s).replace(/[&<>"']/g, function (c) {
    return { '&': '&amp;', '<': '&lt;', '>': '&gt;', '"': '&quot;', "'": '&#39;' }[c];
  });
}
function enc(obj) {
  var parts = [];
  for (var k in obj) parts.push(encodeURIComponent(k) + '=' + encodeURIComponent(obj[k]));
  return parts.join('&');
}
function post(url, body) {
  return fetch(url, {
    method: 'POST',
    headers: { 'Content-Type': 'application/x-www-form-urlencoded' },
    body: body
  }).then(function (r) {
    return r.text().then(function (t) {
      if (!r.ok) throw new Error(t);
      return t;
    });
  });
}
function showErr(id, e) { $(id).textContent = String(e.message || e); $(id).style.display = 'block'; }
function hideErr(id) { $(id).style.display = 'none'; }

function rowHtml(type, obj) {
  var cells;
  if (type === 'table')
    cells = '<td>' + esc(obj.service) + '</td><td>' + esc(obj.cluster) + '</td><td>' +
      esc(obj.db) + '</td><td>' + esc(obj.table) + '</td><td>' + esc(obj.input) + '</td><td>' +
      esc(obj.output) + '</td><td>' + esc(obj.outputFormat) + '</td><td>' +
      esc(obj.version) + '</td><td>' + esc(obj.state) + '</td>';
  else if (type === 'cluster')
    cells = '<td>' + esc(obj.name) + '</td><td>' + esc(obj.host) + '</td><td>' +
      esc(obj.port) + '</td><td>' + esc(obj.user) + '</td>';
  else
    cells = '<td>' + esc(obj.name) + '</td><td>' + esc(obj.type) + '</td><td class="body">' +
      esc(obj.body) + '</td>';
  return '<tr>' + cells +
    '<td style="width:40px"><button class="danger" data-type="' + type +
    "\" data-obj='" + esc(JSON.stringify(obj)) + "'>&#10006;</button></td></tr>";
}

function loadPage(type) {
  hideErr(type + '_err');
  // ask for pagesize+1 rows: the extra row only proves a next page exists
  post('/' + type, enc({
    cmd: 'list',
    filter: $(type + '_filter').value,
    offset: curPage[type] * pageSize[type],
    limit: pageSize[type] + 1
  })).then(function (text) {
    var rows = text.split('\n').filter(function (l) { return l.length > 0; });
    if (rows.length === 0 && curPage[type] > 0) { curPage[type]--; loadPage(type); return; }
    var html = '';
    for (var i = 0; i < rows.length && i < pageSize[type]; i++)
      html += rowHtml(type, JSON.parse(rows[i]));
    $(type + '_list').tBodies[0].innerHTML = html;
    $(type + '_prev').disabled = curPage[type] === 0;
    $(type + '_next').disabled = rows.length <= pageSize[type];
  }).catch(function (e) { showErr(type + '_err', e); });
}

function confirmDelete(type, obj) {
  pending = { type: type, obj: obj };
  var msg;
  if (type === 'table')
    msg = 'Table ' + esc(obj.service) + '/' + esc(obj.cluster) + '/' + esc(obj.db) + '/' +
      esc(obj.table) + ' (output ' + esc(obj.output) + ', v' + esc(obj.version) +
      ') will be deregistered';
  else if (type === 'cluster')
    msg = "Cluster '" + esc(obj.name) + "' will be deleted from the registry";
  else
    msg = "Schema '" + esc(obj.name) + "' will be deleted from the registry";
  $('confirm_msg').innerHTML = msg;
  hideErr('delete_error');
  $('confirm_delete').showModal();
}

function setupType(type) {
  $(type + '_prev').addEventListener('click', function () { curPage[type]--; loadPage(type); });
  $(type + '_next').addEventListener('click', function () { curPage[type]++; loadPage(type); });
  $(type + '_filter').addEventListener('input', function () { curPage[type] = 0; loadPage(type); });
  $(type + '_list').addEventListener('click', function (e) {
    var b = e.target.closest('button[data-obj]');
    if (b) confirmDelete(b.getAttribute('data-type'), JSON.parse(b.getAttribute('data-obj')));
  });
  $(type + '_add').addEventListener('submit', function (e) {
    e.preventDefault();
    hideErr(type + '_add_error');
    $(type + '_add_submit').disabled = true;
    var data = {};
    new FormData(e.target).forEach(function (v, k) { data[k] = v; });
    post('/' + type + '?cmd=add', enc(data)).then(function () {
      loadPage(type);
      $('add_' + type).close();
      e.target.reset();
    }).catch(function (err) { showErr(type + '_add_error', err); })
      .finally(function () { $(type + '_add_submit').disabled = false; });
  });
}

document.addEventListener('click', function (e) {
  var t = e.target;
  if (t.hasAttribute && t.hasAttribute('data-open')) $(t.getAttribute('data-open')).showModal();
  if (t.hasAttribute && t.hasAttribute('data-close')) $(t.getAttribute('data-close')).close();
  if (t.hasAttribute && t.hasAttribute('data-pane')) {
    document.querySelectorAll('#tabs button').forEach(function (b) { b.classList.remove('active'); });
    document.querySelectorAll('.pane').forEach(function (p) { p.classList.remove('active'); });
    t.classList.add('active');
    $('pane_' + t.getAttribute('data-pane')).classList.add('active');
  }
  if (t.hasAttribute && t.hasAttribute('data-pager')) {
    var ty = t.getAttribute('data-pager');
    document.querySelectorAll('button[data-pager=' + ty + ']').forEach(function (b) { b.classList.remove('active'); });
    t.classList.add('active');
    pageSize[ty] = Number(t.getAttribute('data-pagesize'));
    curPage[ty] = 0;
    loadPage(ty);
  }
});

$('delete_yes').addEventListener('click', function () {
  if (!pending) return;
  var p = pending;
  $('delete_yes').disabled = true;
  post('/' + p.type + '?cmd=del', enc(p.obj)).then(function () {
    loadPage(p.type);
    $('confirm_delete').close();
    pending = null;
  }).catch(function (e) { showErr('delete_error', e); })
    .finally(function () { $('delete_yes').disabled = false; });
});

function configLoad() {
  hideErr('config_err'); hideErr('config_ok');
  fetch('/config?cmd=get').then(function (r) { return r.text(); })
    .then(function (t) { $('config_editor').value = t; })
    .catch(function (e) { showErr('config_err', e); });
}
$('config_reset').addEventListener('click', configLoad);
$('config_save').addEventListener('click', function () {
  hideErr('config_err'); hideErr('config_ok');
  fetch('/config?cmd=set', { method: 'POST', body: $('config_editor').value })
    .then(function (r) {
      return r.text().then(function (t) {
        if (!r.ok) throw new Error(t);
        $('config_ok').style.display = 'block';
      });
    }).catch(function (e) { showErr('config_err', e); });
});

setupType('table');
setupType('cluster');
setupType('schema');
loadPage('table');
loadPage('cluster');
loadPage('schema');
configLoad();
</script>
</body>
</html>
"""
}
