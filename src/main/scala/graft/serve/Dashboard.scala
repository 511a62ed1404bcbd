package graft.serve

/** The single-page dashboard of the reference UI
  * (`/root/reference/api.py:277-584`): pipeline-run form, 3-second run
  * polling, preview table, stats cards, CSV file listing — re-expressed as
  * one self-contained static page. The reference pulls Tailwind and axios
  * from CDNs; this container is offline, so the page inlines a small
  * stylesheet and uses the browser-native `fetch` API. Behavior parity:
  * every button drives the same JSON endpoints with the same params and
  * renders the same information.
  */
object Dashboard {

  val html: String = """<!DOCTYPE html>
<html>
<head>
  <title>Graft Pipeline Dashboard</title>
  <meta charset="utf-8">
  <meta name="viewport" content="width=device-width, initial-scale=1">
  <style>
    :root { --blue:#2563eb; --green:#16a34a; --red:#dc2626; --gray:#6b7280; --purple:#7c3aed; --amber:#d97706; }
    * { box-sizing: border-box; }
    body { font-family: system-ui, -apple-system, sans-serif; background:#f3f4f6; margin:0; color:#111827; }
    .container { max-width: 960px; margin: 0 auto; padding: 2rem 1rem; }
    h1 { text-align:center; color:var(--blue); margin-bottom:2rem; }
    h2 { font-size:1.25rem; margin:0 0 1rem 0; }
    .card { background:#fff; border-radius:.5rem; box-shadow:0 1px 3px rgba(0,0,0,.15); padding:1.5rem; margin-bottom:1.5rem; }
    .grid3 { display:grid; grid-template-columns:repeat(auto-fit,minmax(200px,1fr)); gap:1rem; margin-bottom:1rem; }
    label { display:block; font-size:.875rem; font-weight:500; margin-bottom:.25rem; }
    input { width:100%; border:1px solid #d1d5db; border-radius:.25rem; padding:.5rem .75rem; font-size:.9rem; }
    button { border:0; border-radius:.25rem; color:#fff; font-weight:700; padding:.5rem 1rem; cursor:pointer; margin-right:.5rem; }
    button:hover { filter:brightness(.9); }
    .b-blue{background:var(--blue)} .b-gray{background:var(--gray)} .b-green{background:var(--green)}
    .b-red{background:var(--red)} .b-purple{background:var(--purple)} .b-amber{background:var(--amber)}
    .rowbar { display:flex; justify-content:space-between; align-items:center; margin-bottom:1rem; }
    #statusBar { margin-bottom:1rem; padding:.75rem; border-radius:.25rem; display:none; }
    .ok { background:#dcfce7; border:1px solid #86efac; color:#166534; }
    .err { background:#fee2e2; border:1px solid #fca5a5; color:#991b1b; }
    .run { padding:1rem; border-radius:.25rem; border:1px solid; margin-bottom:.5rem; }
    .run-pending{background:#fef9c3;border-color:#fde047;color:#854d0e}
    .run-running{background:#dbeafe;border-color:#93c5fd;color:#1e40af}
    .run-completed{background:#dcfce7;border-color:#86efac;color:#166534}
    .run-failed{background:#fee2e2;border-color:#fca5a5;color:#991b1b}
    .run-head { display:flex; justify-content:space-between; }
    .muted { color:var(--gray); }
    .small { font-size:.8rem; }
    .center { text-align:center; padding:1rem 0; }
    table { border-collapse:collapse; width:100%; background:#fff; font-size:.875rem; }
    th,td { border-bottom:1px solid #e5e7eb; padding:.5rem 1rem; text-align:left; }
    th { background:#f9fafb; }
    tr:nth-child(even) td { background:#f9fafb; }
    .statgrid { display:grid; grid-template-columns:repeat(auto-fit,minmax(180px,1fr)); gap:1rem; margin:1rem 0; }
    .stat { background:#fff; border-radius:.25rem; box-shadow:0 1px 2px rgba(0,0,0,.1); padding:1rem; }
    .stat .v { font-size:1.5rem; font-weight:700; }
    .tag { display:inline-block; background:#dbeafe; color:#1e40af; border-radius:.25rem; padding:.15rem .5rem; margin:.15rem; font-size:.8rem; }
    .overflow { overflow-x:auto; }
  </style>
</head>
<body>
<div class="container">
  <h1>Graft Pipeline Dashboard</h1>

  <div id="statusBar"><div id="statusMessage"></div></div>

  <div class="card">
    <h2>Pipeline Control</h2>
    <div class="grid3">
      <div><label>CSV Path:</label><input id="csvPath" value="data/raw/products.csv"></div>
      <div><label>DB Path:</label><input id="dbPath" value="data/processed/products"></div>
      <div><label>Table Name:</label><input id="tableName" value="products"></div>
    </div>
    <button class="b-blue" onclick="runPipeline()">&#128640; Run Pipeline</button>
    <button class="b-gray" onclick="listFiles()">&#128193; List Files</button>
  </div>

  <div class="card">
    <div class="rowbar">
      <h2 style="margin:0">Pipeline Runs</h2>
      <div>
        <button class="b-green" onclick="refreshRuns()">&#128260; Refresh</button>
        <button class="b-red" onclick="clearRuns()">&#128465; Clear History</button>
      </div>
    </div>
    <div id="pipelineRuns"><div class="muted center">No pipeline runs yet</div></div>
  </div>

  <div class="card">
    <h2>Data Explorer</h2>
    <div style="margin-bottom:1rem">
      <button class="b-purple" onclick="loadDataPreview()">&#128202; Load Data</button>
      <button class="b-amber" onclick="loadDataStats()">&#128200; Show Stats</button>
    </div>
    <div id="dataContainer" class="muted">Click "Load Data" or "Show Stats" to explore your data</div>
  </div>
</div>

<script>
function esc(s) {
  return String(s).replace(/&/g,'&amp;').replace(/</g,'&lt;').replace(/>/g,'&gt;').replace(/"/g,'&quot;');
}
function showStatus(message, isError = false) {
  const bar = document.getElementById('statusBar');
  document.getElementById('statusMessage').textContent = message;
  bar.className = isError ? 'err' : 'ok';
  bar.style.display = 'block';
  setTimeout(() => { bar.style.display = 'none'; }, 5000);
}
async function api(method, url, body) {
  const opts = { method, headers: {} };
  if (body !== undefined) {
    opts.headers['Content-Type'] = 'application/json';
    opts.body = JSON.stringify(body);
  }
  const resp = await fetch(url, opts);
  const data = await resp.json().catch(() => ({}));
  if (!resp.ok) throw new Error(data.detail || resp.statusText);
  return data;
}
async function runPipeline() {
  const config = {
    csv_path: document.getElementById('csvPath').value,
    db_path: document.getElementById('dbPath').value,
    table_name: document.getElementById('tableName').value
  };
  try {
    const data = await api('POST', '/api/pipeline/run',
      { config: config, run_name: 'Manual Run ' + new Date().toLocaleString() });
    showStatus('Pipeline started successfully! Run ID: ' + data.run_id);
    refreshRuns();
  } catch (e) { showStatus('Error starting pipeline: ' + e.message, true); }
}
async function refreshRuns() {
  try {
    const runs = await api('GET', '/api/pipeline/runs');
    const container = document.getElementById('pipelineRuns');
    if (runs.length === 0) {
      container.innerHTML = '<div class="muted center">No pipeline runs yet</div>';
      return;
    }
    const emojis = { pending:'⏳', running:'🔄', completed:'✅', failed:'❌' };
    container.innerHTML = runs.map(run => {
      const dur = run.end_time
        ? '<br>Duration: ' + Math.round((new Date(run.end_time) - new Date(run.start_time)) / 1000) + 's' : '';
      const recs = run.records_processed
        ? '<div class="small">Records: ' + run.records_processed + '</div>' : '';
      const err = run.error_message
        ? '<div class="small" style="color:var(--red);margin-top:.5rem">' + esc(run.error_message) + '</div>' : '';
      return '<div class="run run-' + esc(run.status) + '">' +
        '<div class="run-head"><div>' +
        '<div><b>' + (emojis[run.status] || '') + ' ' + esc(run.run_name || run.run_id) + '</b></div>' +
        '<div class="small">' + esc(run.message || run.status.toUpperCase()) + '</div>' + recs +
        '</div><div class="small muted">' + new Date(run.start_time).toLocaleString() + dur + '</div></div>' +
        err + '</div>';
    }).join('');
  } catch (e) { console.error('Error loading runs:', e); }
}
async function clearRuns() {
  if (!confirm('Are you sure you want to clear all pipeline runs history?')) return;
  try {
    await api('DELETE', '/api/pipeline/runs');
    showStatus('Pipeline runs history cleared');
    refreshRuns();
  } catch (e) { showStatus('Error clearing runs: ' + e.message, true); }
}
async function listFiles() {
  try {
    const data = await api('GET', '/api/files/list');
    if (data.files.length === 0) showStatus('No CSV files found in data/raw directory', true);
    else showStatus('Found ' + data.files.length + ' CSV files: ' +
      data.files.map(f => f.name + ' (' + f.size_mb + ' MB)').join(', '));
  } catch (e) { showStatus('Error listing files: ' + e.message, true); }
}
function explorerParams() {
  return 'db_path=' + encodeURIComponent(document.getElementById('dbPath').value) +
    '&table_name=' + encodeURIComponent(document.getElementById('tableName').value);
}
async function loadDataPreview() {
  const box = document.getElementById('dataContainer');
  try {
    const data = await api('GET', '/api/data/preview?' + explorerParams());
    if (data.data.length === 0) { box.innerHTML = '<div class="muted">No data found in the table</div>'; return; }
    let html = '<div class="overflow"><table><thead><tr>';
    data.columns.forEach(c => { html += '<th>' + esc(c) + '</th>'; });
    html += '</tr></thead><tbody>';
    data.data.forEach(row => {
      html += '<tr>';
      data.columns.forEach(c => { html += '<td>' + (row[c] == null ? '' : esc(row[c])) + '</td>'; });
      html += '</tr>';
    });
    html += '</tbody></table></div><div class="small muted" style="margin-top:.5rem">Showing ' + data.count + ' rows</div>';
    box.innerHTML = html;
  } catch (e) { box.innerHTML = '<div style="color:var(--red)">Error loading data: ' + esc(e.message) + '</div>'; }
}
async function loadDataStats() {
  const box = document.getElementById('dataContainer');
  try {
    const s = await api('GET', '/api/data/stats?' + explorerParams());
    box.innerHTML =
      '<div style="background:#f9fafb;padding:1.5rem;border-radius:.5rem">' +
      '<h3>&#128202; Database Statistics</h3>' +
      '<div class="statgrid">' +
      '<div class="stat"><div class="v" style="color:var(--blue)">' + s.total_records.toLocaleString() + '</div><div class="small muted">Total Records</div></div>' +
      '<div class="stat"><div class="v" style="color:var(--green)">' + s.columns_count + '</div><div class="small muted">Columns</div></div>' +
      '</div>' +
      '<div><b>Column Names:</b><div>' + s.columns.map(c => '<span class="tag">' + esc(c) + '</span>').join('') + '</div></div>' +
      '<div class="small muted" style="margin-top:1rem"><b>Table:</b> ' + esc(s.table_name) + '<br><b>Database:</b> ' + esc(s.database_path) + '</div>' +
      '</div>';
  } catch (e) { box.innerHTML = '<div style="color:var(--red)">Error loading stats: ' + esc(e.message) + '</div>'; }
}
setInterval(refreshRuns, 3000);
window.onload = refreshRuns;
</script>
</body>
</html>
"""
}
