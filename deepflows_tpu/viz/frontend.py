"""Single-file web frontend for the viz platform.

Replaces the reference's Vue 3 + Element-Plus + ECharts app
(`Visualization_frontend/src/views/{dashboard,model-builder,training-config}`)
with a dependency-free page offering the same three views: live dashboard
(loss/accuracy/resource charts over WebSocket), a model builder (layer-list
editor that posts a ``layers`` JSON), and training config (optimizer, lr,
epochs, batch size, start/stop).
"""

DASHBOARD_HTML = r"""<!doctype html>
<html><head><meta charset="utf-8"><title>deepflows_tpu — training platform</title>
<style>
 :root{--fg:#1a1a1a;--mut:#777;--line:#e3e3e3;--acc:#3b6fd4}
 body{font-family:system-ui,sans-serif;margin:0;background:#f7f7f8;color:var(--fg)}
 header{background:#fff;border-bottom:1px solid var(--line);padding:.8rem 1.4rem;
        display:flex;align-items:center;gap:1.5rem}
 header h1{font-size:1.05rem;margin:0}
 nav button{background:none;border:none;padding:.45rem .9rem;cursor:pointer;
            font-size:.95rem;color:var(--mut);border-radius:6px}
 nav button.active{color:var(--acc);background:#eef3fc;font-weight:600}
 main{max-width:960px;margin:1.2rem auto;padding:0 1rem}
 .card{background:#fff;border:1px solid var(--line);border-radius:8px;
       padding:1rem 1.2rem;margin-bottom:1rem}
 canvas{width:100%;height:170px;background:#fff}
 .row{display:flex;gap:.8rem;flex-wrap:wrap;align-items:center;margin:.4rem 0}
 label{font-size:.85rem;color:var(--mut)}
 input,select{padding:.35rem .5rem;border:1px solid var(--line);border-radius:5px}
 button.primary{background:var(--acc);color:#fff;border:none;border-radius:6px;
                padding:.5rem 1.2rem;cursor:pointer}
 button.ghost{background:#fff;border:1px solid var(--line);border-radius:6px;
              padding:.5rem 1rem;cursor:pointer}
 table{width:100%;border-collapse:collapse;font-size:.88rem}
 td,th{padding:.3rem .5rem;border-bottom:1px solid var(--line);text-align:left}
 #status{margin-left:auto;font-size:.85rem;color:var(--mut)}
 .stat{display:inline-block;margin-right:1.6rem}
 .stat b{font-size:1.3rem}
 pre{background:#f2f2f4;padding:.6rem;border-radius:6px;font-size:.8rem;overflow:auto}
</style></head><body>
<header>
 <h1>deepflows_tpu</h1>
 <nav>
  <button id="tab-dash" class="active" onclick="show('dash')">Dashboard</button>
  <button id="tab-model" onclick="show('model')">Model builder</button>
  <button id="tab-config" onclick="show('config')">Training config</button>
 </nav>
 <span id="status">idle</span>
</header>
<main>
 <section id="view-dash">
  <div class="card">
   <span class="stat">loss <b id="s-loss">—</b></span>
   <span class="stat">accuracy <b id="s-acc">—</b></span>
   <span class="stat">epoch <b id="s-epoch">—</b></span>
   <span class="stat">cpu <b id="s-cpu">—</b></span>
   <span class="stat">ram <b id="s-ram">—</b></span>
  </div>
  <div class="card"><label>training loss</label><canvas id="c-loss" width="900" height="170"></canvas></div>
  <div class="card"><label>batch accuracy</label><canvas id="c-acc" width="900" height="170"></canvas></div>
  <div class="card"><label>cpu / ram %</label><canvas id="c-res" width="900" height="170"></canvas></div>
 </section>

 <section id="view-model" style="display:none">
  <div class="card">
   <div class="row">
    <select id="layer-type">
     <option>Conv2d</option><option>BatchNorm2d</option><option>ReLU</option>
     <option>MaxPool2d</option><option>Flatten</option><option>Linear</option>
     <option>Dropout</option>
    </select>
    <input id="layer-args" placeholder='args JSON e.g. {"in_channels":1,"out_channels":32,"kernel_size":5,"padding":2}' size="60">
    <button class="ghost" onclick="addLayer()">add layer</button>
    <button class="ghost" onclick="clearLayers()">clear</button>
   </div>
   <table id="layers"><tr><th>#</th><th>type</th><th>args</th><th></th></tr></table>
   <p><label>resulting request body:</label></p><pre id="model-json">{}</pre>
  </div>
 </section>

 <section id="view-config" style="display:none">
  <div class="card">
   <div class="row"><label>model</label><select id="cfg-model"></select></div>
   <div class="row"><label>optimizer</label>
    <select id="cfg-opt"><option>adam</option><option>sgd</option>
     <option>adagrad</option><option>adadelta</option></select>
    <label>lr</label><input id="cfg-lr" value="0.001" size="8">
    <label>epochs</label><input id="cfg-epochs" value="3" size="5">
    <label>batch size</label><input id="cfg-bs" value="64" size="5">
   </div>
   <div class="row">
    <button class="primary" onclick="start()">Start training</button>
    <button class="ghost" onclick="stop()">Stop</button>
   </div>
  </div>
 </section>
</main>
<script>
const S={losses:[],accs:[],cpu:[],ram:[],layers:[]};
function show(v){
 for(const t of ['dash','model','config']){
  document.getElementById('view-'+t).style.display=t===v?'':'none';
  document.getElementById('tab-'+t).classList.toggle('active',t===v);
 }
}
function draw(id,series,colors){
 const c=document.getElementById(id),g=c.getContext('2d');
 g.clearRect(0,0,c.width,c.height);
 const all=series.flat(); if(!all.length)return;
 const max=Math.max(...all),min=Math.min(...all);
 series.forEach((data,si)=>{
  g.strokeStyle=colors[si];g.lineWidth=1.5;g.beginPath();
  data.forEach((v,i)=>{
   const x=i/(data.length-1||1)*c.width;
   const y=c.height-(v-min)/((max-min)||1)*(c.height-14)-7;
   i?g.lineTo(x,y):g.moveTo(x,y);
  });
  g.stroke();
 });
}
const ws=new WebSocket(`ws://${location.host}/ws`);
ws.onmessage=(e)=>{
 const m=JSON.parse(e.data);
 if(m.type==='metrics'){
  S.losses.push(m.data.loss);S.accs.push(m.data.accuracy);
  sv('s-loss',m.data.loss.toFixed(4));sv('s-acc',(100*m.data.accuracy).toFixed(1)+'%');
  sv('s-epoch',m.data.epoch+'/'+m.data.batch);
  draw('c-loss',[S.losses],['#d04545']);draw('c-acc',[S.accs],['#3b6fd4']);
 }else if(m.type==='resources'){
  S.cpu.push(m.data.cpu_percent);S.ram.push(m.data.memory_percent);
  if(S.cpu.length>120){S.cpu.shift();S.ram.shift();}
  sv('s-cpu',m.data.cpu_percent+'%');sv('s-ram',m.data.memory_percent+'%');
  draw('c-res',[S.cpu,S.ram],['#888','#c9a227']);
 }else if(m.type==='status'){sv('status',m.data);}
};
function sv(id,v){document.getElementById(id).textContent=v;}
function renderLayers(){
 const t=document.getElementById('layers');
 t.innerHTML='<tr><th>#</th><th>type</th><th>args</th><th></th></tr>';
 S.layers.forEach((l,i)=>{
  const r=t.insertRow();
  r.innerHTML=`<td>${i}</td><td>${l.type}</td><td><code>${JSON.stringify(l)}</code>`+
   `</td><td><button class="ghost" onclick="S.layers.splice(${i},1);renderLayers()">×</button></td>`;
 });
 document.getElementById('model-json').textContent=
   JSON.stringify({layers:S.layers},null,1);
 refreshModelChoices();
}
function addLayer(){
 const type=document.getElementById('layer-type').value;
 let args={};
 const raw=document.getElementById('layer-args').value.trim();
 if(raw){try{args=JSON.parse(raw)}catch(e){alert('bad args JSON');return}}
 S.layers.push(Object.assign({type},args));renderLayers();
}
function clearLayers(){S.layers=[];renderLayers();}
function refreshModelChoices(extra){
 fetch('/api/models').then(r=>r.json()).then(d=>{
  const sel=document.getElementById('cfg-model');sel.innerHTML='';
  for(const m of d.models){const o=document.createElement('option');o.textContent=m;sel.append(o);}
 });
}
function start(){
 const body={
  optimizer:document.getElementById('cfg-opt').value,
  learning_rate:parseFloat(document.getElementById('cfg-lr').value),
  epochs:parseInt(document.getElementById('cfg-epochs').value),
  batch_size:parseInt(document.getElementById('cfg-bs').value),
 };
 const model=document.getElementById('cfg-model').value;
 if(model==='dynamic'&&S.layers.length)body.layers=S.layers;
 S.losses=[];S.accs=[];
 fetch('/api/train/start',{method:'POST',
   headers:{'Content-Type':'application/json'},body:JSON.stringify(body)})
  .then(r=>r.json()).then(d=>sv('status',d.status||JSON.stringify(d)));
}
function stop(){fetch('/api/train/stop',{method:'POST'});}
refreshModelChoices();
</script></body></html>"""
