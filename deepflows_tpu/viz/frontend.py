"""Single-file web frontend for the viz platform.

Replaces the reference's Vue 3 + Element-Plus + ECharts app
(`Visualization_frontend/src/views/{dashboard,model-builder,training-config}`)
with a dependency-free page covering the same three views at comparable
depth:

- **Dashboard**: live loss (raw + EMA), batch accuracy, per-epoch test
  accuracy and LR, CPU/RAM — all on a hand-rolled canvas chart engine with
  axes, gridlines, legends and hover tooltips (the reference used ECharts).
- **Model builder**: per-layer-type parameter forms, drag-to-reorder,
  move/remove buttons, templates, and LIVE validation — the layer list is
  posted to ``/api/model/validate`` and per-layer output shapes (or the
  build error) render inline.  The reference's drag-drop builder had no
  shape feedback.
- **Training config**: model/optimizer/lr/weight-decay/scheduler/epochs/
  batch-size/samples/target-accuracy, start/stop, and a run-history table
  (``/api/history``), standing in for the reference's Pinia store state.
"""

DASHBOARD_HTML = r"""<!doctype html>
<html><head><meta charset="utf-8"><title>deepflows_tpu — training platform</title>
<style>
 :root{--fg:#1a1a1a;--mut:#777;--line:#e3e3e3;--acc:#3b6fd4;--ok:#2e9e44;
       --warn:#c9a227;--err:#d04545}
 body{font-family:system-ui,sans-serif;margin:0;background:#f7f7f8;color:var(--fg)}
 header{background:#fff;border-bottom:1px solid var(--line);padding:.8rem 1.4rem;
        display:flex;align-items:center;gap:1.5rem}
 header h1{font-size:1.05rem;margin:0}
 nav button{background:none;border:none;padding:.45rem .9rem;cursor:pointer;
            font-size:.95rem;color:var(--mut);border-radius:6px}
 nav button.active{color:var(--acc);background:#eef3fc;font-weight:600}
 main{max-width:1060px;margin:1.2rem auto;padding:0 1rem}
 .card{background:#fff;border:1px solid var(--line);border-radius:8px;
       padding:1rem 1.2rem;margin-bottom:1rem}
 .card h3{margin:.1rem 0 .6rem;font-size:.95rem;color:var(--mut);font-weight:600}
 canvas.chart{width:100%;height:190px;background:#fff;display:block}
 .row{display:flex;gap:.8rem;flex-wrap:wrap;align-items:center;margin:.4rem 0}
 .grid2{display:grid;grid-template-columns:1fr 1fr;gap:1rem}
 label{font-size:.85rem;color:var(--mut)}
 input,select{padding:.35rem .5rem;border:1px solid var(--line);border-radius:5px}
 input.num{width:5.5rem}
 button.primary{background:var(--acc);color:#fff;border:none;border-radius:6px;
                padding:.5rem 1.2rem;cursor:pointer}
 button.ghost{background:#fff;border:1px solid var(--line);border-radius:6px;
              padding:.45rem .9rem;cursor:pointer}
 button.mini{background:#fff;border:1px solid var(--line);border-radius:5px;
             padding:.1rem .45rem;cursor:pointer;font-size:.8rem}
 table{width:100%;border-collapse:collapse;font-size:.88rem}
 td,th{padding:.35rem .5rem;border-bottom:1px solid var(--line);text-align:left}
 tr.layer{cursor:grab}
 tr.layer.dragging{opacity:.4}
 #status{margin-left:auto;font-size:.82rem;padding:.25rem .7rem;border-radius:999px;
         background:#eee;color:#555}
 #status.running{background:#e7f0ff;color:var(--acc)}
 #status.finished,#status.target{background:#e8f7ec;color:var(--ok)}
 #status.error,#status.stopped{background:#fdecec;color:var(--err)}
 .stat{display:inline-block;margin:.1rem 1.4rem .1rem 0}
 .stat b{font-size:1.25rem;display:block}
 .stat span{font-size:.75rem;color:var(--mut)}
 .shape-ok{color:var(--ok);font-family:ui-monospace,monospace;font-size:.82rem}
 .shape-err{color:var(--err);font-size:.85rem}
 code{background:#f2f2f4;border-radius:4px;padding:.06rem .3rem;font-size:.82rem}
 .tooltip{position:fixed;pointer-events:none;background:#222;color:#fff;
          font-size:.75rem;padding:.25rem .5rem;border-radius:5px;display:none;
          z-index:10;white-space:nowrap}
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
  <div class="card" id="stats">
   <span class="stat"><b id="s-loss">—</b><span>train loss</span></span>
   <span class="stat"><b id="s-acc">—</b><span>batch acc</span></span>
   <span class="stat"><b id="s-tacc">—</b><span>test acc</span></span>
   <span class="stat"><b id="s-epoch">—</b><span>epoch/batch</span></span>
   <span class="stat"><b id="s-lr">—</b><span>lr</span></span>
   <span class="stat"><b id="s-etime">—</b><span>epoch time</span></span>
   <span class="stat"><b id="s-cpu">—</b><span>cpu</span></span>
   <span class="stat"><b id="s-ram">—</b><span>ram</span></span>
  </div>
  <div class="grid2">
   <div class="card"><h3>training loss</h3><canvas class="chart" id="c-loss"></canvas></div>
   <div class="card"><h3>batch accuracy</h3><canvas class="chart" id="c-acc"></canvas></div>
   <div class="card"><h3>test accuracy / epoch</h3><canvas class="chart" id="c-tacc"></canvas></div>
   <div class="card"><h3>learning rate / epoch</h3><canvas class="chart" id="c-lr"></canvas></div>
  </div>
  <div class="card"><h3>host resources (%)</h3><canvas class="chart" id="c-res"></canvas></div>
 </section>

 <section id="view-model" style="display:none">
  <div class="card">
   <h3>add layer</h3>
   <div class="row">
    <select id="layer-type" onchange="renderArgForm()"></select>
    <span id="arg-form" class="row"></span>
    <button class="ghost" onclick="addLayer()">add</button>
   </div>
   <div class="row">
    <label>templates</label>
    <button class="ghost" onclick="loadTemplate('mnist_cnn')">MNIST CNN</button>
    <button class="ghost" onclick="loadTemplate('small_cnn')">small CNN</button>
    <button class="ghost" onclick="loadTemplate('mlp')">MLP</button>
    <button class="ghost" onclick="clearLayers()">clear</button>
   </div>
  </div>
  <div class="card">
   <h3>layers (drag to reorder) — input <code>1×28×28</code></h3>
   <table id="layers"></table>
   <p id="validate-out"></p>
  </div>
  <div class="card"><h3>request body</h3><pre id="model-json">{}</pre></div>
 </section>

 <section id="view-config" style="display:none">
  <div class="card">
   <h3>training configuration</h3>
   <div class="row"><label>model</label><select id="cfg-model"></select>
    <label>optimizer</label>
    <select id="cfg-opt"><option>adam</option><option>sgd</option>
     <option>adagrad</option><option>adadelta</option><option>adamw</option>
     <option>rmsprop</option><option>adafactor</option><option>lion</option>
     <option>muon</option></select>
    <label>scheduler</label>
    <select id="cfg-sch"><option>none</option><option>step</option><option>cosine</option></select>
   </div>
   <div class="row">
    <label>lr</label><input class="num" id="cfg-lr" value="0.001">
    <label>weight decay</label><input class="num" id="cfg-wd" value="0">
    <label>epochs</label><input class="num" id="cfg-epochs" value="3">
    <label>batch size</label><input class="num" id="cfg-bs" value="64">
   </div>
   <div class="row">
    <label>samples</label><input class="num" id="cfg-n" value="3000">
    <label>target acc %</label><input class="num" id="cfg-target" placeholder="off">
   </div>
   <div class="row">
    <button class="primary" onclick="start()">Start training</button>
    <button class="ghost" onclick="stop()">Stop</button>
   </div>
  </div>
  <div class="card">
   <h3>run history <button class="mini" onclick="refreshHistory()">refresh</button></h3>
   <table id="history"><tr><th>#</th><th>started</th><th>model/opt</th>
    <th>epochs</th><th>final loss</th><th>test acc</th><th>wall</th><th>outcome</th></tr>
   </table>
  </div>
 </section>
</main>
<div class="tooltip" id="tip"></div>
<script>
// ------------------------------------------------------------ state
const S={losses:[],accs:[],taccs:[],lrs:[],cpu:[],ram:[],layers:[]};
function sv(id,v){document.getElementById(id).textContent=v;}
function show(v){
 for(const t of ['dash','model','config']){
  document.getElementById('view-'+t).style.display=t===v?'':'none';
  document.getElementById('tab-'+t).classList.toggle('active',t===v);
 }
 if(v==='config')refreshHistory();
}

// ------------------------------------------------------------ chart engine
function ema(data,a=0.15){const o=[];let m=null;
 for(const v of data){m=m===null?v:a*v+(1-a)*m;o.push(m);}return o;}
function niceTicks(min,max,n=4){
 if(!(isFinite(min)&&isFinite(max)))return [];
 if(min===max){min-=1;max+=1;}
 const span=max-min,step0=span/n,mag=Math.pow(10,Math.floor(Math.log10(step0)));
 const step=[1,2,5,10].map(m=>m*mag).find(s=>span/s<=n+1)||mag*10;
 const t=[];for(let v=Math.ceil(min/step)*step;v<=max+1e-12;v+=step)t.push(v);
 return t;}
function fmt(v){
 if(v===0)return '0';
 const a=Math.abs(v);
 if(a>=1000)return v.toFixed(0);
 if(a>=1)return (+v.toFixed(2)).toString();
 if(a>=.01)return (+v.toFixed(3)).toString();
 return v.toExponential(1);}
class Chart{
 constructor(id,series){ // series: [{label,color,data:()=>[]}]
  this.c=document.getElementById(id);this.series=series;
  this.c.addEventListener('mousemove',e=>this.hover(e));
  this.c.addEventListener('mouseleave',()=>tip.style.display='none');
 }
 draw(){
  const c=this.c,g=c.getContext('2d');
  const W=c.width=c.clientWidth*2,H=c.height=c.clientHeight*2; // retina
  g.clearRect(0,0,W,H);
  const padL=70,padR=14,padT=12,padB=26;
  const live=this.series.map(s=>({...s,vals:s.data()})).filter(s=>s.vals.length);
  if(!live.length)return;
  const all=live.flatMap(s=>s.vals);
  let min=Math.min(...all),max=Math.max(...all);
  if(min===max){min-=1;max+=1;}
  const n=Math.max(...live.map(s=>s.vals.length));
  const X=i=>padL+(n<2?0:(i/(n-1))*(W-padL-padR));
  const Y=v=>H-padB-(v-min)/(max-min)*(H-padT-padB);
  this._geo={X,Y,n,live,padL,W,padR};
  g.strokeStyle='#eee';g.fillStyle='#999';g.font='20px system-ui';
  for(const t of niceTicks(min,max)){
   g.beginPath();g.moveTo(padL,Y(t));g.lineTo(W-padR,Y(t));g.stroke();
   g.fillText(fmt(t),6,Y(t)+6);
  }
  live.forEach(s=>{
   g.strokeStyle=s.color;g.lineWidth=2.5;g.beginPath();
   s.vals.forEach((v,i)=>{i?g.lineTo(X(i),Y(v)):g.moveTo(X(i),Y(v));});
   g.stroke();
  });
  // legend
  let lx=padL+8;
  live.forEach(s=>{
   g.fillStyle=s.color;g.fillRect(lx,padT,18,6);
   g.fillStyle='#666';g.fillText(s.label,lx+24,padT+10);
   lx+=34+g.measureText(s.label).width;
  });
 }
 hover(e){
  if(!this._geo)return;
  const r=this.c.getBoundingClientRect();
  const {X,n,live}=this._geo;
  const px=(e.clientX-r.left)*2;
  let best=0,bd=1e9;
  for(let i=0;i<n;i++){const d=Math.abs(X(i)-px);if(d<bd){bd=d;best=i;}}
  const parts=live.map(s=>`${s.label}: ${s.vals[best]===undefined?'—':fmt(s.vals[best])}`);
  tip.textContent=`#${best}  ${parts.join('   ')}`;
  tip.style.left=(e.clientX+12)+'px';tip.style.top=(e.clientY-10)+'px';
  tip.style.display='block';
 }
}
const charts=[
 new Chart('c-loss',[
  {label:'loss',color:'#e4a3a3',data:()=>S.losses},
  {label:'ema',color:'#d04545',data:()=>ema(S.losses)}]),
 new Chart('c-acc',[{label:'batch acc',color:'#3b6fd4',data:()=>S.accs}]),
 new Chart('c-tacc',[{label:'test acc',color:'#2e9e44',data:()=>S.taccs}]),
 new Chart('c-lr',[{label:'lr',color:'#8a5fc9',data:()=>S.lrs}]),
 new Chart('c-res',[
  {label:'cpu %',color:'#888',data:()=>S.cpu},
  {label:'ram %',color:'#c9a227',data:()=>S.ram}]),
];
function redraw(){charts.forEach(c=>c.draw());}

// ------------------------------------------------------------ websocket
function connect(){
 const ws=new WebSocket(`ws://${location.host}/ws`);
 ws.onmessage=(e)=>{
  const m=JSON.parse(e.data);
  if(m.type==='metrics'){
   S.losses.push(m.data.loss);S.accs.push(m.data.accuracy);
   sv('s-loss',m.data.loss.toFixed(4));
   sv('s-acc',(100*m.data.accuracy).toFixed(1)+'%');
   sv('s-epoch',m.data.epoch+' / '+m.data.batch);
  }else if(m.type==='epoch'){
   S.taccs.push(m.data.test_acc);S.lrs.push(m.data.lr);
   sv('s-tacc',(100*m.data.test_acc).toFixed(1)+'%');
   sv('s-lr',fmt(m.data.lr));sv('s-etime',m.data.epoch_time.toFixed(1)+'s');
  }else if(m.type==='resources'){
   S.cpu.push(m.data.cpu_percent);S.ram.push(m.data.memory_percent);
   if(S.cpu.length>180){S.cpu.shift();S.ram.shift();}
   sv('s-cpu',m.data.cpu_percent+'%');sv('s-ram',m.data.memory_percent+'%');
  }else if(m.type==='status'){
   const el=document.getElementById('status');
   el.textContent=m.data;
   el.className=(''+m.data).split(' ')[0].replace(':','');
  }
  redraw();
 };
 ws.onclose=()=>setTimeout(connect,1500); // auto-reconnect
}
connect();
window.addEventListener('resize',redraw);

// ------------------------------------------------------------ model builder
const LAYER_DEFS={
 Conv2d:{in_channels:1,out_channels:32,kernel_size:3,stride:1,padding:0},
 BatchNorm2d:{num_features:32},
 GroupNorm:{num_groups:4,num_channels:32},
 LayerNorm:{normalized_shape:32},
 ReLU:{},
 ReLU6:{},
 GELU:{},
 MaxPool2d:{kernel_size:2,stride:2},
 AvgPool2d:{kernel_size:2,stride:2},
 Flatten:{},
 Reshape:{shape:[7,16]},
 Linear:{in_features:128,out_features:10},
 Dropout:{p:0.5},
 MultiheadAttention:{embed_dim:32,num_heads:2},
};
const TEMPLATES={
 mnist_cnn:[
  {type:'Conv2d',in_channels:1,out_channels:32,kernel_size:5,padding:2},
  {type:'ReLU'},{type:'MaxPool2d',kernel_size:2,stride:2},
  {type:'Conv2d',in_channels:32,out_channels:64,kernel_size:5,padding:2},
  {type:'ReLU'},{type:'MaxPool2d',kernel_size:2,stride:2},
  {type:'Flatten'},{type:'Linear',in_features:3136,out_features:10}],
 small_cnn:[
  {type:'Conv2d',in_channels:1,out_channels:16,kernel_size:3,padding:1},
  {type:'BatchNorm2d',num_features:16},{type:'ReLU'},
  {type:'MaxPool2d',kernel_size:2,stride:2},
  {type:'Flatten'},{type:'Linear',in_features:3136,out_features:10}],
 mlp:[
  {type:'Flatten'},
  {type:'Linear',in_features:784,out_features:100},{type:'ReLU'},
  {type:'Dropout',p:0.3},
  {type:'Linear',in_features:100,out_features:10}],
};
function initBuilder(){
 const sel=document.getElementById('layer-type');
 for(const t of Object.keys(LAYER_DEFS)){
  const o=document.createElement('option');o.textContent=t;sel.append(o);}
 renderArgForm();renderLayers();
}
function renderArgForm(){
 const t=document.getElementById('layer-type').value;
 const span=document.getElementById('arg-form');span.innerHTML='';
 for(const [k,v] of Object.entries(LAYER_DEFS[t])){
  const l=document.createElement('label');l.textContent=k;span.append(l);
  const i=document.createElement('input');i.className='num';i.id='arg-'+k;i.value=v;
  span.append(i);
 }
}
function addLayer(){
 const t=document.getElementById('layer-type').value,spec={type:t};
 for(const k of Object.keys(LAYER_DEFS[t])){
  spec[k]=parseFloat(document.getElementById('arg-'+k).value);}
 S.layers.push(spec);renderLayers();
}
function loadTemplate(name){S.layers=JSON.parse(JSON.stringify(TEMPLATES[name]));renderLayers();}
function clearLayers(){S.layers=[];renderLayers();}
function moveLayer(i,d){
 const j=i+d;if(j<0||j>=S.layers.length)return;
 [S.layers[i],S.layers[j]]=[S.layers[j],S.layers[i]];renderLayers();
}
let dragIdx=null;
function renderLayers(){
 const t=document.getElementById('layers');
 t.innerHTML='<tr><th></th><th>#</th><th>type</th><th>params</th><th>output shape</th><th></th></tr>';
 S.layers.forEach((l,i)=>{
  const r=t.insertRow();
  r.className='layer';r.draggable=true;
  r.ondragstart=()=>{dragIdx=i;r.classList.add('dragging');};
  r.ondragend=()=>r.classList.remove('dragging');
  r.ondragover=e=>e.preventDefault();
  r.ondrop=e=>{e.preventDefault();
   if(dragIdx===null||dragIdx===i)return;
   const [m]=S.layers.splice(dragIdx,1);S.layers.splice(i,0,m);
   dragIdx=null;renderLayers();};
  const args=Object.entries(l).filter(([k])=>k!=='type')
    .map(([k,v])=>`${k}=${v}`).join(', ');
  r.innerHTML=`<td>⋮⋮</td><td>${i}</td><td><b>${l.type}</b></td>`+
   `<td><code>${args||'—'}</code></td><td id="shape-${i}" class="shape-ok">…</td>`+
   `<td><button class="mini" onclick="moveLayer(${i},-1)">↑</button>`+
   `<button class="mini" onclick="moveLayer(${i},1)">↓</button>`+
   `<button class="mini" onclick="S.layers.splice(${i},1);renderLayers()">×</button></td>`;
 });
 document.getElementById('model-json').textContent=
   JSON.stringify({layers:S.layers},null,1);
 validateLayers();
}
let valTimer=null;
function validateLayers(){
 clearTimeout(valTimer);
 if(!S.layers.length){document.getElementById('validate-out').textContent='';return;}
 valTimer=setTimeout(()=>{
  fetch('/api/model/validate',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({layers:S.layers,input_shape:[1,28,28]})})
   .then(r=>r.json()).then(d=>{
    const out=document.getElementById('validate-out');
    if(d.ok){
     out.innerHTML='<span class="shape-ok">model builds ✓</span>';
     d.shapes.forEach((s,i)=>{
      const el=document.getElementById('shape-'+i);
      if(el)el.textContent=s.output_shape.join('×');});
    }else{
     out.innerHTML=`<span class="shape-err">✗ ${d.error}</span>`;
     S.layers.forEach((_,i)=>{
      const el=document.getElementById('shape-'+i);if(el)el.textContent='?';});
    }
   });
 },250);
}

// ------------------------------------------------------------ config + runs
function refreshModels(){
 fetch('/api/models').then(r=>r.json()).then(d=>{
  const sel=document.getElementById('cfg-model');sel.innerHTML='';
  for(const m of d.models){const o=document.createElement('option');o.textContent=m;sel.append(o);}
 });
}
function refreshHistory(){
 fetch('/api/history').then(r=>r.json()).then(d=>{
  const t=document.getElementById('history');
  t.innerHTML='<tr><th>#</th><th>started</th><th>model/opt</th><th>epochs</th>'+
   '<th>final loss</th><th>test acc</th><th>wall</th><th>outcome</th></tr>';
  d.runs.forEach((r0,i)=>{
   const r=t.insertRow();
   const c=r0.config||{};
   r.innerHTML=`<td>${i}</td><td>${r0.started||''}</td>`+
    `<td>${c.model||'MNIST_CNN'} / ${c.optimizer||'adam'}</td>`+
    `<td>${r0.epochs_run}</td>`+
    `<td>${r0.final_loss==null?'—':r0.final_loss.toFixed(4)}</td>`+
    `<td>${r0.test_acc==null?'—':(100*r0.test_acc).toFixed(1)+'%'}</td>`+
    `<td>${r0.wall_time||''}s</td><td>${r0.outcome}</td>`;
  });
 });
}
function start(){
 const val=id=>document.getElementById(id).value;
 const body={
  model:val('cfg-model'),
  optimizer:val('cfg-opt'),
  scheduler:val('cfg-sch'),
  learning_rate:parseFloat(val('cfg-lr')),
  weight_decay:parseFloat(val('cfg-wd'))||0,
  epochs:parseInt(val('cfg-epochs')),
  batch_size:parseInt(val('cfg-bs')),
  num_samples:parseInt(val('cfg-n')),
 };
 const target=val('cfg-target');
 if(target)body.target_acc=parseFloat(target);
 if(body.model==='dynamic'&&S.layers.length)body.layers=S.layers;
 S.losses=[];S.accs=[];S.taccs=[];S.lrs=[];
 fetch('/api/train/start',{method:'POST',
   headers:{'Content-Type':'application/json'},body:JSON.stringify(body)})
  .then(r=>r.json()).then(d=>sv('status',d.status||JSON.stringify(d)));
}
function stop(){fetch('/api/train/stop',{method:'POST'});}
initBuilder();refreshModels();redraw();
</script></body></html>"""
