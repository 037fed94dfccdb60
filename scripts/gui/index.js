// Client for the scene_generation_tpu interactive editor.
// Objects are draggable/resizable boxes on a 512px canvas; every render
// sends the reference-format scene JSON to GET /get_data?data=...
// (contract: scripts/gui/simple-server.py:20-25 in the reference).

const CANVAS = document.getElementById('canvas-wrap');
const SIZE = 512;
let objects = [];     // {el, text, size, feature}
let selected = null;
let counter = 0;

const COLORS = ['#e6194b', '#3cb44b', '#4363d8', '#f58231', '#911eb4',
                '#46f0f0', '#f032e6', '#bcf60c', '#008080', '#9a6324'];

fetch('/vocab').then(r => r.json()).then(v => {
  const sel = document.getElementById('obj-class');
  const addOpt = (parent, name) => {
    const o = document.createElement('option');
    o.value = name; o.textContent = name;
    parent.appendChild(o);
  };
  // Grouped menu (things/stuff/other) when the vocab carries the split —
  // covers both instances- and panoptic-trained checkpoints with one page.
  if (v.groups) {
    const labels = {things: 'THINGS', stuff: 'STUFF', other: 'OTHER'};
    for (const key of ['things', 'stuff', 'other']) {
      const names = v.groups[key] || [];
      if (!names.length) continue;
      const g = document.createElement('optgroup');
      g.label = labels[key];
      names.forEach(n => addOpt(g, n));
      sel.appendChild(g);
    }
  } else {
    v.objects.forEach(n => addOpt(sel, n));
  }
});

function select(obj) {
  if (selected) selected.el.classList.remove('selected');
  selected = obj;
  if (obj) {
    obj.el.classList.add('selected');
    document.getElementById('size').value = obj.size;
    document.getElementById('feature').value = obj.feature;
  }
}

function addObject(text) {
  const el = document.createElement('div');
  el.className = 'obj';
  el.style.borderColor = COLORS[counter % COLORS.length];
  el.style.background = COLORS[counter % COLORS.length] + '22';
  el.style.left = '180px'; el.style.top = '180px';
  el.style.width = '150px'; el.style.height = '150px';
  el.textContent = text;
  const handle = document.createElement('div');
  handle.className = 'handle';
  el.appendChild(handle);
  CANVAS.appendChild(el);
  const obj = {el, text, size: 4, feature: -1};
  objects.push(obj);
  counter++;

  let drag = null;
  el.addEventListener('mousedown', e => {
    select(obj);
    const r = el.getBoundingClientRect();
    drag = e.target === handle
      ? {mode: 'resize', w: r.width, h: r.height, x: e.clientX, y: e.clientY}
      : {mode: 'move', dx: e.clientX - el.offsetLeft,
         dy: e.clientY - el.offsetTop};
    e.preventDefault();
  });
  window.addEventListener('mousemove', e => {
    if (!drag) return;
    if (drag.mode === 'move') {
      el.style.left = Math.max(0, Math.min(SIZE - el.offsetWidth,
        e.clientX - drag.dx)) + 'px';
      el.style.top = Math.max(0, Math.min(SIZE - el.offsetHeight,
        e.clientY - drag.dy)) + 'px';
    } else {
      el.style.width = Math.max(24, drag.w + e.clientX - drag.x) + 'px';
      el.style.height = Math.max(24, drag.h + e.clientY - drag.y) + 'px';
    }
  });
  window.addEventListener('mouseup', () => { drag = null; maybeRender(); });
  select(obj);
}

document.getElementById('add').onclick = () => {
  addObject(document.getElementById('obj-class').value);
};
document.getElementById('remove').onclick = () => {
  if (!selected) return;
  CANVAS.removeChild(selected.el);
  objects = objects.filter(o => o !== selected);
  select(null);
  maybeRender();
};
document.getElementById('size').oninput = e => {
  if (selected) { selected.size = +e.target.value; maybeRender(); }
};
document.getElementById('feature').oninput = e => {
  if (selected) { selected.feature = +e.target.value; maybeRender(); }
};
let backgroundStyle = -1;  // __image__ node's appearance cluster
document.getElementById('background').oninput = e => {
  backgroundStyle = +e.target.value;
  maybeRender();
};
document.getElementById('render').onclick = () => render();

// Reference behavior: re-render on every edit once >= 3 objects
// (index.js:149-208 in the reference client).
function maybeRender() { if (objects.length >= 3) render(); }

function locationCell(cx, cy) {
  // 5x5 grid cell of the box center (coco.py:347).
  const col = Math.round(cx * 4), row = Math.round(cy * 4);
  return row * 5 + col;
}

let inflight = false;
function render() {
  if (inflight || objects.length === 0) return;
  inflight = true;
  const status = document.getElementById('status');
  status.textContent = 'rendering…';
  const scene = {
    image_id: backgroundStyle,
    objects: objects.map(o => {
      const left = o.el.offsetLeft / SIZE, top = o.el.offsetTop / SIZE;
      const width = o.el.offsetWidth / SIZE,
            height = o.el.offsetHeight / SIZE;
      return {
        text: o.text, left, top, width, height,
        size: o.size, feature: o.feature,
        location: locationCell(left + width / 2, top + height / 2),
      };
    }),
  };
  fetch('/get_data?data=' + encodeURIComponent(JSON.stringify(scene)))
    .then(r => r.json())
    .then(d => {
      inflight = false;
      if (d.error) { status.textContent = 'error: ' + d.error; return; }
      status.textContent = '';
      document.getElementById('img-pred').src = d.img_pred + '?' + Date.now();
      document.getElementById('img-layout').src =
        d.img_layout + '?' + Date.now();
    })
    .catch(e => { inflight = false; status.textContent = 'error: ' + e; });
}
