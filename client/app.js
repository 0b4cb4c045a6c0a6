/* videosd_tpu client logic.
 *
 * Capability re-implementation of the reference SPA controller
 * (reference: client/src/lib/pages/home/index.tsx):
 *  - getUserMedia capture (:80-116), camera flip (:309-325)
 *  - WebRTC peer + "prompt" ordered data channel + POST /offer with
 *    initOptions (:118-179)
 *  - per-key JSON sends on slider change (:275-291)
 *  - resolution negotiation: fit container aspect into max 768, rounded
 *    to a multiple of 16 (:208-237)
 *  - LLM prompt expand/random via the promptgen /llama-chat route (:365-380)
 *  - plus a WebSocket transport for WebRTC-less deployments (videosd_tpu
 *    /ws protocol: 4-byte {u16 h, u16 w} header + raw RGB24).
 */
"use strict";

const defaults = {
  prompt: "portrait of a person, pixar, cg",
  strength: 0.6,
  guidance_scale: 5,
  steps: 4,
  seed: 23,
  ref: false,
  style_fidelity: 1,
  controlnet: true,
  controlnet_scale: 2,
  controlnet_interval: 1,
  deepcache_interval: 1,
  deepcache_temporal: 0,
  interval_refresh_last: false,
  model: "",
  width: 512,
  height: 512,
};

const state = {
  mode: "ws", // "webrtc" | "ws"
  options: { ...defaults },
  pc: null,
  dc: null,
  ws: null,
  stream: null,
  facing: "user",
  running: false,
  sendTimer: null,
};

const $ = (id) => document.getElementById(id);
const statusEl = $("status");
const setStatus = (t) => (statusEl.textContent = t);

function backendBase() {
  const v = $("backendUrl").value.trim();
  return v || location.origin;
}

/* ------------------------------------------------ resolution negotiation */
function negotiatedSize(videoW, videoH) {
  // reference logic: clamp long side to 768, round to /16 (index.tsx:218-229)
  const maxSide = 768;
  let w = videoW, h = videoH;
  const scale = Math.min(1, maxSide / Math.max(w, h));
  w = Math.round((w * scale) / 16) * 16;
  h = Math.round((h * scale) / 16) * 16;
  return { width: Math.max(w, 256), height: Math.max(h, 256) };
}

/* ------------------------------------------------ parameter plumbing */
function sendOption(name, value) {
  state.options[name] = value;
  const payload = JSON.stringify({ [name]: value });
  if (state.mode === "webrtc" && state.dc && state.dc.readyState === "open") {
    state.dc.send(payload);
  } else if (state.ws && state.ws.readyState === WebSocket.OPEN) {
    state.ws.send(JSON.stringify({ type: "prompt", [name]: value }));
  }
}

for (const id of ["steps", "strength", "guidance_scale", "controlnet_scale", "controlnet_interval", "deepcache_interval", "deepcache_temporal", "style_fidelity"]) {
  $(id).addEventListener("input", (e) => {
    const v = parseFloat(e.target.value);
    $(id + "-out").value = v;
    sendOption(id, v);
  });
}
$("seed").addEventListener("change", (e) => sendOption("seed", parseInt(e.target.value || "0", 10)));
// named checkpoint from the server's models: registry ("" = default);
// the datalist fills from /stats.models while polling runs
$("model").addEventListener("change", (e) => sendOption("model", e.target.value.trim()));
$("controlnet").addEventListener("change", (e) => sendOption("controlnet", e.target.checked));
$("interval_refresh_last").addEventListener("change", (e) => sendOption("interval_refresh_last", e.target.checked));
$("ref").addEventListener("change", (e) => sendOption("ref", e.target.checked));
$("setRefBtn").addEventListener("click", () => sendOption("set_ref", true));
let promptTimer = null;
$("prompt").addEventListener("input", (e) => {
  clearTimeout(promptTimer);
  promptTimer = setTimeout(() => sendOption("prompt", e.target.value), 300);
});

/* ------------------------------------------------ tabs */
document.querySelectorAll(".tabs button").forEach((b) =>
  b.addEventListener("click", () => {
    document.querySelectorAll(".tabs button").forEach((x) => x.classList.remove("active"));
    document.querySelectorAll(".tab").forEach((x) => x.classList.remove("active"));
    b.classList.add("active");
    $("tab-" + b.dataset.tab).classList.add("active");
  })
);

/* ------------------------------------------------ camera */
let synthTimer = null;
function syntheticStream() {
  // animated test pattern via canvas.captureStream: drives the full stack
  // without a camera (kiosk demos, headless CI, permission-less tabs)
  const c = document.createElement("canvas");
  c.width = 640; c.height = 480;
  const ctx = c.getContext("2d");
  let t = 0;
  clearInterval(synthTimer);
  synthTimer = setInterval(() => {
    t += 1;
    const g = ctx.createLinearGradient(0, 0, c.width, c.height);
    g.addColorStop(0, `hsl(${(t * 2) % 360},70%,40%)`);
    g.addColorStop(1, `hsl(${(t * 2 + 120) % 360},70%,20%)`);
    ctx.fillStyle = g;
    ctx.fillRect(0, 0, c.width, c.height);
    ctx.fillStyle = "#fff";
    ctx.beginPath();
    ctx.arc(320 + 180 * Math.cos(t / 20), 240 + 120 * Math.sin(t / 13), 60, 0, 7);
    ctx.fill();
    ctx.fillStyle = "#000";
    ctx.font = "28px monospace";
    ctx.fillText("synthetic " + t, 20, 40);
  }, 66);
  return c.captureStream(15);
}

async function openCamera() {
  if (state.stream) state.stream.getTracks().forEach((t) => t.stop());
  if ($("syntheticSource").checked) {
    state.stream = syntheticStream();
  } else {
    state.stream = await navigator.mediaDevices.getUserMedia({
      video: { facingMode: state.facing, width: { ideal: 1280 }, height: { ideal: 720 } },
      audio: false,
    });
  }
  $("selfView").srcObject = state.stream;
  return state.stream;
}
if (new URLSearchParams(location.search).get("synthetic")) {
  // ?synthetic=1 preselects the test-pattern source (see Settings);
  // app.js loads at the end of <body>, so the toggle exists already
  $("syntheticSource").checked = true;
}

$("flipBtn").addEventListener("click", async () => {
  state.facing = state.facing === "user" ? "environment" : "user";
  if (state.running) await openCamera();
});
$("fsBtn").addEventListener("click", () => $("stage").requestFullscreen?.());
$("modeWebrtc").addEventListener("click", () => { state.mode = "webrtc"; setStatus("mode: WebRTC"); });
$("modeWs").addEventListener("click", () => { state.mode = "ws"; setStatus("mode: WebSocket"); });

/* ------------------------------------------------ WebRTC transport */
async function startWebrtc() {
  const stream = await openCamera();
  const track = stream.getVideoTracks()[0];
  const ts = track.getSettings();
  const size = negotiatedSize(ts.width || 640, ts.height || 480);
  state.options.width = size.width;
  state.options.height = size.height;

  const pc = new RTCPeerConnection();
  state.pc = pc;
  state.dc = pc.createDataChannel("prompt", { ordered: true });
  pc.addTrack(track, stream);
  pc.ontrack = (e) => {
    $("outVideo").style.display = "block";
    $("outCanvas").style.display = "none";
    $("outVideo").srcObject = e.streams[0] || new MediaStream([e.track]);
  };

  const offer = await pc.createOffer();
  await pc.setLocalDescription(offer);
  await new Promise((res) => {
    if (pc.iceGatheringState === "complete") return res();
    pc.onicegatheringstatechange = () => pc.iceGatheringState === "complete" && res();
    setTimeout(res, 1500);
  });

  const resp = await fetch(backendBase() + "/offer", {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify({
      sdp: pc.localDescription.sdp,
      type: pc.localDescription.type,
      options: state.options,
    }),
  });
  if (!resp.ok) throw new Error("offer failed: " + resp.status + " (try WebSocket mode)");
  await pc.setRemoteDescription(await resp.json());
  setStatus("webrtc connected " + size.width + "x" + size.height);
}

/* ------------------------------------------------ WebSocket transport */
async function startWs() {
  const stream = await openCamera();
  const video = $("selfView");
  await new Promise((r) => (video.readyState >= 2 ? r() : (video.onloadeddata = r)));
  const size = negotiatedSize(video.videoWidth, video.videoHeight);
  state.options.width = size.width;
  state.options.height = size.height;

  const url = backendBase().replace(/^http/, "ws") + "/ws";
  const ws = new WebSocket(url);
  ws.binaryType = "arraybuffer";
  state.ws = ws;

  const cap = document.createElement("canvas");
  const capCtx = cap.getContext("2d", { willReadFrequently: true });
  const out = $("outCanvas");
  out.style.display = "block";
  $("outVideo").style.display = "none";
  const outCtx = out.getContext("2d");
  let inflight = false;

  const useJpeg = $("jpegTransport").checked;
  ws.onopen = () => {
    if (useJpeg) state.options.jpeg = true;
    ws.send(JSON.stringify({ type: "init", options: state.options }));
    setStatus("ws connected " + size.width + "x" + size.height + (useJpeg ? " (jpeg)" : ""));
    state.sendTimer = setInterval(() => {
      if (inflight || ws.readyState !== WebSocket.OPEN) return;
      const w = size.width, h = size.height;
      cap.width = w; cap.height = h;
      capCtx.drawImage(video, 0, 0, w, h);
      if (useJpeg) {
        // ~12x less upstream bandwidth than raw RGB24
        inflight = true;
        cap.toBlob((blob) => blob && blob.arrayBuffer().then((b) => ws.send(b)),
                   "image/jpeg", 0.85);
        return;
      }
      const rgba = capCtx.getImageData(0, 0, w, h).data;
      const rgb = new Uint8Array(4 + w * h * 3);
      new DataView(rgb.buffer).setUint16(0, h, true);
      new DataView(rgb.buffer).setUint16(2, w, true);
      for (let i = 0, j = 4; i < rgba.length; i += 4) {
        rgb[j++] = rgba[i]; rgb[j++] = rgba[i + 1]; rgb[j++] = rgba[i + 2];
      }
      inflight = true;
      ws.send(rgb.buffer);
    }, 66); // ~15 fps capture; server batches/drops as needed
  };

  ws.onmessage = (e) => {
    if (typeof e.data === "string") {
      const msg = JSON.parse(e.data);
      if (msg.type === "transcript") $("prompt").value = msg.text;
      return;
    }
    inflight = false;
    const bytes = new Uint8Array(e.data);
    if (bytes[0] === 0xff && bytes[1] === 0xd8) { // JPEG reply
      createImageBitmap(new Blob([e.data], { type: "image/jpeg" })).then((bmp) => {
        out.width = bmp.width; out.height = bmp.height;
        outCtx.drawImage(bmp, 0, 0);
      });
      return;
    }
    const dv = new DataView(e.data);
    const h = dv.getUint16(0, true), w = dv.getUint16(2, true);
    const rgb = new Uint8Array(e.data, 4);
    out.width = w; out.height = h;
    const img = outCtx.createImageData(w, h);
    for (let i = 0, j = 0; j < rgb.length; i += 4, j += 3) {
      img.data[i] = rgb[j]; img.data[i + 1] = rgb[j + 1];
      img.data[i + 2] = rgb[j + 2]; img.data[i + 3] = 255;
    }
    outCtx.putImageData(img, 0, 0);
  };
  ws.onclose = () => { clearInterval(state.sendTimer); setStatus("ws closed"); };
  ws.onerror = () => setStatus("ws error");
}

/* ------------------------------------------------ start/stop */
$("startBtn").addEventListener("click", async () => {
  if (state.running) {
    state.pc?.close(); state.ws?.close();
    clearInterval(state.sendTimer);
    clearInterval(synthTimer);
    stopStatsPolling();
    state.stream?.getTracks().forEach((t) => t.stop());
    state.running = false;
    $("startBtn").textContent = "Start";
    setStatus("stopped");
    return;
  }
  try {
    state.options.prompt = $("prompt").value;
    if (state.mode === "webrtc") await startWebrtc(); else await startWs();
    state.running = true;
    startStatsPolling();
    $("startBtn").textContent = "Stop";
  } catch (err) {
    setStatus(String(err));
  }
});

/* ------------------------------------------------ stats */
let statsTimer = null;

function renderStats(s) {
  const fps = s.avg_gen_time_s > 0 ? (1 / s.avg_gen_time_s).toFixed(1) : "—";
  const rows = [
    ["throughput", fps + " gen/s (EMA)"],
    ["avg gen time", (s.avg_gen_time_s * 1e3).toFixed(1) + " ms"],
    ["frames in / out / dropped", `${s.frames_in} / ${s.frames_out} / ${s.frames_dropped}`],
    ["batches (avg fill)", `${s.batches} (${(s.avg_batch_fill * 100).toFixed(0)}%)`],
    ["streams", s.streams],
    ["programs compiled", s.programs_compiled],
  ];
  for (const [k, v] of Object.entries(s.stages || {})) {
    rows.push(["stage " + k, (v * 1e3).toFixed(2) + " ms"]);
  }
  if (s.models) {
    rows.push(["models", Object.entries(s.models).map(([n, st]) => `${n} (${st})`).join(", ")]);
    $("modelList").innerHTML =
      Object.keys(s.models).map((n) => `<option value="${n}">`).join("");
  }
  $("statsTable").querySelector("tbody").innerHTML = rows
    .map(([k, v]) =>
      `<tr><td style="color:#9aa4af;padding:3px 6px 3px 0">${k}</td>` +
      `<td style="text-align:right">${v}</td></tr>`)
    .join("");
}

function startStatsPolling() {
  stopStatsPolling();
  statsTimer = setInterval(async () => {
    try {
      const resp = await fetch(backendBase() + "/stats");
      renderStats(await resp.json());
    } catch (e) { /* server away; keep last values */ }
  }, 2000);
}
const stopStatsPolling = () => { clearInterval(statsTimer); statsTimer = null; };

/* ------------------------------------------------ promptgen */
async function expandPrompt(random) {
  // reference expandPrompt via langserve RemoteRunnable (index.tsx:365-380)
  const text = random ? randomSubject() : $("prompt").value;
  setStatus("expanding prompt…");
  try {
    const resp = await fetch(backendBase().replace(/:\d+$/, ":8000") + "/llama-chat/invoke", {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ input: { text } }),
    });
    const body = await resp.json();
    const out = typeof body.output === "string" ? body.output : body.output.text;
    $("prompt").value = out.trim();
    sendOption("prompt", $("prompt").value);
    setStatus("");
  } catch (e) {
    setStatus("promptgen unreachable");
  }
}
const subjects = ["a fox", "an astronaut", "a castle", "a city at night", "a dragon",
  "a lighthouse", "a samurai", "a jellyfish", "a steam train", "a violinist"];
const randomSubject = () => subjects[Math.floor(Math.random() * subjects.length)];
$("expandBtn").addEventListener("click", () => expandPrompt(false));
$("randomBtn").addEventListener("click", () => expandPrompt(true));

/* ------------------------------------------------ speech-to-text */
let recording = false;
let audioCtx = null, audioNode = null, audioStream = null;

async function startMicCapture() {
  // WS transport: stream PCM16 chunks as base64 "audio" messages
  audioStream = await navigator.mediaDevices.getUserMedia({ audio: true });
  audioCtx = new AudioContext();
  const src = audioCtx.createMediaStreamSource(audioStream);
  audioNode = audioCtx.createScriptProcessor(4096, 1, 1);
  audioNode.onaudioprocess = (e) => {
    if (!recording || !state.ws || state.ws.readyState !== WebSocket.OPEN) return;
    const f32 = e.inputBuffer.getChannelData(0);
    const i16 = new Int16Array(f32.length);
    for (let i = 0; i < f32.length; i++) i16[i] = Math.max(-1, Math.min(1, f32[i])) * 32767;
    const b64 = btoa(String.fromCharCode(...new Uint8Array(i16.buffer)));
    state.ws.send(JSON.stringify({ type: "audio", rate: audioCtx.sampleRate, pcm16: b64 }));
  };
  src.connect(audioNode);
  audioNode.connect(audioCtx.destination);
}

function stopMicCapture() {
  audioNode?.disconnect();
  audioStream?.getTracks().forEach((t) => t.stop());
  audioCtx?.close();
  audioNode = audioCtx = audioStream = null;
}

$("recordBtn").addEventListener("click", async () => {
  recording = !recording;
  $("recordBtn").textContent = recording ? "⏹ Stop" : "🎙 Speak";
  const msg = { type: "record", action: recording ? "start" : "stop" };
  if (state.ws && state.ws.readyState === WebSocket.OPEN) {
    state.ws.send(JSON.stringify(msg));
    if (recording) { try { await startMicCapture(); } catch (e) { setStatus("mic error"); } }
    else stopMicCapture();
  } else if (state.dc?.readyState === "open") {
    state.dc.send(recording ? "start" : "stop");
  }
});

// PWA: register the app-shell service worker (parity with the reference's
// next-pwa packaging; no-op on http origins other than localhost)
if ("serviceWorker" in navigator) {
  window.addEventListener("load", () => {
    navigator.serviceWorker.register("/sw.js").catch(() => {});
  });
}
