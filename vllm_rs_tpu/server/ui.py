"""Built-in chat web UI (reference rustchatui, server/mod.rs:1505-1511).

A single self-contained page served at `/` that streams from
/v1/chat/completions — no build step, no external assets.
"""

INDEX_HTML = """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>vllm_rs_tpu chat</title>
<style>
  :root { color-scheme: dark; }
  body { font-family: ui-sans-serif, system-ui, sans-serif; margin: 0;
         background: #111; color: #eee; display: flex; flex-direction: column;
         height: 100vh; }
  header { padding: 10px 16px; background: #1a1a1a; font-weight: 600;
           border-bottom: 1px solid #2a2a2a; }
  #log { flex: 1; overflow-y: auto; padding: 16px; }
  .msg { max-width: 46rem; margin: 8px auto; padding: 10px 14px;
         border-radius: 10px; white-space: pre-wrap; line-height: 1.45; }
  .user { background: #2b3a55; }
  .bot { background: #222; }
  .think { color: #888; font-style: italic; }
  form { display: flex; gap: 8px; padding: 12px 16px; background: #1a1a1a;
         border-top: 1px solid #2a2a2a; }
  input { flex: 1; padding: 10px 12px; border-radius: 8px; border: 1px solid #333;
          background: #0d0d0d; color: #eee; font-size: 15px; }
  button { padding: 10px 18px; border-radius: 8px; border: 0;
           background: #3b82f6; color: white; font-weight: 600; cursor: pointer; }
  button:disabled { opacity: .5; }
</style>
</head>
<body>
<header>vllm_rs_tpu</header>
<div id="log"></div>
<form id="f">
  <input id="q" placeholder="Send a message…" autocomplete="off" autofocus>
  <button id="send">Send</button>
</form>
<script>
const log = document.getElementById("log");
const form = document.getElementById("f");
const input = document.getElementById("q");
const btn = document.getElementById("send");
const history = [];

function bubble(cls, text) {
  const div = document.createElement("div");
  div.className = "msg " + cls;
  div.textContent = text;
  log.appendChild(div);
  log.scrollTop = log.scrollHeight;
  return div;
}

form.addEventListener("submit", async (e) => {
  e.preventDefault();
  const text = input.value.trim();
  if (!text) return;
  input.value = "";
  btn.disabled = true;
  bubble("user", text);
  history.push({role: "user", content: text});
  const out = bubble("bot", "");
  let acc = "";
  try {
    const resp = await fetch("/v1/chat/completions", {
      method: "POST",
      headers: {"Content-Type": "application/json"},
      body: JSON.stringify({model: "ui", messages: history, stream: true,
                            max_tokens: 1024}),
    });
    const reader = resp.body.getReader();
    const dec = new TextDecoder();
    let buf = "";
    for (;;) {
      const {done, value} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let idx;
      while ((idx = buf.indexOf("\\n\\n")) >= 0) {
        const line = buf.slice(0, idx).trim();
        buf = buf.slice(idx + 2);
        if (!line.startsWith("data: ")) continue;
        const payload = line.slice(6);
        if (payload === "[DONE]") continue;
        const delta = JSON.parse(payload).choices[0].delta;
        if (delta.content) { acc += delta.content; out.textContent = acc; }
        log.scrollTop = log.scrollHeight;
      }
    }
  } catch (err) {
    out.textContent = acc + "\\n[error: " + err + "]";
  }
  history.push({role: "assistant", content: acc});
  btn.disabled = false;
  input.focus();
});
</script>
</body>
</html>
"""
