"""Server-rendered HTML for the serving layer.

Compact equivalents of the reference's Jinja2 template set
(WebApplicationPrototype/templates/Analysis/Default/*.html — dark-theme
landing with pipeline cards, upload forms, case table, mask gallery,
classification results, ROI viewer with class toggle + opacity slider).
Rendered with str.format; no template engine dependency.
"""

from __future__ import annotations

import html
import json

_BASE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title} — CADx TPU</title>
<style>
  :root {{ color-scheme: dark; }}
  body {{ background:#11151c; color:#dbe2ef; font-family:system-ui,sans-serif;
         margin:0; padding:0; }}
  header {{ background:#1b2430; padding:14px 28px; display:flex; gap:24px;
           align-items:center; border-bottom:1px solid #2c3a4f; }}
  header a {{ color:#8ecae6; text-decoration:none; font-weight:600; }}
  main {{ max-width:1080px; margin:32px auto; padding:0 20px; }}
  .card {{ background:#1b2430; border:1px solid #2c3a4f; border-radius:10px;
          padding:22px; margin:14px 0; }}
  .cards {{ display:flex; gap:18px; flex-wrap:wrap; }}
  .cards .card {{ flex:1 1 300px; }}
  h1,h2 {{ color:#f1f6fb; }}
  table {{ width:100%; border-collapse:collapse; }}
  th,td {{ text-align:left; padding:8px 10px; border-bottom:1px solid #2c3a4f;
          font-size:14px; }}
  th {{ color:#8ecae6; }}
  a.button, button {{ display:inline-block; background:#2274a5; color:#fff;
     padding:9px 18px; border-radius:6px; border:0; text-decoration:none;
     cursor:pointer; font-size:14px; }}
  input,select {{ background:#11151c; color:#dbe2ef; border:1px solid #2c3a4f;
     border-radius:6px; padding:8px; }}
  .grid {{ display:grid; grid-template-columns:repeat(8, 1fr); gap:6px; }}
  .grid img {{ width:100%; border-radius:4px; }}
  .probbar {{ background:#2c3a4f; border-radius:4px; height:14px; }}
  .probbar div {{ background:#52b788; height:14px; border-radius:4px; }}
  .overlaybox {{ position:relative; display:inline-block; }}
  .overlaybox img.overlay {{ position:absolute; left:0; top:0; opacity:.5; }}
</style></head>
<body>
<header><a href="/">CADx TPU</a><a href="/diagnosis">Diagnosis</a>
<a href="/sample">Sample</a></header>
<main>{body}</main>
</body></html>"""


def page(title: str, body: str) -> str:
    return _BASE.format(title=html.escape(title), body=body)


def landing() -> str:
    body = """
<h1>Breast-cancer CADx</h1>
<p>Select an analysis pipeline.</p>
<div class="cards">
 <div class="card"><h2>Basic pipeline</h2>
  <p>From-scratch CNN on U-Net bottleneck features — fully on-device.</p>
  <a class="button" href="/home?pipeline=basic">Use basic</a></div>
 <div class="card"><h2>Advanced pipeline</h2>
  <p>Deep CNN on full-resolution encoder features.</p>
  <a class="button" href="/home?pipeline=advanced">Use advanced</a></div>
</div>"""
    return page("Landing", body)


def home(pipeline: str) -> str:
    body = f"""
<h1>Upload mammogram <small>({html.escape(pipeline)} pipeline)</small></h1>
<div class="card">
<form action="/upload-single" method="post" enctype="multipart/form-data">
 <p><input type="file" name="image1" required></p>
 <p><select name="body_part1"><option>Left breast</option>
    <option>Right breast</option></select>
    <select name="modality1"><option>Mammogram</option></select></p>
 <button type="submit">Analyze</button>
</form></div>
<div class="card"><h2>Bulk upload</h2>
<form action="/upload-bulk" method="post" enctype="multipart/form-data">
 <p><input type="file" name="bulk_images_zip" accept=".zip" required></p>
 <button type="submit">Upload zip</button>
</form></div>"""
    return page("Home", body)


def diagnosis(cases: list[dict]) -> str:
    rows = "".join(
        "<tr><td>{pid}</td><td>{img}</td><td>{breast}</td><td>{mod}</td>"
        "<td><a href='/view/{pid}'>view</a> · "
        "<a href='/view_segmentation'>masks</a> · "
        "<a href='/classify'>classify</a></td></tr>".format(
            pid=html.escape(c.get("patient_id", "")),
            img=html.escape(c.get("image_name", "")),
            breast=html.escape(c.get("breast", "")),
            mod=html.escape(c.get("modality", "")))
        for c in cases)
    body = f"""
<h1>Diagnosis cases</h1>
<div class="card"><table>
<tr><th>Patient</th><th>Image</th><th>Breast</th><th>Modality</th><th></th></tr>
{rows or '<tr><td colspan=5>No cases uploaded yet.</td></tr>'}
</table></div>"""
    return page("Diagnosis", body)


def view_image(info: dict) -> str:
    body = f"""
<h1>Case {html.escape(info.get('patient_id', ''))}</h1>
<div class="card">
 <p>Image: {html.escape(info.get('image_name', ''))}</p>
 <p>Breast: {html.escape(info.get('breast', ''))} ·
    Modality: {html.escape(info.get('modality', ''))}</p>
</div>"""
    return page("View", body)


def view_segmentation(out: dict) -> str:
    imgs = "".join(
        f"<img src='/static/segmentation_image/{html.escape(m)}' title='{html.escape(m)}'>"
        for m in out.get("masks", []))
    meta = out.get("metadata", {})
    body = f"""
<h1>Segmentation masks</h1>
<p>{html.escape(meta.get('image_name', ''))} — {html.escape(meta.get('modality', ''))}</p>
<div class="card"><div class="grid">{imgs}</div></div>"""
    return page("Segmentation", body)


def classification(out: dict) -> str:
    rows = []
    for r in out.get("classificationData", []):
        probs = r.get("prediction_probabilities", [])
        bars = "".join(
            f"<p>Class {i}: {p*100:.1f}%<div class='probbar'>"
            f"<div style='width:{p*100:.1f}%'></div></div></p>"
            for i, p in enumerate(probs))
        rows.append(
            f"<div class='card'><h2>{html.escape(r.get('predicted_class', ''))}"
            f"</h2>{bars}<p>Diagnosis: {html.escape(r.get('diagnosis', ''))}"
            f" · confidence {r.get('accuracy', 0)}%</p></div>")
    body = f"""
<h1>Classification</h1>{''.join(rows)}
<a class="button" href="/roi">Region of interest</a>
<script>var classificationData = {json.dumps(out.get('classificationData', []))};</script>"""
    return page("Classification", body)


def roi(out: dict) -> str:
    """Interactive ROI viewer — parity with the reference's
    RegionOfInterest.html:92-147 controls: class select (updates overlay
    + predicted-probability readout from classificationData), separate
    original/overlay transparency sliders, and a 1x-3x zoom slider."""
    class0 = html.escape(out.get("class_0_image_path",
                                 "explainability/gradcam_overlay_class_0.png"))
    body = f"""
<h1>Regions of Interest</h1>
<div class="card">
 <p>
  <label>Select Class:
   <select id="classSelect">
    <option value="0">Benign</option><option value="1">Malignant</option>
   </select></label>
  <label>Predicted Probability: <span id="predictionProbability">0.00</span></label>
 </p>
 <p>
  <label>Original Image Transparency:
   <input id="originalOpacity" type="range" min="0" max="1" step="0.01" value="1"></label>
  <label>Overlay Transparency:
   <input id="overlayOpacity" type="range" min="0" max="1" step="0.01" value="0.5"></label>
  <label>Zoom:
   <input id="zoomControl" type="range" min="1" max="3" step="0.1" value="1"></label>
 </p>
 <div style="overflow:auto; max-height:640px">
  <div class="overlaybox" id="zoomBox" style="transform-origin:top left">
   <img id="imageDisplay"
    src="/static/images/{html.escape(out.get('image_filename', ''))}" width="512">
   <img id="ov" class="overlay" src="/static/{class0}" width="512">
  </div>
 </div>
</div>
<script>
var classificationData = {json.dumps(out.get('classificationData', []))};
var classSelect = document.getElementById("classSelect");
var predictionProbability = document.getElementById("predictionProbability");
function updateUIForClass(idx) {{
  var data = classificationData[idx];
  if (!data) return;
  document.getElementById("ov").src = "/static/" + data.overlay_path;
  predictionProbability.textContent = Number(data.confidence).toFixed(2) + "%";
}}
classSelect.addEventListener("change", function() {{ updateUIForClass(+this.value); }});
document.getElementById("originalOpacity").addEventListener("input", function() {{
  document.getElementById("imageDisplay").style.opacity = this.value; }});
document.getElementById("overlayOpacity").addEventListener("input", function() {{
  document.getElementById("ov").style.opacity = this.value; }});
document.getElementById("zoomControl").addEventListener("input", function() {{
  document.getElementById("zoomBox").style.transform = "scale(" + this.value + ")"; }});
updateUIForClass(0);
</script>"""
    return page("ROI", body)


def bulk_select(images: list[str]) -> str:
    cards = "".join(
        f"""<div class='card'><p>{html.escape(n)}</p>
<form action='/upload-bulk-image' method='post' enctype='multipart/form-data'>
<input type='hidden' name='bulk_image_name' value='{html.escape(n)}'>
<select name='body_part1'><option>Left breast</option><option>Right breast</option></select>
<button type='submit'>Analyze</button></form></div>"""
        for n in images)
    body = f"<h1>Bulk images</h1><div class='cards'>{cards or '<p>None.</p>'}</div>"
    return page("Bulk", body)


def sample() -> str:
    return page("Sample", "<h1>Sample</h1><div class='card'>"
                          "<p>Static sample walkthrough page.</p></div>")
