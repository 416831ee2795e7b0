"""Build a static HTML documentation site from docs/*.md + the executed
example notebooks — the buildable-docs analogue of the reference's Sphinx
workflow (ref: .github/workflows/documentation.yml:1-90, docs/notebooks/).

Sphinx is not in this image, so the renderer is self-contained: a small
CommonMark-subset converter (headings, fenced code, inline code, links,
emphasis, tables, ordered/unordered lists, blockquotes) good enough for
the hand-written docs tree, plus an .ipynb renderer that inlines code
cells, markdown cells, and text/png outputs.

Usage:  python -m tools.build_docs_site [--out docs/_site]
Output: docs/_site/index.html + one page per doc/notebook, no external
assets (CSS inlined), openable from file:// or any static host.
"""

from __future__ import annotations

import argparse
import base64
import html
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAGES = [
    # (source, slug, nav title)
    ("README.md", "index", "Overview"),
    ("docs/getting_started.md", "getting_started", "Getting started"),
    ("docs/architecture.md", "architecture", "Architecture"),
    ("docs/using_tpus.md", "using_tpus", "Using TPUs"),
    ("docs/multihost.md", "multihost", "Multi-host"),
    ("docs/operations.md", "operations", "Operations"),
    ("docs/divergences.md", "divergences", "Reference divergences"),
    ("docs/api.md", "api", "API reference"),
]

NOTEBOOKS = [
    ("examples/gp_regression.ipynb", "nb_gp_regression", "GP regression"),
    ("examples/inline_example.ipynb", "nb_inline_example", "Inline example"),
    ("examples/1d_local_expert_model_part_1.ipynb", "nb_1d_part1", "1-D local experts (1/2)"),
    ("examples/1d_local_expert_model_part_2.ipynb", "nb_1d_part2", "1-D local experts (2/2)"),
    ("examples/end_to_end_demo.ipynb", "nb_end_to_end", "End-to-end demo"),
    ("examples/sea_ice_freeboard_demo.ipynb", "nb_sea_ice", "Sea-ice freeboard demo"),
    ("examples/using_tpus.ipynb", "nb_using_tpus", "Using TPUs (notebook)"),
]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       color: #1a202c; line-height: 1.55; }
.layout { display: flex; min-height: 100vh; }
nav { width: 230px; flex-shrink: 0; background: #f7f8fa; padding: 18px 14px;
      border-right: 1px solid #e2e6ea; }
nav h1 { font-size: 15px; margin: 0 0 12px; }
nav a { display: block; padding: 4px 8px; border-radius: 5px; color: #2b4a6f;
        text-decoration: none; font-size: 13.5px; }
nav a.current { background: #dde8f5; font-weight: 600; }
nav .sect { margin: 14px 0 4px; font-size: 11px; letter-spacing: .06em;
            text-transform: uppercase; color: #718096; }
main { flex: 1; max-width: 880px; padding: 28px 40px 80px; min-width: 0; }
h1, h2, h3 { line-height: 1.25; }
h2 { border-bottom: 1px solid #e2e6ea; padding-bottom: 4px; margin-top: 2em; }
pre { background: #f6f8fa; border: 1px solid #e2e6ea; border-radius: 6px;
      padding: 12px 14px; overflow-x: auto; font-size: 13px; }
code { font-family: ui-monospace, 'SF Mono', Menlo, Consolas, monospace;
       font-size: 0.92em; background: #f0f2f5; border-radius: 4px;
       padding: 1px 4px; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1em 0; font-size: 13.5px;
        display: block; overflow-x: auto; }
th, td { border: 1px solid #d7dde3; padding: 5px 10px; text-align: left;
         vertical-align: top; }
th { background: #f1f4f7; }
blockquote { border-left: 3px solid #c3d0de; margin: 1em 0; padding: 2px 14px;
             color: #4a5568; }
img { max-width: 100%; }
.nbout { border-left: 3px solid #d4ebd4; padding-left: 12px; }
.nbout pre { background: #fbfdfb; }
"""


def _inline(text: str) -> str:
    """Inline markdown -> HTML on an already-escaped string."""
    # protect escaped code spans first
    spans: list[str] = []

    def stash(m):
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    text = re.sub(r"`([^`]+)`", stash, text)
    text = re.sub(r"\[([^\]]+)\]\(([^)\s]+)\)", r'<a href="\2">\1</a>', text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<![\w*])\*([^*\n]+)\*(?![\w*])", r"<em>\1</em>", text)
    return re.sub(r"\x00(\d+)\x00", lambda m: f"<code>{spans[int(m.group(1))]}</code>", text)


def md_to_html(md: str) -> str:
    """Small CommonMark-subset renderer for the hand-written docs tree."""
    out: list[str] = []
    lines = md.split("\n")
    i = 0
    list_stack: list[str] = []  # 'ul' | 'ol'

    def close_lists():
        while list_stack:
            out.append(f"</{list_stack.pop()}>")

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            close_lists()
            lang = line[3:].strip()
            body = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                body.append(lines[i])
                i += 1
            i += 1
            cls = f' class="language-{html.escape(lang)}"' if lang else ""
            out.append(f"<pre><code{cls}>{html.escape(chr(10).join(body))}</code></pre>")
            continue
        if re.match(r"^\s*\|.*\|\s*$", line) and i + 1 < len(lines) and re.match(
            r"^\s*\|[\s:|-]+\|\s*$", lines[i + 1]
        ):
            close_lists()
            header = [c.strip() for c in line.strip().strip("|").split("|")]
            out.append("<table><thead><tr>")
            out.extend(f"<th>{_inline(html.escape(c))}</th>" for c in header)
            out.append("</tr></thead><tbody>")
            i += 2
            while i < len(lines) and re.match(r"^\s*\|.*\|\s*$", lines[i]):
                cells = [c.strip() for c in lines[i].strip().strip("|").split("|")]
                out.append(
                    "<tr>" + "".join(f"<td>{_inline(html.escape(c))}</td>" for c in cells) + "</tr>"
                )
                i += 1
            out.append("</tbody></table>")
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            close_lists()
            lvl = len(m.group(1))
            text = m.group(2).strip()
            anchor = re.sub(r"[^a-z0-9]+", "-", text.lower()).strip("-")
            out.append(f'<h{lvl} id="{anchor}">{_inline(html.escape(text))}</h{lvl}>')
            i += 1
            continue
        m = re.match(r"^(\s*)([-*]|\d+\.)\s+(.*)$", line)
        if m:
            kind = "ol" if m.group(2)[0].isdigit() else "ul"
            if not list_stack or list_stack[-1] != kind:
                close_lists()
                list_stack.append(kind)
                out.append(f"<{kind}>")
            # swallow hanging continuation lines of the same item
            item = [m.group(3)]
            i += 1
            while i < len(lines) and re.match(r"^\s{2,}\S", lines[i]) and not re.match(
                r"^(\s*)([-*]|\d+\.)\s+", lines[i]
            ):
                item.append(lines[i].strip())
                i += 1
            out.append(f"<li>{_inline(html.escape(' '.join(item)))}</li>")
            continue
        if line.startswith(">"):
            close_lists()
            quote = []
            while i < len(lines) and lines[i].startswith(">"):
                quote.append(lines[i].lstrip("> "))
                i += 1
            out.append(f"<blockquote>{md_to_html(chr(10).join(quote))}</blockquote>")
            continue
        if not line.strip():
            close_lists()
            i += 1
            continue
        # paragraph: greedily take consecutive plain lines
        para = [line]
        i += 1
        while (
            i < len(lines)
            and lines[i].strip()
            and not re.match(r"^(#{1,6}\s|```|\s*([-*]|\d+\.)\s|>|\s*\|.*\|\s*$)", lines[i])
        ):
            para.append(lines[i])
            i += 1
        out.append(f"<p>{_inline(html.escape(chr(10).join(para)))}</p>")
    close_lists()
    return "\n".join(out)


def notebook_to_html(path: str, assets_dir: str, slug: str) -> str:
    with open(path) as f:
        nb = json.load(f)
    out: list[str] = []
    img_n = 0
    for cell in nb.get("cells", []):
        src = "".join(cell.get("source", []))
        if cell["cell_type"] == "markdown":
            out.append(md_to_html(src))
        elif cell["cell_type"] == "code":
            out.append(f"<pre><code class='language-python'>{html.escape(src)}</code></pre>")
            for o in cell.get("outputs", []):
                data = o.get("data", {})
                if "image/png" in data:
                    img_n += 1
                    png = data["image/png"]
                    if isinstance(png, list):
                        png = "".join(png)
                    name = f"{slug}_{img_n}.png"
                    with open(os.path.join(assets_dir, name), "wb") as g:
                        g.write(base64.b64decode(png))
                    out.append(f'<div class="nbout"><img src="assets/{name}"></div>')
                    continue
                text = data.get("text/plain") or o.get("text")
                if text:
                    if isinstance(text, list):
                        text = "".join(text)
                    out.append(
                        f'<div class="nbout"><pre>{html.escape(text[:4000])}</pre></div>'
                    )
    return "\n".join(out)


def _nav(current: str) -> str:
    items = ['<h1>gpsat_tpu</h1><div class="sect">Guides</div>']
    for _, slug, title in PAGES:
        cls = ' class="current"' if slug == current else ""
        items.append(f'<a href="{slug}.html"{cls}>{html.escape(title)}</a>')
    items.append('<div class="sect">Notebooks</div>')
    for _, slug, title in NOTEBOOKS:
        cls = ' class="current"' if slug == current else ""
        items.append(f'<a href="{slug}.html"{cls}>{html.escape(title)}</a>')
    return "\n".join(items)


def _page(title: str, slug: str, body: str) -> str:
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)} — gpsat_tpu</title>"
        f"<style>{CSS}</style></head><body><div class='layout'>"
        f"<nav>{_nav(slug)}</nav><main>{body}</main></div></body></html>"
    )


def build(out_dir: str) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    assets = os.path.join(out_dir, "assets")
    os.makedirs(assets, exist_ok=True)
    written = []
    for src, slug, title in PAGES:
        path = os.path.join(REPO, src)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            body = md_to_html(f.read())
        dest = os.path.join(out_dir, f"{slug}.html")
        with open(dest, "w") as f:
            f.write(_page(title, slug, body))
        written.append(dest)
    for src, slug, title in NOTEBOOKS:
        path = os.path.join(REPO, src)
        if not os.path.exists(path):
            continue
        body = notebook_to_html(path, assets, slug)
        dest = os.path.join(out_dir, f"{slug}.html")
        with open(dest, "w") as f:
            f.write(_page(title, slug, f"<h1>{html.escape(title)}</h1>" + body))
        written.append(dest)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "_site"))
    args = ap.parse_args()
    written = build(args.out)
    print(f"wrote {len(written)} pages to {args.out}")
    for w in written:
        print(" ", os.path.relpath(w, REPO))


if __name__ == "__main__":
    main()
