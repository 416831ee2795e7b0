"""Docs site builder (tools/build_docs_site.py) — the buildable-docs
analogue of the reference's Sphinx workflow
(ref: .github/workflows/documentation.yml:1-90)."""

import glob
import os
import re
from html.parser import HTMLParser


class _TagBalance(HTMLParser):
    VOID = {"br", "img", "hr", "meta", "link", "input"}

    def __init__(self):
        super().__init__()
        self.stack = []
        self.errors = []

    def handle_starttag(self, tag, attrs):
        if tag not in self.VOID:
            self.stack.append(tag)

    def handle_endtag(self, tag):
        if tag in self.VOID:
            return
        if not self.stack or self.stack[-1] != tag:
            self.errors.append(f"mismatched </{tag}> (open: {self.stack[-3:]})")
        else:
            self.stack.pop()


def test_site_builds_and_pages_are_well_formed(tmp_path):
    from tools.build_docs_site import build

    written = build(str(tmp_path))
    # every guide that exists on disk plus the executed notebooks
    assert len(written) >= 12, written
    names = {os.path.basename(w) for w in written}
    for required in ("index.html", "architecture.html", "api.html",
                     "divergences.html", "nb_inline_example.html"):
        assert required in names, f"{required} missing from {sorted(names)}"

    for page in glob.glob(str(tmp_path / "*.html")):
        src = open(page).read()
        p = _TagBalance()
        p.feed(src)
        assert not p.errors, f"{page}: {p.errors[:3]}"
        assert "<nav>" in src and "<main>" in src


def test_markdown_renderer_core_constructs():
    from tools.build_docs_site import md_to_html

    out = md_to_html(
        "# Title\n\npara with `code`, [link](x.html) and **bold**\n\n"
        "| a | b |\n|---|---|\n| 1 | 2 |\n\n- item1\n- item2\n\n```py\nx = 1 < 2\n```\n"
    )
    assert '<h1 id="title">Title</h1>' in out
    assert "<code>code</code>" in out and '<a href="x.html">link</a>' in out
    assert "<strong>bold</strong>" in out
    assert "<table>" in out and "<td>2</td>" in out
    assert "<li>item1</li>" in out
    assert "x = 1 &lt; 2" in out  # code fences HTML-escape their body
    # markdown inside code fences must NOT be rendered
    fenced = md_to_html("```\n**not bold** [not](a link)\n```\n")
    assert "<strong>" not in fenced and "<a " not in fenced
