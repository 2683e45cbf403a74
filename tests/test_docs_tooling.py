"""Docs tooling: the stdlib markdown -> HTML converter behind docs/html/."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "gen_html_docs", os.path.join(ROOT, "scripts", "gen_html_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_md_to_html_core_constructs():
    m = _load()
    md = "\n".join(
        [
            "# Title",
            "",
            "Some *emphasis* and **bold** and `code <x>` and a",
            "[link](other.md) in a joined paragraph.",
            "",
            "## Table",
            "",
            "| a | b |",
            "|---|---|",
            "| `1` | 2 |",
            "",
            "- item one",
            "- item two",
            "  continued line",
            "",
            "```python",
            "x = a < b  # <- escaped",
            "```",
            "",
            "> a quote",
            "",
            "---",
        ]
    )
    html = m.md_to_html(md)
    assert '<h1 id="title">Title</h1>' in html
    assert "<em>emphasis</em>" in html and "<strong>bold</strong>" in html
    # inline code is escaped and protected from emphasis/link parsing
    assert "<code>code &lt;x&gt;</code>" in html
    # .md links rewritten to .html
    assert '<a href="other.html">link</a>' in html
    # the two source lines join into one paragraph
    assert "in a joined paragraph" in html
    assert "<table><thead>" in html and "<td><code>1</code></td>" in html
    assert "<li>item one</li>" in html
    assert "<li>item two continued line</li>" in html
    assert "<pre><code>x = a &lt; b  # &lt;- escaped</code></pre>" in html
    assert "<blockquote>" in html
    assert "<hr>" in html


def test_site_build_is_current(tmp_path, monkeypatch, capsys):
    """The site must be rebuildable and every guide/API markdown page must
    get a rendered HTML counterpart (catches forgetting to re-run the
    generator after adding a doc). Builds into tmp_path — running the test
    suite must not rewrite the committed docs/html/ tree."""
    m = _load()
    monkeypatch.setattr(m, "OUT", str(tmp_path))
    m.build()
    out = capsys.readouterr().out
    assert "wrote" in out
    pages = set(os.listdir(tmp_path))
    for f in os.listdir(os.path.join(ROOT, "docs")):
        if f.endswith(".md"):
            assert f[:-3] + ".html" in pages, f
    for f in os.listdir(os.path.join(ROOT, "docs", "api")):
        if f.endswith(".md") and f != "index.md":
            assert f[:-3] + ".html" in pages, f
    assert "api_index.html" in pages and "index.html" in pages
