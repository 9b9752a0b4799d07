#!/usr/bin/env python
"""Build the HTML documentation site from the markdown tree.

The reference ships a Sphinx build with a Doc workflow
(/root/reference/docs/conf.py, .github/workflows/Doc.yml); this is the
equivalent publishing layer here: every docs/*.md plus README.md rendered
to docs/_build/*.html with a shared nav, using the stdlib-adjacent
``markdown`` package (no Sphinx in the image).  Run
``python devtools/gen_api_doc.py`` first so the generated API reference is
fresh (the CI docs job does both).

    python devtools/build_docs.py          # writes docs/_build/
"""

import os
import shutil
import sys

import markdown

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "_build")

PAGES = [
    ("index", os.path.join(ROOT, "README.md"), "Overview"),
    ("api", os.path.join(ROOT, "docs", "api.md"), "API guide"),
    ("api_generated", os.path.join(ROOT, "docs", "api_generated.md"),
     "API reference (generated)"),
    ("theory", os.path.join(ROOT, "docs", "theory.md"), "Theory"),
    ("devnotes", os.path.join(ROOT, "docs", "devnotes.md"), "Dev notes"),
    ("changelog", os.path.join(ROOT, "docs", "CHANGELOG.md"), "Changelog"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>{title} — nonbondedslicing_tpu</title>
<style>
body {{ font-family: system-ui, sans-serif; max-width: 56rem; margin: 2rem auto;
       padding: 0 1rem; line-height: 1.55; color: #1a1a1a; }}
nav {{ border-bottom: 1px solid #ddd; padding-bottom: .6rem;
      margin-bottom: 1.5rem; }}
nav a {{ margin-right: 1.1rem; text-decoration: none; color: #0b5394; }}
nav a.current {{ font-weight: 700; color: #000; }}
pre {{ background: #f6f8fa; padding: .8rem; overflow-x: auto;
      border-radius: 6px; }}
code {{ background: #f6f8fa; padding: .1rem .25rem; border-radius: 4px; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: .3rem .5rem; }}
</style></head><body>
<nav>{nav}</nav>
{body}
</body></html>
"""


def build():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    md = markdown.Markdown(extensions=["tables", "fenced_code"])
    written = []
    for slug, path, title in PAGES:
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            text = fh.read()
        nav = " ".join(
            f'<a href="{s}.html"{" class=current" if s == slug else ""}>'
            f"{t}</a>" for s, p, t in PAGES if os.path.exists(p))
        # intra-docs .md links -> .html
        for s, p, t in PAGES:
            base = os.path.basename(p)
            text = text.replace(f"]({base})", f"]({s}.html)")
            text = text.replace(f"](docs/{base})", f"]({s}.html)")
        html = TEMPLATE.format(title=title, nav=nav,
                               body=md.reset().convert(text))
        out_path = os.path.join(OUT, f"{slug}.html")
        with open(out_path, "w") as fh:
            fh.write(html)
        written.append(out_path)
    return written


if __name__ == "__main__":
    for p in build():
        print("wrote", os.path.relpath(p, ROOT))
    sys.exit(0)
