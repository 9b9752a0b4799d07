"""Documentation drift gates.

The reference generates its Python API docs with Sphinx so they cannot drift
from the code (/root/reference/docs/conf.py); here the generated layer is
docs/api_generated.md (devtools/gen_api_doc.py) and these tests are the
gate: the committed file must match a fresh generation, and the narrative
docs/api.md must at least mention every top-level public export.
"""

import os
import re
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "devtools"))


@pytest.mark.smoke
def test_generated_api_doc_matches_code():
    import gen_api_doc

    path = os.path.join(ROOT, "docs", "api_generated.md")
    with open(path) as fh:
        committed = fh.read()
    fresh = gen_api_doc.generate()
    assert committed == fresh, (
        "docs/api_generated.md is stale — run `python devtools/gen_api_doc.py`"
    )


@pytest.mark.smoke
def test_narrative_doc_mentions_every_export():
    import nonbondedslicing_tpu as nbs

    with open(os.path.join(ROOT, "docs", "api.md")) as fh:
        doc = fh.read()
    exports = [n for n in dir(nbs) if not n.startswith("_")
               and n not in ("jax", "os", "models", "ops", "serialization",
                             "utils")]
    missing = [n for n in exports
               if not re.search(r"\b%s\b" % re.escape(n), doc)]
    assert not missing, f"docs/api.md does not mention: {missing}"
