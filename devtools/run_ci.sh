#!/usr/bin/env bash
# Local CI runner — the same gates .github/workflows/CI.yml runs, for
# environments without GitHub runners (e.g. this development image).
#
#   devtools/run_ci.sh smoke     # fast subset (<5 min)
#   devtools/run_ci.sh full      # full suite (~25 min)
#   devtools/run_ci.sh package   # wheel build + install + import smoke
#   devtools/run_ci.sh docs      # regenerate API reference + build HTML site
#   devtools/run_ci.sh all
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-smoke}"

# -W error::FutureWarning keeps the class of implicit-dtype-scatter bugs
# dead (round-5 fix: f64->f32 scatter on the sharded k-space energy path).
run_smoke() { JAX_PLATFORMS=cpu python -W error::FutureWarning -m pytest tests/ -q -m smoke; }
run_full()  { JAX_PLATFORMS=cpu python -W error::FutureWarning -m pytest tests/ -q; }

run_package() {
  rm -rf /tmp/nbs_pkg_ci dist build *.egg-info
  python -m pip wheel --no-deps --no-build-isolation -w dist . >/dev/null
  python -m pip install --no-deps --target /tmp/nbs_pkg_ci dist/*.whl >/dev/null
  (cd /tmp && JAX_PLATFORMS=cpu \
   PYTHONPATH="/tmp/nbs_pkg_ci${PYTHONPATH:+:$PYTHONPATH}" python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
import nonbondedslicing_tpu as nbs
assert "/tmp/nbs_pkg_ci/" in nbs.__file__, nbs.__file__
import numpy as np
system = nbs.System()
force = nbs.SlicedNonbondedForce(2)
for i in range(4):
    system.addParticle(1.0); force.addParticle(0.1, 0.3, 0.5)
system.addForce(force)
ctx = nbs.Context(system, nbs.VerletIntegrator(0.001))
ctx.setPositions(np.random.default_rng(0).random((4, 3)) * 3)
print("installed-wheel smoke: E =",
      ctx.getState(getEnergy=True).getPotentialEnergy())
EOF
  )
  python - <<'EOF'
import glob, zipfile
whl = glob.glob("dist/*.whl")[0]
names = zipfile.ZipFile(whl).namelist()
assert any(n.endswith("native/nbs_native.cpp") for n in names), names
print("native source present in wheel:", whl)
EOF
}

run_docs() {
  JAX_PLATFORMS=cpu python devtools/gen_api_doc.py
  git diff --exit-code docs/api_generated.md
  python devtools/build_docs.py
}

case "$mode" in
  smoke)   run_smoke ;;
  full)    run_full ;;
  package) run_package ;;
  docs)    run_docs ;;
  all)     run_smoke; run_docs; run_package; run_full ;;
  *) echo "usage: $0 {smoke|full|package|docs|all}" >&2; exit 2 ;;
esac
