#!/usr/bin/env python
"""Regenerate the pre-equilibrated bench configuration.

Runs bench.py in equilibration mode (velocity-rescaled chunks from the
jittered lattice start) and saves extras/bench_state_rigid.npz (or
_flexible), which bench.py then loads for deterministic measurements.
"""

import os
import subprocess
import sys

env = dict(os.environ)
env.setdefault("NBS_EQUILIBRATE", "1")
env.setdefault("NBS_SAVE_STATE", "1")
env.setdefault("NBS_EQUIL_CHUNKS", "10")
env.setdefault("NBS_REUSE", "5")
bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")
sys.exit(subprocess.run([sys.executable, bench], env=env).returncode)
